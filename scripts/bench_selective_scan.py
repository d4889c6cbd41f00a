#!/usr/bin/env python
"""Selective-scan speed harness — TPU counterpart of the reference's
/root/reference/selective_scan/test_selective_scan_speed.py:408 (test_speed).

Times forward and forward+backward wall-clock of the three implementations
(associative-scan XLA, chunked Pallas kernel, sequential lax.scan oracle)
over the dtype x seqlen grid the reference sweeps, at the two production
shape families (VSS encoder: KD=1024/N=4; Mamba backbone: KD=128/N=16).

Timing follows PERF.md "Measurement pitfalls": inputs are passed as jit
arguments (never closed over), every measurement dispatches `iters` steps
asynchronously and materializes only the last output (the axon tunnel's
block_until_ready can return early).

Usage: python scripts/bench_selective_scan.py [quick]
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from class_query_vad_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_sequential,
)
from class_query_vad_tpu.ops.selective_scan_pallas import selective_scan_pallas
from class_query_vad_tpu.utils.compile_cache import enable_compile_cache


def make_inputs(rng, bsz, kd, n, L, dtype):
    u = jnp.asarray(rng.normal(size=(bsz, kd, L)), dtype)
    delta = jnp.asarray(0.5 * rng.uniform(size=(bsz, kd, L)), dtype)
    A = jnp.asarray(-0.5 - rng.uniform(size=(kd, n)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(bsz, 1, n, L)), dtype)
    C = jnp.asarray(rng.normal(size=(bsz, 1, n, L)), dtype)
    D = jnp.asarray(rng.normal(size=(kd,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(kd,)), jnp.float32)
    return u, delta, A, B, C, D, bias


def timed(fn, args, iters=20):
    out = fn(*args)
    np.asarray(out)                      # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compile_cache()
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    rng = np.random.default_rng(0)

    shapes = [
        ("vss", 4, 1024, 4),            # (tag, B, KD, N): VSS/SS2D encoder
        ("mamba", 1, 128, 16),          # VideoMamba backbone blocks
    ]
    seqlens = (320, 1024) if quick else (64, 256, 1024, 4096)
    dtypes = (jnp.bfloat16,) if quick else (jnp.float32, jnp.bfloat16)

    impls = {
        "assoc": selective_scan,
        "pallas": selective_scan_pallas,
        "seq": selective_scan_sequential,
    }

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    header = f"{'shape':<26s}" + "".join(f"{k + ' fwd':>14s}{k + ' f+b':>14s}"
                                         for k in impls)
    print(header, flush=True)

    for tag, bsz, kd, n in shapes:
        for L in seqlens:
            for dtype in dtypes:
                args = make_inputs(rng, bsz, kd, n, L, dtype)
                label = f"{tag} L={L} {jnp.dtype(dtype).name}"
                row = f"{label:<26s}"
                for name, impl in impls.items():
                    if name == "seq" and L > 1024:
                        row += f"{'-':>14s}{'-':>14s}"
                        continue

                    def fwd(u, delta, A, B, C, D, bias, _impl=impl):
                        return _impl(u, delta, A, B, C, D, bias,
                                     delta_softplus=True).astype(
                                         jnp.float32).sum()

                    def fb(u, delta, A, B, C, D, bias, _f=fwd):
                        g = jax.grad(
                            lambda uu, dd: _f(uu, dd, A, B, C, D, bias),
                            argnums=(0, 1),
                        )(u, delta)
                        return g[0].astype(jnp.float32).sum()

                    try:
                        t_f = timed(jax.jit(fwd), args)
                        t_b = timed(jax.jit(fb), args)
                        row += f"{t_f:>12.2f}ms{t_b:>12.2f}ms"
                    except Exception as e:  # pragma: no cover
                        row += f"{'ERR':>14s}{'ERR':>14s}"
                        print(f"  {label} {name}: {type(e).__name__}: {e}",
                              flush=True)
                print(row, flush=True)


if __name__ == "__main__":
    main()
