#!/usr/bin/env python
"""Microbench + correctness of the ViT flash attention kernel on TPU.

Chained in-jit timing (PERF.md measurement rules): N repetitions threaded
through a data-dependent perturbation so nothing constant-folds; the
single dispatch is materialized to host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from class_query_vad_tpu.ops.vit_attention import (
    attention_from_qkv_ref,
    flash_attention_qkv,
)


def timed(fn, qkv, iters=30):
    out = fn(qkv)
    np.asarray(out)          # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(qkv)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, N, H, D = 1, 2560, 12, 64
    C = H * D
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)

    ref = jax.jit(lambda x: attention_from_qkv_ref(x, H, scale))
    fl = jax.jit(lambda x: flash_attention_qkv(x, H, scale))

    o_ref = np.asarray(ref(qkv), np.float32)
    o_fl = np.asarray(fl(qkv), np.float32)
    rel = np.abs(o_fl - o_ref).max() / (np.abs(o_ref).max() + 1e-9)
    print(f"max rel err vs einsum ref (bf16): {rel:.2e}")

    # chained x12 (one ViT depth) through a perturbation
    def chain(fn):
        def run(x):
            out = None
            for _ in range(12):
                out = fn(x)
                x = x + 1e-12 * out.mean()
            return out.sum()
        return jax.jit(run)

    import class_query_vad_tpu.ops.vit_attention as va

    cands = [("einsum", ref)]
    for bq in (512, 1280, 2560):
        if N % bq == 0:
            def mk(bq_):
                def f(x):
                    old = va._pick_bq
                    va._pick_bq = lambda n: bq_
                    try:
                        return va._flash_fwd_impl(x, H, scale)
                    finally:
                        va._pick_bq = old
                return jax.jit(f)
            cands.append((f"flash{bq}", mk(bq)))
    for name, fn in cands:
        dt = timed(chain(lambda x, f=fn: f(x)), qkv, iters=10)
        print(f"{name:10s} x12 blocks: {dt*1e3:7.2f} ms  "
              f"({dt*1e3/12:5.2f} ms/block)")

    # grad check (training path: custom-vjp recompute)
    g_ref = jax.jit(jax.grad(lambda x: (ref(x.astype(jnp.bfloat16))
                                        .astype(jnp.float32) ** 2).sum()))
    g_fl = jax.jit(jax.grad(lambda x: (fl(x.astype(jnp.bfloat16))
                                       .astype(jnp.float32) ** 2).sum()))
    x32 = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.float32)
    gr, gf = np.asarray(g_ref(x32)), np.asarray(g_fl(x32))
    grel = np.abs(gf - gr).max() / (np.abs(gr).max() + 1e-9)
    print(f"grad max rel err: {grel:.2e}")


if __name__ == "__main__":
    main()
