#!/usr/bin/env python
"""Probe TPU gather throughput options for the exact deformable encoder.

1. XLA row-gather / blocked (2,2,2,D) slice gather rates at encoder shapes.
2. Pallas + jnp.take (tpu.dynamic_gather) — crashed the v5e AOT compiler on
   jax 0.9.0/libtpu 0.0.34 in round 1; re-test before designing around it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    S, D = 40960, 32           # level-0: 8*64*80 rows, per-head depth
    G = 435_200                # Q*P for level 0 (54400*8)
    vals32 = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    valsbf = vals32.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, S, size=(G,)), jnp.int32)

    if which in ("all", "xla"):
        # row-gather rate vs row width and dtype
        for d in (32, 128, 256):
            for dt_name, dt_ in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
                v = jnp.asarray(rng.normal(size=(S, d)), dt_)
                f = jax.jit(lambda v, i: jnp.take(v, i, axis=0).sum())
                t = timeit(f, v, idx)
                gb = G * d * v.dtype.itemsize / t / 1e9
                print(f"take rows D={d:3d} {dt_name}: {t*1e3:8.2f} ms  "
                      f"{G/t/1e6:8.1f} Mrows/s  {gb:6.1f} GB/s")

        # blocked (2,2,2,D) slice gather, the shipped exact formulation
        vol = jnp.asarray(rng.normal(size=(10, 66, 82, 32)), jnp.float32)
        idx3 = jnp.stack([
            jnp.asarray(rng.integers(0, 8, G), jnp.int32),
            jnp.asarray(rng.integers(0, 64, G), jnp.int32),
            jnp.asarray(rng.integers(0, 80, G), jnp.int32),
        ], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        fb = jax.jit(lambda v, i: jax.lax.gather(
            v, i, dnums, slice_sizes=(2, 2, 2, 32),
            mode=jax.lax.GatherScatterMode.CLIP).sum())
        t = timeit(fb, vol, idx3)
        print(f"blocked (2,2,2,32):  {t*1e3:8.2f} ms  "
              f"{G/t/1e6:8.1f} Mslices/s")

    if which in ("all", "pallas"):
        # 4. pallas dynamic_gather: per grid step, take 1024 rows from a
        #    VMEM-resident [S, D] table
        BG = 8192

        def kernel(tab_ref, idx_ref, out_ref):
            # per-element gather: out[i, j] = tab[idx[i], j]
            idx2d = jnp.broadcast_to(idx_ref[:][:, None], (BG, D))
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2d, axis=0)

        @jax.jit
        def pgather(tab, indices):
            return pl.pallas_call(
                kernel,
                grid=(G // BG,),
                in_specs=[
                    pl.BlockSpec((S, D), lambda i: (0, 0)),
                    pl.BlockSpec((BG,), lambda i: (i,)),
                ],
                out_specs=pl.BlockSpec((BG, D), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((G, D), tab.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2 ** 20,
                ),
            )(tab, indices)

        try:
            dt = timeit(pgather, valsbf, idx)
            ref = np.asarray(jnp.take(valsbf, idx, axis=0))
            got = np.asarray(pgather(valsbf, idx))
            ok = np.array_equal(ref, got)
            print(f"pallas take bf16:    {dt*1e3:8.2f} ms  "
                  f"{G/dt/1e6:8.1f} Mrows/s  exact={ok}")
        except Exception as e:
            print(f"pallas take FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
