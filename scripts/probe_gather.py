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
        # 1. plain row gather [G] from [S, D]
        f = jax.jit(lambda v, i: jnp.take(v, i, axis=0).sum())
        dt = timeit(f, vals32, idx)
        print(f"take rows fp32:      {dt*1e3:8.2f} ms  "
              f"{G/dt/1e6:8.1f} Mrows/s")
        dt = timeit(f, valsbf, idx)
        print(f"take rows bf16:      {dt*1e3:8.2f} ms  "
              f"{G/dt/1e6:8.1f} Mrows/s")

        # 2. take_along_axis formulation
        f2 = jax.jit(
            lambda v, i: jnp.take_along_axis(v, i[:, None], axis=0).sum()
        )
        dt = timeit(f2, vals32, idx)
        print(f"take_along fp32:     {dt*1e3:8.2f} ms  "
              f"{G/dt/1e6:8.1f} Mrows/s")

        # 3. one-hot matmul on a small tile (sanity of MXU alternative):
        #    G rows from S=512-slab
        slab = vals32[:512]
        idx_small = jnp.asarray(rng.integers(0, 512, size=(4096,)), jnp.int32)
        f3 = jax.jit(
            lambda v, i: (
                (jax.nn.one_hot(i, 512, dtype=v.dtype) @ v).sum()
            )
        )
        dt = timeit(f3, slab, idx_small)
        print(f"onehot 4096x512 tile: {dt*1e3:8.2f} ms")

    if which in ("all", "pallas"):
        # 4. pallas dynamic_gather: per grid step, take 1024 rows from a
        #    VMEM-resident [S, D] table
        BG = 8192

        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

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
