#!/usr/bin/env python
"""Eval-forward throughput for ANY configuration YAML on the attached TPU.

Unlike bench.py (flagship-only) this builds the config's full model —
CSN / ViT / VideoMamba backbone, any encoder — and times the all-heads
forward with the pipelined-dispatch method (PERF.md "Measurement
pitfalls").  Used for the per-backbone-family datapoints (round-4 verdict
item 3: CSN-50 and VSS have never been timed on the chip).

Usage:
    python scripts/bench_config_forward.py --config AVA22_CSN50.yaml
        [--batch 1] [--iters 20] [--hw 256x320]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--hw", default="256x320")
    args = ap.parse_args()

    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg_custom(os.path.join(root, "configuration", args.config))
    model = build_model(cfg, dtype=jnp.bfloat16)

    B = args.batch
    T = cfg.CONFIG.DATA.TEMP_LEN
    H, W = (int(x) for x in args.hw.split("x"))
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32)
    mask = jnp.zeros((B, H, W), bool)

    t0 = time.perf_counter()
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), pixels, mask, True
    )
    jax.block_until_ready(params)
    print(f"init {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def _step(p, px, mk):
        out = model.apply(p, px, mk, True)
        return (out["pred_boxes"].sum()
                + out["pred_logits"].astype(jnp.float32).sum()
                + out["pred_logits_b"].astype(jnp.float32).sum())

    fwd = jax.jit(_step)
    t0 = time.perf_counter()
    np.asarray(fwd(params, pixels, mask))
    compile_s = time.perf_counter() - t0
    print(f"first call (compile/cache-load) {compile_s:.1f}s", file=sys.stderr)

    def window():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, pixels, mask)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.iters

    window()
    dts = sorted(window() for _ in range(args.windows))
    dt = dts[len(dts) // 2]
    print(json.dumps({
        "config": args.config, "batch": B, "temp_len": T, "hw": args.hw,
        "first_call_s": round(compile_s, 1),
        "ms_per_batch": round(1000 * dt, 1),
        "ms_per_clip": round(1000 * dt / B, 1),
        "clips_per_s": round(B / dt, 2),
        "windows_ms": [round(1000 * d, 1) for d in dts],
    }))


if __name__ == "__main__":
    main()
