#!/usr/bin/env python
"""Stage decomposition of the flagship AVA ViT-B fast model on the TPU.

Times each pipeline stage as its own jit with a SCALAR output using
pipelined dispatch (see PERF.md "Measurement pitfalls"): dispatch all
iterations asynchronously, materialize only the last scalar.  Reports
the median of 3 windows per stage.

Stages:
  full      — whole model forward (all heads materialized)
  backbone  — ViT body + FPN + masks/poses (DETR.backbone)
  encoder   — fast deformable encoder on fixed level grids
  rest      — full - backbone - encoder (handoff, interp, decoder, heads)

Usage:  python scripts/bench_model_stages.py [--batch 2] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=30, windows=3):
    np.asarray(fn(*args))  # compile + warm
    def window():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / iters
    window()  # steady-state warm-up
    return sorted(window() for _ in range(windows))[windows // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--config", default="AVA22_ViT-B_fast.yaml")
    args = ap.parse_args()

    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg_custom(os.path.join(root, "configuration", args.config))
    model = build_model(cfg, dtype=jnp.bfloat16)

    B, T, H, W = args.batch, 16, 256, 320
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32)
    mask = jnp.zeros((B, H, W), bool)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), pixels, mask, True)

    def full_fn(p, px, mk):
        out = model.apply(p, px, mk, True)
        return (out["pred_boxes"].sum()
                + out["pred_logits"].astype(jnp.float32).sum()
                + out["pred_logits_b"].astype(jnp.float32).sum())

    def backbone_fn(p, px, mk):
        srcs, masks, poses = model.apply(
            p, px, mk, True, method=lambda m, a, b, c: m.backbone(a, b, c))
        return sum(s.astype(jnp.float32).sum() for s in srcs) + sum(
            q.astype(jnp.float32).sum() for q in poses)

    # fixed encoder inputs: run the backbone once, materialize
    srcs, masks_l, poses_l = jax.jit(
        lambda p, px, mk: model.apply(
            p, px, mk, True, method=lambda m, a, b, c: m.backbone(a, b, c)))(
        params, pixels, mask)
    fdt = jnp.dtype(cfg.CONFIG.MODEL.FAST_DTYPE
                    if "FAST_DTYPE" in cfg.CONFIG.MODEL else "bfloat16")
    srcs = [jnp.asarray(np.asarray(s, np.float32), fdt) for s in srcs]
    poses_l = [jnp.asarray(np.asarray(q, np.float32), fdt) for q in poses_l]
    masks_l = [jnp.asarray(np.asarray(m)) for m in masks_l]

    def encoder_fn(p, s, q, mk):
        mem = model.apply(
            p, s, q, mk, True,
            method=lambda m, a, b, c, d: m.transformer.encoder(a, b, c, d))
        return sum(x.astype(jnp.float32).sum() for x in mem)

    t_full = timed(jax.jit(full_fn), params, pixels, mask, iters=args.iters)
    t_bb = timed(jax.jit(backbone_fn), params, pixels, mask, iters=args.iters)
    t_enc = timed(jax.jit(encoder_fn), params, srcs, poses_l, masks_l,
                  iters=args.iters)

    ms = lambda t: 1000.0 * t
    print(f"B={B}  (ms/batch | ms/clip)")
    print(f"full      {ms(t_full):7.2f} | {ms(t_full)/B:6.2f}")
    print(f"backbone  {ms(t_bb):7.2f} | {ms(t_bb)/B:6.2f}")
    print(f"encoder   {ms(t_enc):7.2f} | {ms(t_enc)/B:6.2f}")
    rest = t_full - t_bb - t_enc
    print(f"rest      {ms(rest):7.2f} | {ms(rest)/B:6.2f}")


if __name__ == "__main__":
    main()
