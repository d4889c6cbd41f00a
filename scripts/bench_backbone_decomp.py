#!/usr/bin/env python
"""Decompose the flagship backbone stage (ViT body vs FPN vs masks/poses).

Round-5 target: the backbone+FPN is ~13.7 ms/clip = 60% of serving time at
~15-20% MFU (VERDICT r4 item 1).  This script times, with the pipelined-
dispatch method (PERF.md "Measurement pitfalls"):

  vit    — ViT body alone (tokens out, scalar-summed)
  bb     — full backbone (ViT + 4-level FPN + masks/poses)
  fpn    — bb - vit (difference)
  full   — whole model

Usage: python scripts/bench_backbone_decomp.py [--batch 2] [--iters 30]
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
    window()
    return sorted(window() for _ in range(windows))[windows // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--config", default="AVA22_ViT-B_fast.yaml")
    args = ap.parse_args()

    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.models.vit import build_vit
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

    spec = model.spec
    vit = build_vit(spec.vit, dtype=jnp.bfloat16,
                    remat=(spec.gradient_checkpointing or spec.vit.use_checkpoint))
    vit_params = {"params": params["params"]["backbone"]["body"]}

    def vit_fn(p, px):
        return vit.apply(p, px, True).astype(jnp.float32).sum()

    def bb_fn(p, px, mk):
        srcs, masks, poses = model.apply(
            p, px, mk, True, method=lambda m, a, b, c: m.backbone(a, b, c))
        return sum(s.astype(jnp.float32).sum() for s in srcs) + sum(
            q.astype(jnp.float32).sum() for q in poses)

    def full_fn(p, px, mk):
        out = model.apply(p, px, mk, True)
        return (out["pred_boxes"].sum()
                + out["pred_logits"].astype(jnp.float32).sum()
                + out["pred_logits_b"].astype(jnp.float32).sum())

    t_vit = timed(jax.jit(vit_fn), vit_params, pixels, iters=args.iters)
    t_bb = timed(jax.jit(bb_fn), params, pixels, mask, iters=args.iters)
    t_full = timed(jax.jit(full_fn), params, pixels, mask, iters=args.iters)

    ms = lambda t: 1000.0 * t
    print(f"B={B}  (ms/batch | ms/clip)")
    print(f"vit body  {ms(t_vit):7.2f} | {ms(t_vit)/B:6.2f}")
    print(f"backbone  {ms(t_bb):7.2f} | {ms(t_bb)/B:6.2f}")
    print(f"fpn+pos   {ms(t_bb - t_vit):7.2f} | {ms(t_bb - t_vit)/B:6.2f}")
    print(f"full      {ms(t_full):7.2f} | {ms(t_full)/B:6.2f}")


if __name__ == "__main__":
    main()
