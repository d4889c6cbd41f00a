#!/usr/bin/env python
"""Train-step throughput ladder for the flagship AVA ViT-B fast model.

Times the FULL jitted training step (forward + criterion incl. on-device
Hungarian matching + backward + AdamW update) at serving-relevant
operating points, one combo per invocation so cold compiles stay bounded
and the persistent compile cache (.jax_cache) is reused across runs.

Counterpart of the reference's torch training loop
(/root/reference/train.py:126-182); the step being timed is
engine.train.make_train_step — exactly what train.py runs.

Timing follows PERF.md "Measurement pitfalls": pipelined dispatch
(the chip executes donated-state steps in-order), materialize only the
last step's scalar loss, median of 3 windows after a steady-state
warm-up window.

Usage:
    python scripts/bench_train_step.py [--batch 1] [--dtype bf16|fp32]
        [--remat config|on|off] [--config AVA22_ViT-B_fast.yaml]
        [--iters 10]
Prints one JSON line:
    {"config":..., "batch":..., "dtype":..., "remat":...,
     "ms_per_step":..., "clips_per_s":..., "windows_ms": [...]}
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--remat", choices=["config", "on", "off"],
                    default="config")
    ap.add_argument("--config", default="AVA22_ViT-B_fast.yaml")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--device-preprocess", action="store_true",
                    help="run the TRAIN augmentation graph (flip/crop/HSV/"
                         "PCA/normalize, datasets/device_preprocess."
                         "make_train_preprocess) INSIDE the jitted train "
                         "step on decoded native uint8 frames, with host-"
                         "drawn per-clip params — the device-resident train "
                         "pixel path (round-4 verdict item 7)")
    ap.add_argument("--native-hw", default="300x376",
                    help="decoded frame dims for --device-preprocess; the "
                         "default crops to exactly the flagship 256x320 "
                         "(w = int(256*376/300) = 320) with a nontrivial "
                         "random crop position — the fast encoder's dyadic "
                         "level alignment needs pow-2-friendly model dims")
    args = ap.parse_args()

    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.engine import create_train_state, make_train_step
    from class_query_vad_tpu.losses import (
        build_criterion_and_postprocessor,
        build_matcher,
    )
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg_custom(os.path.join(root, "configuration", args.config))
    if args.remat != "config":
        on = args.remat == "on"
        cfg.CONFIG.GRADIENT_CHECKPOINTING = on   # encoder/decoder/CSN remat
        cfg.CONFIG.ViT.USE_CHECKPOINT = on       # ViT per-block remat
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    model = build_model(cfg, dtype=dtype)
    matcher = build_matcher(cfg)
    criterion, _, weight_dict = build_criterion_and_postprocessor(cfg, matcher)

    B = args.batch
    T = cfg.CONFIG.DATA.TEMP_LEN
    H, W = 256, 320
    M = int(cfg.CONFIG.DATA.get("MAX_BOXES", 16))
    nc = cfg.CONFIG.DATA.NUM_CLASSES
    rng = np.random.default_rng(0)

    pre_b = None
    if args.device_preprocess:
        from class_query_vad_tpu.datasets.device_preprocess import (
            draw_train_params,
            make_train_preprocess,
        )

        native_hw = tuple(int(x) for x in args.native_hw.split("x"))
        img_size = int(cfg.CONFIG.DATA.IMG_SIZE)
        pre, (H, W) = make_train_preprocess(img_size, native_hw)
        pre_b = jax.vmap(pre)
        frames_u8 = rng.integers(
            0, 256, size=(B, T) + native_hw + (3,), dtype=np.uint8
        )
        par = [
            draw_train_params(
                np.random.default_rng(1000 + b), img_size, native_hw,
                sat_shift=0.4, val_shift=0.4, alphastd=0.1,
                eigval=[0.2175, 0.0188, 0.0045],
                eigvec=[[-0.5675, 0.7192, 0.4009],
                        [-0.5808, -0.0045, -0.8140],
                        [-0.5836, -0.6948, 0.4203]],
            )
            for b in range(B)
        ]
        aug = {k: jnp.asarray(np.stack([p[k] for p in par])) for k in par[0]}

    batch = {
        "pixels": jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32),
        "mask": jnp.zeros((B, H, W), bool),
        "boxes": jnp.asarray(
            np.clip(rng.uniform(0.2, 0.7, (B, M, 4)), 0.05, 0.95), jnp.float32
        ),
        "labels": jnp.asarray(
            (rng.uniform(size=(B, M, nc)) < 0.05).astype(np.float32)
        ),
        "n_boxes": jnp.full((B,), min(3, M), jnp.int32),
    }
    if args.device_preprocess:
        batch["frames_u8"] = jnp.asarray(frames_u8)
        batch["aug"] = aug

    # steps_per_epoch: representative value so a non-constant
    # CONFIG.TRAIN.LR_POLICY builds the same schedule shape training would
    # (0 would silently fall back to constant LR — different optimizer).
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                                   steps_per_epoch=1000)
    base_step = make_train_step(model, criterion, weight_dict, tx)
    if pre_b is not None:
        # augmentation runs INSIDE the same jit as fwd+bwd+update: XLA
        # overlaps the uint8 pixel graph with the step's early compute
        def _step(state, batch):
            px = pre_b(batch["frames_u8"], batch["aug"])
            inner = {k: v for k, v in batch.items()
                     if k not in ("frames_u8", "aug", "pixels")}
            inner["pixels"] = px
            return base_step(state, inner)
        step = jax.jit(_step, donate_argnums=(0,))
    else:
        step = jax.jit(base_step, donate_argnums=(0,))

    t0 = time.time()
    state, metrics = step(state, batch)
    np.asarray(metrics["total_loss"])  # compile + first step
    compile_s = time.time() - t0

    def window():
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(args.iters):
            state, m = step(state, batch)
        np.asarray(m["total_loss"])
        return (time.perf_counter() - t0) / args.iters

    window()  # steady-state warm-up
    windows = sorted(window() for _ in range(args.windows))
    ms = 1000.0 * windows[len(windows) // 2]
    print(json.dumps({
        "config": args.config, "batch": B, "dtype": args.dtype,
        "remat": args.remat,
        "device_preprocess": bool(args.device_preprocess),
        "lr_policy": cfg.CONFIG.TRAIN.get("LR_POLICY", "constant"),
        "first_step_s": round(compile_s, 1),
        "ms_per_step": round(ms, 1),
        "clips_per_s": round(1000.0 * B / ms, 2),
        "windows_ms": [round(1000 * w, 1) for w in windows],
    }))


if __name__ == "__main__":
    main()
