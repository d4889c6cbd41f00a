#!/usr/bin/env python
"""End-to-end eval-loop throughput: loader -> forward -> postprocess ->
txt protocol (the user-visible metric; round-2 verdict item 6).

bench.py times the model forward alone; the reference's eval loop
(/root/reference/utils/video_action_recognition.py:95-245) additionally
pays host-side postprocessing and the per-rank txt protocol every batch.
This harness drives ``engine.evaluate.run_validation`` — the REAL eval
loop, including its 1-step pipelined dispatch — over a synthetic
in-memory AVA loader (flagship shapes, random weights; the mAP stage is
skipped by running as rank 1, exactly like a non-zero rank in
multi-host eval) and reports e2e clips/s next to the model-only number.

Usage: python scripts/bench_e2e_eval.py [--clips 64] [--batch 2]
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


def synthetic_ava_loader(n_batches, batch, t, h, w, nq=15, n_gt=3,
                         raw_hw=None):
    """raw_hw: when set, pixels are NATIVE-resolution uint8 frames of that
    size (the device-preprocess path's input) instead of model-ready
    fp32."""
    rng = np.random.default_rng(0)
    batches = []
    for i in range(n_batches):
        if raw_hw is not None:
            pixels = rng.integers(
                0, 256, size=(batch, t) + tuple(raw_hw) + (3,), dtype=np.uint8
            )
        else:
            pixels = rng.normal(size=(batch, t, h, w, 3)).astype(np.float32)
        mask = np.zeros((batch, h, w), bool)
        meta = []
        for b in range(batch):
            raw = np.zeros((n_gt, 6), np.float32)
            raw[:, 2:6] = rng.uniform(0.1, 0.9, size=(n_gt, 4))
            labels = [
                rng.integers(1, 80, size=(rng.integers(1, 3),)).tolist()
                for _ in range(n_gt)
            ]
            meta.append({
                "image_id": [f"vid{i:04d},{b:04d}"],
                "size": np.asarray([h, w], np.float32),
                "raw_boxes": raw,
                "labels": labels,
            })
        batches.append(({"pixels": pixels, "mask": mask}, meta))
    return batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--config", default="AVA22_ViT-B_fast.yaml")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    ap.add_argument("--device-preprocess", action="store_true",
                    help="ship NATIVE uint8 frames and run the val pixel "
                         "pipeline (Pillow-bit-exact bicubic resize + crop "
                         "+ normalize) on-device inside the forward jit "
                         "(datasets/device_preprocess.py); transfers shrink "
                         "4x vs fp32 and the host loop drops the PIL work")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.engine.evaluate import run_validation
    from class_query_vad_tpu.losses import (
        build_criterion_and_postprocessor,
        build_matcher,
    )
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg_custom(os.path.join(root, "configuration", args.config))
    cfg.defrost()
    cfg.CONFIG.LOG.BASE_PATH = "/tmp/e2e_eval_bench"
    cfg.CONFIG.LOG.RES_DIR = "res"
    cfg.freeze()

    model = build_model(cfg, dtype=jnp.bfloat16)
    _, postprocess, _ = build_criterion_and_postprocessor(
        cfg, build_matcher(cfg))

    B, T, H, W = args.batch, 16, 256, 320
    n_batches = max(1, args.clips // B)

    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0),
        jnp.zeros((B, T, H, W, 3), jnp.float32),
        jnp.zeros((B, H, W), bool),
        True,
    )

    # ONE forward jit shared by the warm-up and the timed run:
    # run_validation's internal default builds a fresh jax.jit per call,
    # and a fresh wrapper re-traces + re-loads the compile cache INSIDE
    # the timed window (measured: ~2 s/batch of phantom cost)
    if args.device_preprocess:
        from class_query_vad_tpu.datasets.device_preprocess import (
            make_eval_preprocess,
        )

        raw_hw = (400, 500)      # native res mapping to 256x320 after the
        pre, out_hw = make_eval_preprocess(   # resize + centre crop
            cfg.CONFIG.DATA.IMG_SIZE, raw_hw, dtype=jnp.bfloat16
        )
        assert out_hw == (H, W), out_hw
        data = synthetic_ava_loader(n_batches, B, T, H, W,
                                    nq=cfg.CONFIG.MODEL.QUERY_NUM,
                                    raw_hw=raw_hw)
        fwd = jax.jit(lambda p, px, mk: model.apply(p, pre(px), mk, True))
        tdt = None               # ship raw uint8 (4x smaller than fp32)
    else:
        data = synthetic_ava_loader(n_batches, B, T, H, W,
                                    nq=cfg.CONFIG.MODEL.QUERY_NUM)
        fwd = jax.jit(lambda p, px, mk: model.apply(p, px, mk, True))
        tdt = jnp.bfloat16

    # warm through one tiny run (compile + steady-state)
    run_validation(cfg, model, params, postprocess, data[:2], rank=1,
                   forward_fn=fwd, transfer_dtype=tdt)

    t0 = time.perf_counter()
    run_validation(cfg, model, params, postprocess, data, rank=1,
                   forward_fn=fwd, transfer_dtype=tdt)
    dt = time.perf_counter() - t0
    clips = n_batches * B
    print(json.dumps({
        "metric": "ava_vitb_e2e_eval_clips_per_sec",
        "value": round(clips / dt, 2),
        "unit": "clips/s",
        "clips": clips,
        "device_preprocess": bool(args.device_preprocess),
        "ms_per_clip": round(1000 * dt / clips, 2),
    }))


if __name__ == "__main__":
    main()
