#!/usr/bin/env python
"""Fast-vs-exact encoder accuracy comparison on a learnable synthetic task.

Trains the SAME tiny DETR twice — once with the exact-parity deformable
encoder (ENCODER_TYPE=attention) and once with the TPU fast encoder
(ENCODER_TYPE=fast_attention, 2d window) — on a synthetic JHMDB-format
world where the action class is visually decodable (a moving rectangle
whose color encodes its class), then compares f-mAP / v-mAP.

Together with tests/test_transplant.py (which proves the fast blend equals
the exact sampler wherever offsets stay in-window), this gives the
architectural variant an end-to-end trained-accuracy datapoint: both
encoders should solve the task to the same mAP.

Runs on CPU (~15-25 min on this 1-core host):
    JAX_PLATFORMS= python scripts/fast_vs_exact_synthetic.py [epochs]
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    # default: CPU (deterministic, no tunnel dependency); pass --tpu to run
    # on the attached chip — the exact encoder's gathers make the 2x400
    # tiny-config epochs ~13 h on this 1-core host but minutes on-chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from PIL import Image

from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

N_VIDEOS = 8
N_CLASSES = 3
N_FRAMES = 12
RES = (60, 80)
CLASS_COLORS = [(255, 60, 60), (60, 255, 60), (60, 60, 255)]


def make_world(root):
    rng = np.random.default_rng(7)
    vids, nframes, gttubes = [], {}, {}
    for i in range(N_VIDEOS):
        v = f"act/v_{i:04d}"
        vids.append(v)
        nframes[v] = N_FRAMES
        label = i % N_CLASSES
        x, y = rng.uniform(5, 35), rng.uniform(5, 25)
        dx, dy = rng.uniform(-1.5, 1.5, 2)
        rows = []
        d = os.path.join(root, v)
        os.makedirs(d, exist_ok=True)
        for f in range(1, N_FRAMES + 1):
            xf = float(np.clip(x + dx * f, 2, RES[1] - 28))
            yf = float(np.clip(y + dy * f, 2, RES[0] - 22))
            rows.append([f, xf, yf, xf + 24, yf + 18])
            img = rng.integers(0, 60, (RES[0], RES[1], 3), dtype=np.uint8)
            img[int(yf) : int(yf) + 18, int(xf) : int(xf) + 24] = CLASS_COLORS[
                label
            ]
            Image.fromarray(img).save(os.path.join(d, f"{f:05d}.png"))
        gttubes[v] = {label: [np.array(rows)]}
    with open(os.path.join(root, "JHMDB-GT.pkl"), "wb") as f:
        pickle.dump(
            {
                "labels": [str(i) for i in range(N_CLASSES)],
                "train_videos": [vids] * 3,
                "test_videos": [vids] * 3,
                "nframes": nframes,
                "resolution": {v: RES for v in vids},
                "gttubes": gttubes,
            },
            f,
        )


def make_cfg(root, encoder_type):
    from class_query_vad_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    c = cfg.CONFIG
    c.DATA.DATASET_NAME = "jhmdb"
    c.DATA.ANNO_PATH = root
    c.DATA.DATA_PATH = root
    c.DATA.NUM_CLASSES = N_CLASSES
    c.DATA.TEMP_LEN = N_FRAMES
    c.DATA.IMG_SIZE = 64
    c.DATA.MAX_BOXES = 4
    c.MODEL.SINGLE_FRAME = False
    c.MODEL.TEMP_LEN = N_FRAMES
    c.MODEL.QUERY_NUM = 5
    c.MODEL.ENC_LAYERS = 1
    c.MODEL.DEC_LAYERS = 1
    c.MODEL.DIM_FEEDFORWARD = 256
    c.MODEL.BACKBONE_NAME = "ViT"
    c.MODEL.ENCODER_TYPE = encoder_type
    c.MODEL.FAST_RADIUS = 1
    c.MODEL.FAST_WINDOW = "2d"
    c.ViT.DEPTH = 1
    c.ViT.USE_CHECKPOINT = False
    c.GRADIENT_CHECKPOINTING = False
    c.TRAIN.BATCH_SIZE = 2
    c.TRAIN.GRAD_ACCUM = 1
    c.TRAIN.LR = 1e-3
    c.LOG.BASE_PATH = root
    c.LOG.EXP_NAME = f"cmp_{encoder_type}"
    c.LOG.RES_DIR = os.path.join(root, f"res_{encoder_type}")
    c.EVAL_ONLY = False
    return cfg


def run(root, encoder_type, epochs, lr=None, seed=0, lr_policy=None,
        fast_radius=1):
    from class_query_vad_tpu.datasets import build_dataloader
    from class_query_vad_tpu.engine import (
        create_train_state,
        make_train_step,
        run_validation,
    )
    from class_query_vad_tpu.losses import (
        build_criterion_and_postprocessor,
        build_matcher,
    )
    from class_query_vad_tpu.models import build_model

    cfg = make_cfg(root, encoder_type)
    if lr is not None:
        cfg.CONFIG.TRAIN.LR = lr
    if lr_policy is not None:
        cfg.CONFIG.TRAIN.LR_POLICY = lr_policy
        cfg.CONFIG.TRAIN.NUM_EPOCHS = epochs
    cfg.CONFIG.MODEL.FAST_RADIUS = fast_radius
    model = build_model(cfg)
    matcher = build_matcher(cfg)
    criterion, postprocess, weight_dict = build_criterion_and_postprocessor(
        cfg, matcher
    )
    train_loader = build_dataloader(cfg, "train", num_workers=2)
    val_loader = build_dataloader(cfg, "val", num_workers=2)

    # decode each training batch ONCE and train from memory: per-step PNG
    # decode dominated wall-clock on this 1-core host (~15 s/step) and the
    # val transforms are deterministic, so cached batches lose only the
    # train-time augmentation jitter — irrelevant for this capacity check
    train_loader.set_epoch(0)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b, _ in train_loader
    ]

    first = batches[0]
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(seed),
                                   first, steps_per_epoch=len(batches))
    step = jax.jit(make_train_step(model, criterion, weight_dict, tx),
                   donate_argnums=(0,))

    t0 = time.time()
    for epoch in range(epochs):
        losses = []
        for batch in batches:
            state, metrics = step(state, batch)
            losses.append(metrics["total_loss"])
        if (epoch + 1) % 25 == 0:
            mean = float(np.mean(jax.device_get(losses)))
            print(f"[{encoder_type}] epoch {epoch + 1}/{epochs} "
                  f"loss {mean:.4f} ({time.time() - t0:.0f}s)", flush=True)
        if (epoch + 1) % 100 == 0 and epoch + 1 < epochs:
            mid = run_validation(cfg, model, jax.device_get(state.params),
                                 postprocess, val_loader)
            print(f"[{encoder_type}] epoch {epoch + 1} "
                  f"mAP {mid['mAP']:.4f}", flush=True)

    params = jax.device_get(state.params)
    result = run_validation(cfg, model, params, postprocess, val_loader)
    return ({"encoder": encoder_type, "mAP": result["mAP"],
             "fast_radius": fast_radius,
             "v_mAP": result.get("v_mAP"), "lr": cfg.CONFIG.TRAIN.LR,
             "seed": seed,
             "lr_policy": cfg.CONFIG.TRAIN.get("LR_POLICY", "constant"),
             "train_s": round(time.time() - t0, 1)}, params)


def _vit_level_shapes(T, H, W):
    """Level (t, h, w) of the ViT 4-scale FPN (models/backbone.FPN_SCALES:
    [4, 2, 1, 0.5] on the patch-16 / tubelet-2 token grid)."""
    t, h, w = T // 2, H // 16, W // 16
    return [
        (t, h * 4, w * 4), (t, h * 2, w * 2), (t, h, w),
        (t, max(h // 2, 1), max(w // 2, 1)),
    ]


def run_transplant_native(root, exact_params):
    """Third arm (round-3 verdict item 2b): serve the TRAINED exact
    encoder through the fast_native architecture (utils/transplant with
    native per-level offset scales) and score it with the same synthetic
    evaluator — the first mAP bound on the out-of-window deviation
    (transplant is function-equivalent only in-window; PERF.md measures
    ~90% of a trained encoder's attention mass OUT of window)."""
    from class_query_vad_tpu.datasets import build_dataloader
    from class_query_vad_tpu.engine import run_validation
    from class_query_vad_tpu.losses import (
        build_criterion_and_postprocessor,
        build_matcher,
    )
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.utils.transplant import transplant_exact_to_fast

    cfg = make_cfg(root, "fast_attention")
    c = cfg.CONFIG
    c.MODEL.FAST_CROSS_LEVEL = "native"
    c.MODEL.FAST_WINDOW = "3d"     # full trilinear window (serving mode)
    # tiny grids sit below the Mosaic kernels' tile minima; the XLA-oracle
    # blend computes the identical function (pinned by the kernel tests)
    c.MODEL.FAST_USE_PALLAS = False
    c.LOG.RES_DIR = os.path.join(root, "res_native_transplant")

    model = build_model(cfg)
    _, postprocess, _ = build_criterion_and_postprocessor(
        cfg, build_matcher(cfg)
    )
    val_loader = build_dataloader(cfg, "val", num_workers=2)
    batch, _ = next(iter(val_loader))
    T, H, W = batch["pixels"].shape[1:4]
    shapes = _vit_level_shapes(T, H, W)
    fast_params = transplant_exact_to_fast(
        exact_params, cfg, spatial_shapes=shapes
    )
    result = run_validation(cfg, model, fast_params, postprocess, val_loader)
    return {"encoder": "fast_native_transplant", "mAP": result["mAP"],
            "v_mAP": result.get("v_mAP"), "train_s": 0.0}


def main():
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=400)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the attached chip (consumed at import)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override CONFIG.TRAIN.LR for the trained arms")
    ap.add_argument("--only", choices=["exact", "fast", "transplant"],
                    default=None, help="run a single arm")
    ap.add_argument("--params-cache", default="",
                    help="pickle path: save the exact arm's trained params "
                         "(and reuse them for a transplant-only run)")
    ap.add_argument("--seed", type=int, default=0,
                    help="train seed (init + dropout); the synthetic world "
                         "stays fixed so seeds measure model-seed variance")
    ap.add_argument("--fast-radius", type=int, default=1,
                    help="window radius for the fast arm (2d: (2R+1)^2 taps)")
    ap.add_argument("--lr-policy", default=None,
                    choices=["constant", "cosine", "linear", "step"],
                    help="override CONFIG.TRAIN.LR_POLICY for the trained "
                         "arms (cosine decays to ~0 over the run)")
    args = ap.parse_args()
    if args.only == "transplant" and not args.params_cache:
        ap.error("--only transplant requires --params-cache "
                 "(a pickle saved by a prior exact run)")

    with tempfile.TemporaryDirectory() as root:
        make_world(root)        # seeded -> identical across invocations
        out = []
        exact_params = None
        if args.only in (None, "exact"):
            r_exact, exact_params = run(root, "attention", args.epochs,
                                        lr=args.lr, seed=args.seed,
                                        lr_policy=args.lr_policy)
            out.append(r_exact)
            print(json.dumps(r_exact), flush=True)
            if args.params_cache:
                with open(args.params_cache, "wb") as f:
                    pickle.dump(jax.device_get(exact_params), f)
        if args.only in (None, "fast"):
            r_fast, _ = run(root, "fast_attention", args.epochs, lr=args.lr,
                            seed=args.seed, lr_policy=args.lr_policy,
                            fast_radius=args.fast_radius)
            out.append(r_fast)
            print(json.dumps(r_fast), flush=True)
        if args.only in (None, "transplant"):
            if exact_params is None:
                with open(args.params_cache, "rb") as f:
                    exact_params = pickle.load(f)
            out.append(run_transplant_native(root, exact_params))
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
