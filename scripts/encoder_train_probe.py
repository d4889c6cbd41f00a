#!/usr/bin/env python
"""Exact-vs-fast encoder trained-convergence probe (CPU, ~5 min).

Trains each encoder (exact deformable `attention` vs windowed
`fast_attention`) plus a linear head on a dense synthetic task whose
labels require SPATIAL MIXING — each token's class is the channel-argmax
of a fixed random projection of its 3x3-mean-pooled input, so a pointwise
model cannot solve it — and compares loss/accuracy trajectories.

Together with tests/test_transplant.py (function equivalence of the two
encoders wherever offsets stay in-window) this gives the fast encoder a
trained-behaviour datapoint: both encoders should reach the same accuracy
at the same rate.  A full DETR mAP comparison on this host is impractical
(~15 s/step on 1 CPU core — see PERF.md).

Usage: JAX_PLATFORMS= python scripts/encoder_train_probe.py [steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import flax.linen as nn

D_MODEL = 128
N_HEADS = 8
N_POINTS = 4
N_CLASSES = 7
LEVELS = [(2, 16, 16), (2, 8, 8)]
BATCH = 2


def make_data(rng, n_batches):
    """Inputs: per-level random maps.  Labels: argmax over N_CLASSES of a
    fixed projection of the 3x3 spatial mean of the level-0-aligned input."""
    proj = rng.normal(size=(D_MODEL, N_CLASSES)).astype(np.float32)
    data = []
    for _ in range(n_batches):
        srcs = [rng.normal(size=(BATCH, t, h, w, D_MODEL)).astype(np.float32)
                for t, h, w in LEVELS]
        labels = []
        for x in srcs:
            xp = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)],
                        mode="edge")
            pooled = sum(
                xp[:, :, dy : dy + x.shape[2], dx : dx + x.shape[3]]
                for dy in range(3) for dx in range(3)
            ) / 9.0
            labels.append((pooled @ proj).argmax(-1))
        data.append((srcs, labels))
    return data


class Probe(nn.Module):
    encoder_type: str

    @nn.compact
    def __call__(self, srcs):
        poses = [jnp.zeros_like(s) for s in srcs]
        if self.encoder_type == "fast_attention":
            from class_query_vad_tpu.models.fast_encoder import (
                FastDeformableEncoder,
            )

            enc = FastDeformableEncoder(
                num_layers=2, d_model=D_MODEL, d_ffn=256,
                n_levels=len(LEVELS), n_heads=N_HEADS, n_points=N_POINTS,
                radius=1, window="2d", dropout=0.0, use_pallas=False,
                name="encoder",
            )
            outs = enc(srcs, poses, None)
        else:
            from class_query_vad_tpu.models.deform_encoder import (
                DeformableEncoder,
            )

            b = srcs[0].shape[0]
            shapes = tuple(tuple(s.shape[1:4]) for s in srcs)
            flat = jnp.concatenate(
                [s.reshape(b, -1, D_MODEL) for s in srcs], axis=1)
            pos_flat = jnp.zeros_like(flat)
            vr = jnp.ones((b, len(LEVELS), 3), jnp.float32)
            enc = DeformableEncoder(
                num_layers=2, d_model=D_MODEL, d_ffn=256,
                n_levels=len(LEVELS), n_heads=N_HEADS, n_points=N_POINTS,
                dropout=0.0, name="encoder",
            )
            out_flat = enc(flat, shapes, vr, pos_flat, None, True)
            outs, start = [], 0
            for t, h, w in shapes:
                n = t * h * w
                outs.append(out_flat[:, start : start + n].reshape(
                    b, t, h, w, D_MODEL))
                start += n
        head = nn.Dense(N_CLASSES, name="head")
        return [head(o) for o in outs]


def run(encoder_type, data, steps):
    model = Probe(encoder_type)
    params = model.init(jax.random.PRNGKey(0), data[0][0])
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    def loss_fn(p, srcs, labels):
        logits = model.apply(p, srcs)
        losses, accs = [], []
        for lg, lb in zip(logits, labels):
            lg = lg.reshape(-1, N_CLASSES)
            lb = lb.reshape(-1)
            losses.append(optax.softmax_cross_entropy_with_integer_labels(
                lg, lb).mean())
            accs.append((lg.argmax(-1) == lb).mean())
        return sum(losses) / len(losses), sum(accs) / len(accs)

    @jax.jit
    def step(p, o, srcs, labels):
        (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(p, srcs, labels)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l, a

    curve = []
    for i in range(steps):
        srcs, labels = data[i % len(data)]
        srcs = [jnp.asarray(s) for s in srcs]
        labels = [jnp.asarray(l) for l in labels]
        params, opt, l, a = step(params, opt, srcs, labels)
        if (i + 1) % max(steps // 10, 1) == 0:
            curve.append({"step": i + 1, "loss": round(float(l), 4),
                          "acc": round(float(a), 4)})
            print(f"[{encoder_type}] step {i + 1}/{steps} "
                  f"loss {float(l):.4f} acc {float(a):.4f}", flush=True)
    return curve


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rng = np.random.default_rng(0)
    data = make_data(rng, 8)
    results = {enc: run(enc, data, steps)
               for enc in ("attention", "fast_attention")}
    print(json.dumps({k: v[-1] for k, v in results.items()}))


if __name__ == "__main__":
    main()
