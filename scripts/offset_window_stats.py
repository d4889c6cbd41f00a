#!/usr/bin/env python
"""How often do a real exact encoder's sampling offsets leave the fast
window?  (round-2 verdict item 4 — bounds the transplant-accuracy claim.)

Two measurements, both CPU-only, no data needed:

1. ``init``: the AVA-shaped exact encoder at REFERENCE INITIALIZATION
   (zero offset kernel + the directional ring bias, point magnitudes
   1..P) — offsets are input-independent, so this is the exact
   per-(head, level, point) distribution every reference training run
   starts from.
2. ``trained``: the exact encoder trained on the synthetic spatial-mixing
   probe task (scripts/encoder_train_probe.py), offsets captured over
   held-out probe batches — a trained-offset distribution without any
   dataset dependency.

Prints per-level: mean/max |spatial offset| in native pixels and the
fraction within ±1 / ±2 (the fast kernel's radius-1 window and a 2x
slack), plus |pt| for the temporal component the 2d window drops.

Usage: python scripts/offset_window_stats.py [--steps 300]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from class_query_vad_tpu.utils.offset_stats import (
    collect_offsets_and_weights,
    native_pixel_offsets,
    softmax_weights,
    window_fractions,
)


def report(tag, raw_list, shapes, nh, np_, weight_list=None):
    pixels = np.concatenate(
        [native_pixel_offsets(r, shapes, nh, np_).reshape(
            -1, nh, len(shapes), np_, 3) for r in raw_list], axis=0)
    weights = None
    if weight_list is not None:
        weights = np.concatenate(
            [softmax_weights(w, nh, len(shapes), np_).reshape(
                -1, nh, len(shapes), np_) for w in weight_list], axis=0)
    rows = window_fractions(pixels, shapes, weights=weights)
    print(f"\n== {tag} ==")
    for r in rows:
        extra = ""
        if "wfrac_within_1" in r:
            extra = (f"  ATTN-WEIGHTED ±1: {100 * r['wfrac_within_1']:.1f}%"
                     f"  ±2: {100 * r['wfrac_within_2']:.1f}%")
        print(f"  level {r['level']} {r['shape']}: "
              f"mean|p| {r['mean_px']:.2f}px  max {r['max_px']:.1f}px  "
              f"within ±1: {100 * r['frac_within_1']:.1f}%  "
              f"±2: {100 * r['frac_within_2']:.1f}%  "
              f"mean|pt| {r['mean_pt']:.2f}{extra}")
    return {r["level"]: r for r in rows}


def ava_init_stats():
    """AVA-shaped exact encoder at reference init: the offset kernel is
    zero-initialized, so offsets == the directional ring bias for EVERY
    query — the init distribution is exactly the bias, no forward pass
    needed."""
    from class_query_vad_tpu.ops.deform_attn import directional_offset_init

    shapes = ((8, 64, 80), (8, 32, 40), (8, 16, 20), (8, 8, 10))
    nh, np_ = 8, 8
    bias = np.asarray(directional_offset_init(nh, len(shapes), np_))
    return report("AVA exact encoder @ reference init", [bias[None]],
                  shapes, nh, np_)


def trained_stats(steps):
    """Probe-trained exact encoder (encoder_train_probe task)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import encoder_train_probe as probe

    rng = np.random.default_rng(0)
    data = probe.make_data(rng, 8)

    # re-run probe.run but keep the params (probe.run returns the curve)
    import optax

    model = probe.Probe("attention")
    params = model.init(jax.random.PRNGKey(0), data[0][0])
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    def loss_fn(p, srcs, labels):
        logits = model.apply(p, srcs)
        losses = [
            optax.softmax_cross_entropy_with_integer_labels(
                lg.reshape(-1, probe.N_CLASSES), jnp.asarray(lb).reshape(-1)
            ).mean()
            for lg, lb in zip(logits, labels)
        ]
        return sum(losses) / len(losses)

    @jax.jit
    def step(p, o, srcs, labels):
        l, g = jax.value_and_grad(loss_fn)(p, srcs, labels)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    for i in range(steps):
        srcs, labels = data[i % len(data)]
        params, opt, l = step(params, opt,
                              [jnp.asarray(s) for s in srcs],
                              [jnp.asarray(x) for x in labels])
        if (i + 1) % max(steps // 5, 1) == 0:
            print(f"[train exact] step {i + 1}/{steps} loss {float(l):.4f}",
                  flush=True)

    shapes = tuple(probe.LEVELS)
    held = probe.make_data(np.random.default_rng(99), 2)
    raws, wts = [], []
    for srcs, _ in held:
        _, pairs = collect_offsets_and_weights(
            model, params, [jnp.asarray(s) for s in srcs])
        for o, w in pairs:
            raws.append(o)
            wts.append(w)
    return report(f"probe-trained exact encoder ({steps} steps)", raws,
                  shapes, probe.N_HEADS, probe.N_POINTS, weight_list=wts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()
    out = {"init": ava_init_stats(), "trained": trained_stats(args.steps)}
    print("\n" + json.dumps(out, default=str))


if __name__ == "__main__":
    main()
