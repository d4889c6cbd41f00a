"""Exact-encoder → fast-encoder weight transplant.

The fast (windowed) encoder is architecturally compatible with the exact
deformable encoder everywhere except the sampling head lane layout and the
offset bounding:

* exact (models/deform_encoder.py): ``sampling_offsets`` Dense with output
  dims ordered ``(head, level, point, xyz)``; unbounded offsets in the
  reference's quirky normalized units
  (/root/reference/models/detr/dab_transformer.py:484-523,
  ops/modules/ms_deform_attn.py:167-204).
* fast (models/fast_encoder.py): flat ``sampling_offsets_kernel`` with lanes
  ordered ``(level, component, head, point)`` and offsets bounded to
  ``radius * tanh(.)`` pixels of the query grid.

This module maps a trained exact encoder's parameters onto the fast tree:
shared modules copy over, the head kernels are lane-permuted, and the offset
head is linearized through the tanh bound (kernel scaled by ``1/radius``,
bias mapped through ``arctanh(clip(b / radius))``) so small trained offsets
are reproduced exactly and large ones saturate at the window edge.  The
transplant is an *initialization* (the window clamp changes semantics for
out-of-window samples); a short fine-tune recovers the gap — measured in
PERF.md ("Fast-encoder accuracy evidence").
"""

from __future__ import annotations

import copy

import numpy as np


def _np(x):
    return np.asarray(x)


def exact_to_fast_encoder(
    encoder_params: dict,
    *,
    n_heads: int,
    n_levels: int,
    n_points: int,
    radius: int = 1,
    window: str = "2d",
    level_scales=None,
) -> dict:
    """Convert a trained exact DeformableEncoder param subtree (the
    ``transformer/encoder`` node) into a FastDeformableEncoder subtree.

    ``level_scales`` (optional [n_levels, nc]) multiplies the offset head
    per (level, component) before the tanh linearization.  For the fast
    encoder's ``cross_level='native'`` mode the exact sampler's quirky
    normalized offsets (o / (T_l, W_l, H_l) against (x, y, t) —
    deform_encoder.py:78-87) convert to native pixels with
    ``scale = (W_l/T_l, H_l/W_l, T_l/H_l)``, making the transplant
    function-equivalent in-window on EVERY level, not only the own-grid
    cube case.  Pass ``native_level_scales(spatial_shapes)``.
    """
    nc = 3 if window == "3d" else 2
    nh, nl, np_ = n_heads, n_levels, n_points
    kp = nh * np_
    out: dict = {}
    for lname, layer in encoder_params.items():
        if not lname.startswith("layers_"):
            out[lname] = copy.deepcopy(layer)
            continue
        sa = layer["self_attn"]
        new_sa: dict = {
            "value_proj": copy.deepcopy(sa["value_proj"]),
            "output_proj": copy.deepcopy(sa["output_proj"]),
        }

        # offsets: exact dim e = ((h*nl + l)*np + p)*3 + c  ->
        #          fast lane f = ((l*nc + c)*nh + h)*np + p   (c < nc)
        k = _np(sa["sampling_offsets"]["kernel"])       # [d, nh*nl*np*3]
        b = _np(sa["sampling_offsets"]["bias"])
        d_model = k.shape[0]
        k = k.reshape(d_model, nh, nl, np_, 3)
        b = b.reshape(nh, nl, np_, 3)
        perm_k = np.transpose(k, (0, 2, 4, 1, 3))       # [d, l, c, h, p]
        perm_b = np.transpose(b, (1, 3, 0, 2))          # [l, c, h, p]
        perm_k = perm_k[:, :, :nc]
        perm_b = perm_b[:, :nc]
        if level_scales is not None:
            s = np.asarray(level_scales, np.float64)[:, :nc]  # [l, c]
            perm_k = perm_k * s[None, :, :, None, None]
            perm_b = perm_b * s[:, :, None, None]
        perm_k = perm_k.reshape(d_model, nl * nc * kp)
        perm_b = perm_b.reshape(nl * nc * kp)
        # linearize through the tanh bound: radius*tanh(k/r . q + atanh(b/r))
        # ~= k . q + b for in-window offsets, saturating at the window edge
        new_sa["sampling_offsets_kernel"] = perm_k / float(radius)
        new_sa["sampling_offsets_bias"] = np.arctanh(
            np.clip(perm_b / float(radius), -0.995, 0.995)
        )

        # weights: exact dim (h*nl + l)*np + p -> fast lane (l*nh + h)*np + p
        wk = _np(sa["attention_weights"]["kernel"]).reshape(
            d_model, nh, nl, np_
        )
        wb = _np(sa["attention_weights"]["bias"]).reshape(nh, nl, np_)
        new_sa["attention_weights_kernel"] = np.transpose(
            wk, (0, 2, 1, 3)
        ).reshape(d_model, nl * kp)
        new_sa["attention_weights_bias"] = np.transpose(
            wb, (1, 0, 2)
        ).reshape(nl * kp)

        out[lname] = {
            "self_attn": new_sa,
            **{
                mod: copy.deepcopy(layer[mod])
                for mod in ("norm1", "linear1", "linear2", "norm2")
            },
        }
    return out


def native_level_scales(spatial_shapes) -> np.ndarray:
    """Offset scales [(W/T, H/W, T/H) per level] converting the exact
    sampler's quirk-normalized offsets to native pixels (see
    exact_to_fast_encoder)."""
    return np.asarray(
        [[w / t, h / w, t / h] for (t, h, w) in spatial_shapes], np.float64
    )


def transplant_exact_to_fast(params: dict, cfg, spatial_shapes=None) -> dict:
    """Full-model transplant: identical subtrees pass through; the encoder
    node is converted with :func:`exact_to_fast_encoder` using the fast
    hyper-parameters from ``cfg``.  With ``FAST_CROSS_LEVEL: native``,
    pass the model's per-level ``spatial_shapes`` so the offset head is
    rescaled to native pixels."""
    m = cfg.CONFIG.MODEL
    params = jax_device_get(params)
    new = copy.deepcopy(params)
    enc = new["params"]["transformer"]["encoder"]
    scales = None
    if str(m.get("FAST_CROSS_LEVEL", "resample")) == "native":
        if spatial_shapes is None:
            raise ValueError(
                "FAST_CROSS_LEVEL=native transplant needs spatial_shapes"
            )
        scales = native_level_scales(spatial_shapes)
    new["params"]["transformer"]["encoder"] = exact_to_fast_encoder(
        enc,
        n_heads=m.NHEAD,
        n_levels=m.NUM_FEATURE_LEVELS,
        n_points=m.NUM_ENC_N_POINTS,
        radius=int(m.get("FAST_RADIUS", 1)),
        window=str(m.get("FAST_WINDOW", "3d")),
        level_scales=scales,
    )
    return new


def jax_device_get(tree):
    import jax

    return jax.device_get(tree)
