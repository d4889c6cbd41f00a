"""Gather-free windowed deformable attention (TPU "fast encoder" core).

The reference encoder's hot op is unconstrained 3-D multi-scale deformable
attention (/root/reference/ops/modules/ms_deform_attn.py + CUDA kernel),
which on TPU lowers to HBM gathers — measured at ~476 ms/layer at AVA
shapes even with the blocked-gather formulation (see PERF.md).  This module
provides a TPU-native alternative with the same *shape* of expressivity
(per-query, per-head, per-level, per-point learned sampling with trilinear
interpolation) but with offsets smoothly clamped to a small window around
each token's own position:

    delta = radius * tanh(offset_head(q))          # (-R, R)^3, pixels

With the window bounded, trilinear sampling becomes a dense blend of
statically-shifted feature maps: every sample's 8 interpolation corners land
on integer shifts s in [-R, R]^3 of the query's own grid position, so

    out[g] = sum_j sum_s m[g, j, s] * V_j[g + s]

where m accumulates (attention weight x trilinear hat weight) mass per
integer shift.  No gathers: the inner loop is (2R+1)^3 static slices of a
zero-padded map, fused by XLA into VPU multiply-adds.  Cross-level sampling
uses power-of-two aligned resampling (half-pixel bilinear up / 2x2 mean
down) so every level is blended on the query's grid.

This is a deliberate architectural variant, not a parity op: the exact
reference semantics live in ops.deform_attn.  Select it with
``CONFIG.MODEL.ENCODER_TYPE = 'fast_attention'``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _up2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x half-pixel bilinear upsample along ``axis`` (edge-clamped).

    Output centre o maps to input o/2 - 1/4: even outputs blend
    (prev, this) at (1/4, 3/4), odd outputs blend (this, next) at
    (3/4, 1/4) — the classic factor-2 phase weights.
    """
    n = x.shape[axis]
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    prev = jnp.concatenate([first, lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
    nxt = jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis), last], axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    y = jnp.stack([even, odd], axis=axis + 1)
    return y.reshape(x.shape[:axis] + (2 * n,) + x.shape[axis + 1 :])


def _down2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x half-pixel downsample along ``axis``: output centres fall exactly
    between input pairs, so the kernel is a pairwise mean."""
    n = x.shape[axis]
    y = x.reshape(x.shape[:axis] + (n // 2, 2) + x.shape[axis + 1 :])
    return y.mean(axis=axis + 1)


def align_level(feat: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resample [B, T, H, W, ...] to [B, T, h, w, ...] via cascaded
    power-of-two steps (H/W ratios in the FPN are powers of two)."""
    h, w = out_hw
    for axis, target in ((2, h), (3, w)):
        size = feat.shape[axis]
        if not (size % target == 0 or target % size == 0):
            raise ValueError(f"non power-of-two ratio {size}->{target}")
        while feat.shape[axis] < target:
            feat = _up2(feat, axis)
        while feat.shape[axis] > target:
            feat = _down2(feat, axis)
    return feat


def align_all_levels(
    values: Sequence[jnp.ndarray],           # per level [B, T, Hl, Wl, ...]
    grids: Sequence[Tuple[int, int]],        # target (H, W) per query grid
) -> List[List[jnp.ndarray]]:
    """aligned[i][j] = value level j resampled onto query grid i.

    Equivalent to ``[[align_level(v, g) for v in values] for g in grids]``
    but computes each level's power-of-two cascade ONCE: the intermediate
    resolutions of the cascade toward the extreme grids are exactly the
    other grids, so every (level, grid) pair is read off a shared chain
    instead of being recomputed from scratch (the FPN grids form one
    dyadic ladder).  Cuts the encoder's per-layer resample work ~2x.
    """
    # collect every distinct resolution reachable: for each level walk
    # up/down one step at a time, caching each intermediate
    out: List[List[jnp.ndarray]] = [[None] * len(values) for _ in grids]
    for j, v in enumerate(values):
        cache = {v.shape[2:4]: v}

        def get(hw, j=j, cache=cache):
            if hw in cache:
                return cache[hw]
            h, w = hw
            have = sorted(cache.keys())
            # nearest cached resolution below/above (dyadic ladder: one
            # unique predecessor per direction)
            if any(ch < h for ch, _ in have):
                src_hw = max((k for k in cache if k[0] < h),
                             key=lambda k: k[0])
                x = cache[src_hw]
                while x.shape[2] < h:
                    x = _up2(_up2(x, 2), 3)
                    cache[x.shape[2:4]] = x
            else:
                src_hw = min((k for k in cache if k[0] > h),
                             key=lambda k: k[0])
                x = cache[src_hw]
                while x.shape[2] > h:
                    x = _down2(_down2(x, 2), 3)
                    cache[x.shape[2:4]] = x
            return cache[hw]

        for i, hw in enumerate(grids):
            out[i][j] = get(tuple(hw))
    return out


def window_masses(
    offsets: jnp.ndarray,   # [..., P, 3] pixel offsets in (x, y, t), |.| < R
    weights: jnp.ndarray,   # [..., P]    attention weights
    radius: int,
) -> jnp.ndarray:
    """Accumulate per-point trilinear corner weights onto the integer shift
    window.  Returns [..., Wt, Wy, Wx] with W = 2*radius + 1; summing the
    result over the window recovers ``weights.sum(-1)``.
    """
    shifts = jnp.arange(-radius, radius + 1, dtype=offsets.dtype)
    # hat(u) = max(0, 1 - |u|): the 1-D linear-interp kernel
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(offsets[..., 0:1] - shifts))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(offsets[..., 1:2] - shifts))
    wt = jnp.maximum(0.0, 1.0 - jnp.abs(offsets[..., 2:3] - shifts))
    # [..., P, W] each -> [..., Wt, Wy, Wx], summing over points P
    return jnp.einsum("...pt,...py,...px,...p->...tyx", wt, wy, wx, weights)


def windowed_blend(
    aligned: Sequence[jnp.ndarray],  # per level [B, T, H, W, nh, D]
    masses: jnp.ndarray,             # [B, T, H, W, nh, L, Wt, Wy, Wx]
    radius: int,
) -> jnp.ndarray:
    """out[g] = sum_j sum_s masses[g, j, s] * aligned[j][g + s].

    Zero padding outside the map mirrors the reference sampler's
    zero-valued out-of-range corners (ms_deform_attn_core 'zeros' padding).
    """
    b, t, h, w = masses.shape[:4]
    win = 2 * radius + 1
    out = jnp.zeros(aligned[0].shape, masses.dtype)
    pad = [(0, 0), (radius, radius), (radius, radius), (radius, radius),
           (0, 0), (0, 0)]
    for j, vol in enumerate(aligned):
        vp = jnp.pad(vol, pad)
        for st in range(win):
            for sy in range(win):
                for sx in range(win):
                    m = masses[..., j, st, sy, sx]          # [B, T, H, W, nh]
                    out = out + m[..., None] * vp[
                        :, st : st + t, sy : sy + h, sx : sx + w
                    ]
    return out


def windowed_blend_fused(
    aligned: Sequence[jnp.ndarray],  # per level [B, T, H, W, nh, D]
    offsets: jnp.ndarray,            # [B, T, H, W, nh, L, P, 3] (x, y, t)
    weights: jnp.ndarray,            # [B, T, H, W, nh, L, P]
    radius: int,
) -> jnp.ndarray:
    """Production blend: identical math to window_masses + windowed_blend,
    but the per-shift mass is recomputed inside the shift loop from
    lane-friendly [..., nh*P] tensors.

    Materializing the full mass tensor is a TPU layout trap: its trailing
    window dims (2R+1 = 3 or 5) are lane-padded to 128 by the (8, 128)
    tile, inflating e.g. [1,8,64,80,8,4,5,5,5] f32 to ~27 GB of HBM.  The
    recompute is ~3 VPU ops per (point, shift) — noise next to the blend
    FMAs — and keeps every intermediate's minor dim at nh*P.
    """
    b, t, h, w, nh, d = aligned[0].shape
    p = weights.shape[-1]
    win = 2 * radius + 1
    out = jnp.zeros((b, t, h, w, nh, d), aligned[0].dtype)
    pad = [(0, 0), (radius, radius), (radius, radius), (radius, radius),
           (0, 0), (0, 0)]
    for j, vol in enumerate(aligned):
        vp = jnp.pad(vol, pad)
        # per-level slices, flattened to [..., nh*P] (one-time per level)
        dx = offsets[..., j, :, 0].reshape(b, t, h, w, nh * p)
        dy = offsets[..., j, :, 1].reshape(b, t, h, w, nh * p)
        dt = offsets[..., j, :, 2].reshape(b, t, h, w, nh * p)
        a = weights[..., j, :].reshape(b, t, h, w, nh * p)
        for st in range(win):
            ht = jnp.maximum(0.0, 1.0 - jnp.abs(dt - (st - radius)))
            for sy in range(win):
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (sy - radius)))
                aty = a * ht * hy
                for sx in range(win):
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - (sx - radius)))
                    m = (aty * hx).reshape(b, t, h, w, nh, p).sum(-1)
                    out = out + m[..., None] * vp[
                        :, st : st + t, sy : sy + h, sx : sx + w
                    ]
    return out


def windowed_deform_attn(
    value_levels: Sequence[jnp.ndarray],  # per level [B, T, Hl, Wl, nh, D]
    offsets: jnp.ndarray,   # [B, T, H, W, nh, L, P, 3] (x, y, t), |.| < R
    weights: jnp.ndarray,   # [B, T, H, W, nh, L, P]
    radius: int,
) -> jnp.ndarray:
    """Full windowed multi-scale attention for one query grid.

    ``offsets``/``weights`` live on the query grid (H, W); value levels are
    aligned onto it with :func:`align_level` first.  Returns
    [B, T, H, W, nh, D].
    """
    h, w = offsets.shape[2], offsets.shape[3]
    aligned = [align_level(v, (h, w)) for v in value_levels]
    return windowed_blend_fused(aligned, offsets, weights, radius)
