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

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] matrix composing the dyadic _up2/_down2 cascade.

    Each up/down step is linear in the input, so the whole cascade is one
    matrix; applying it as a single (tiny) matmul per axis replaces the
    stepwise slice-stack-reshape chain, whose intermediates each round-trip
    HBM (measured ~2.5x less resample traffic per encoder layer) and whose
    B>1 lowering scheduled poorly.  Rows sum to 1, so constants are
    preserved exactly like the cascade.
    """
    if not (n_in % n_out == 0 or n_out % n_in == 0):
        raise ValueError(f"non power-of-two ratio {n_in}->{n_out}")
    m = np.eye(n_in, dtype=np.float64)
    size = n_in
    while size < n_out:
        idx = np.arange(size)
        u = np.zeros((2 * size, size))
        u[2 * idx, idx] += 0.75
        u[2 * idx, np.maximum(idx - 1, 0)] += 0.25
        u[2 * idx + 1, idx] += 0.75
        u[2 * idx + 1, np.minimum(idx + 1, size - 1)] += 0.25
        m = u @ m
        size *= 2
    while size > n_out:
        idx = np.arange(size // 2)
        d = np.zeros((size // 2, size))
        d[idx, 2 * idx] = 0.5
        d[idx, 2 * idx + 1] = 0.5
        m = d @ m
        size //= 2
    return m.astype(np.float32)


def _resize_axis(feat: jnp.ndarray, m: np.ndarray, axis: int) -> jnp.ndarray:
    mm = jnp.asarray(m, feat.dtype)
    return jnp.moveaxis(jnp.tensordot(mm, feat, axes=(1, axis)), 0, axis)


def align_level(feat: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resample [B, T, H, W, ...] to [B, T, h, w, ...], equivalent to the
    cascaded power-of-two _up2/_down2 chain but applied as one composed
    interpolation matmul per axis (H/W ratios in the FPN are powers of
    two)."""
    h, w = out_hw
    hi, wi = feat.shape[2], feat.shape[3]
    if hi == h and wi == w:
        return feat
    # apply the shrinking axis first / the growing axis last to keep the
    # intermediate as small as possible
    if h * wi <= hi * w:
        order = ((2, hi, h), (3, wi, w))
    else:
        order = ((3, wi, w), (2, hi, h))
    for axis, n_in, n_out in order:
        if n_in != n_out:
            feat = _resize_axis(feat, _resize_matrix(n_in, n_out), axis)
    return feat


def align_all_levels(
    values: Sequence[jnp.ndarray],           # per level [B, T, Hl, Wl, ...]
    grids: Sequence[Tuple[int, int]],        # target (H, W) per query grid
) -> List[List[jnp.ndarray]]:
    """aligned[i][j] = value level j resampled onto query grid i.

    Every (level, grid) pair is one composed-matrix resize straight from
    the native level (:func:`align_level`); no cascade sharing is needed
    because the single matmul never materializes intermediate resolutions.
    """
    return [[align_level(v, tuple(hw)) for v in values] for hw in grids]


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


def native_phase(n_q: int, n_v: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static base cell + fractional phase mapping query index q on an
    n_q-sized grid onto an n_v-sized value grid:

        p0(q) = (q + 0.5) * (n_v / n_q) - 0.5

    — the reference sampler's align_corners=False map (a query's own
    normalized centre (q+0.5)/n_q scaled onto the value grid,
    ms_deform_im2col_cuda_t.cuh:34-115).  Returns (base [n_q] int,
    phi [n_q] float32) with p0 = base + phi, phi in [0, 1).
    """
    p0 = (np.arange(n_q) + 0.5) * (n_v / n_q) - 0.5
    base = np.floor(p0).astype(np.int64)
    return base, (p0 - base).astype(np.float32)


def native_blend_level(
    vol: jnp.ndarray,      # [B, T, Hv, Wv, C] value level at NATIVE resolution
    dx: jnp.ndarray,       # [B, T, Hq, Wq, nh*P] offsets in NATIVE pixels,
    dy: jnp.ndarray,       #                      |d| < 1
    a: jnp.ndarray,        # [B, T, Hq, Wq, nh*P] attention weights
    nh: int,
    dt: jnp.ndarray | None = None,   # temporal offsets, |d| < 1 frames
) -> jnp.ndarray:
    """Cross-resolution windowed blend: every query on the (Hq, Wq) grid
    trilinearly samples ``vol`` at its own mapped position (native_phase)
    plus a sub-pixel offset, with zero padding outside the volume — the
    same geometry as the exact sampler (deform_encoder.py:78-87) with the
    offset clamped to +-1 native pixel/frame.  With ``dt=None`` the
    temporal axis is sampled at the query's own frame (spatial-only
    window); with ``dt`` given, 3 temporal taps interpolate across
    zero-padded neighbour frames (levels share the query's T).
    Returns [B, T, Hq, Wq, C] fp32.

    XLA formulation: the (3x)4x4 candidate taps around each query's static
    base cell become statically-indexed (take-along-axis) shifted maps;
    the Pallas kernel variant instead reads the small native plane into
    VMEM once per output tile (2d window only for now).
    """
    b, t, hv, wv, c = vol.shape
    hq, wq = dx.shape[2], dx.shape[3]
    d = c // nh
    base_y, phi_y = native_phase(hq, hv)
    base_x, phi_x = native_phase(wq, wv)

    vp = jnp.pad(
        vol, [(0, 0), (0, 0), (2, 2), (2, 2), (0, 0)]
    ).astype(jnp.float32)
    dxf = dx.astype(jnp.float32) + phi_x[None, None, None, :, None]
    dyf = dy.astype(jnp.float32) + phi_y[None, None, :, None, None]
    af = a.astype(jnp.float32)

    if dt is None:
        t_taps = [(None, None)]
    else:
        # all levels share the query's T (guarded by the encoder), so the
        # temporal phase is 0 and 3 taps {-1, 0, +1} suffice for |dt| < 1
        vp_t = jnp.pad(vp, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)])
        dtf = dt.astype(jnp.float32)
        t_taps = [(st, jnp.maximum(0.0, 1.0 - jnp.abs(dtf - st)))
                  for st in (-1, 0, 1)]

    out = jnp.zeros((b, t, hq, wq, nh, d), jnp.float32)
    for st, ht in t_taps:
        vt = vp if st is None else vp_t[:, st + 1 : st + 1 + t]
        at = af if st is None else af * ht
        for sy in range(-1, 3):
            vy = jnp.take(vt, jnp.asarray(base_y + sy + 2), axis=2)
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(dyf - sy))
            ay = at * hy
            for sx in range(-1, 3):
                vxy = jnp.take(vy, jnp.asarray(base_x + sx + 2), axis=3)
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(dxf - sx))
                m = (ay * hx).reshape(b, t, hq, wq, nh, -1).sum(-1)
                out = out + m[..., None] * vxy.reshape(b, t, hq, wq, nh, d)
    return out.reshape(b, t, hq, wq, c)


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
