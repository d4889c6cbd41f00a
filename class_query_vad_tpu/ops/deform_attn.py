"""3D multi-scale deformable attention — TPU-native.

Replaces the reference CUDA extension ``MultiScaleDeformableAttention``
(semantics: trilinear 8-corner sampling in
/root/reference/ops/src/cuda/ms_deform_im2col_cuda_t.cuh:34-115, coordinate
unnormalization ``loc * size - 0.5`` with an all-corners-outside drop guard at
:424-431, module-level projections in
/root/reference/ops/modules/ms_deform_attn.py:167-204).

Two implementations share one functional signature:

* ``ms_deform_attn_3d_xla``  — pure-XLA vectorized gather.  Differentiable by
  construction (``jax.grad`` replaces the reference's ~1,100-line hand-written
  col2im backward), correct on any backend; serves as the golden reference.
* ``ms_deform_attn_3d`` — dispatcher; currently the XLA path (a Pallas
  query-tiled kernel can be slotted in behind the same signature).

Layout notes (TPU-first): values are kept ``[B, S, H, D]`` with the head/depth
axes last so the per-corner gathers are contiguous 128-lane reads, and the
8-corner weighted sum is a fused VPU op.  Level shapes are *static* Python
tuples — levels are unrolled at trace time, so XLA sees fixed-shape gathers.

Coordinate convention (pinned by the CUDA kernel): the last axis of
``sampling_locations`` is ``(x, y, t)`` i.e. (width, height, time), each
normalized to [0, 1] over the *level's* extent.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _sample_level(
    value: jnp.ndarray,          # [B, t*h*w, H, D] one level, flattened
    shape: Tuple[int, int, int],  # (t, h, w) static
    loc: jnp.ndarray,            # [B, Q, H, P, 3] normalized (x, y, t)
    weight: jnp.ndarray,         # [B, Q, H, P]
) -> jnp.ndarray:
    """Trilinear-sample one level and reduce over points. Returns [B, Q, H, D]."""
    t, h, w = shape
    bsz, _, nheads, depth = value.shape

    # Unnormalize exactly like the CUDA kernel (cuda/ms_deform_im2col_cuda_t.cuh:424-426)
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    tt = loc[..., 2] * t - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    t0 = jnp.floor(tt)
    lx = x - x0
    ly = y - y0
    lt = tt - t0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    t0i = t0.astype(jnp.int32)

    # Entirely-outside points are dropped (guard at :428); corner-wise
    # validity masks reproduce both the guard and the edge zero-padding.
    in_bounds = (
        (tt > -1.0) & (y > -1.0) & (x > -1.0)
        & (tt < t) & (y < h) & (x < w)
    )
    weight = weight * in_bounds.astype(weight.dtype)

    out = jnp.zeros(loc.shape[:3] + (depth,), dtype=value.dtype)
    for dt in (0, 1):
        ti = t0i + dt
        wt = lt if dt else (1.0 - lt)
        t_ok = (ti >= 0) & (ti <= t - 1)
        for dy in (0, 1):
            yi = y0i + dy
            wy = ly if dy else (1.0 - ly)
            y_ok = (yi >= 0) & (yi <= h - 1)
            for dx in (0, 1):
                xi = x0i + dx
                wx = lx if dx else (1.0 - lx)
                x_ok = (xi >= 0) & (xi <= w - 1)

                ok = t_ok & y_ok & x_ok
                flat = (ti * h + yi) * w + xi
                flat = jnp.clip(flat, 0, t * h * w - 1)
                cw = (wt * wy * wx) * ok.astype(weight.dtype) * weight
                gathered = _gather_heads(value, flat)          # [B, Q, H, P, D]
                out = out + (cw[..., None] * gathered).sum(axis=3)
    return out


def _gather_heads(value: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """Gather value [B, S, H, D] at per-head flat spatial indices.

    flat: [B, Q, H, P] int32 -> returns [B, Q, H, P, D].
    """
    bsz, s, nheads, depth = value.shape
    # Move head axis next to spatial so one take_along_axis does the job:
    # value -> [B, H, S, D]; flat -> [B, H, Q*P]
    v = jnp.swapaxes(value, 1, 2)                      # [B, H, S, D]
    b, q, hh, p = flat.shape
    idx = jnp.swapaxes(flat, 1, 2).reshape(b, hh, q * p, 1)
    g = jnp.take_along_axis(v, idx, axis=2)            # [B, H, Q*P, D]
    g = g.reshape(b, hh, q, p, depth)
    return jnp.moveaxis(g, 1, 2)                       # [B, Q, H, P, D]


def ms_deform_attn_3d_xla(
    value: jnp.ndarray,                       # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int, int]],
    sampling_locations: jnp.ndarray,          # [B, Q, H, L, P, 3] (x, y, t)
    attention_weights: jnp.ndarray,           # [B, Q, H, L, P]
    query_chunk: int = 4096,
) -> jnp.ndarray:
    """Pure-XLA 3D multi-scale deformable attention. Returns [B, Q, H*D].

    Queries are processed in ``query_chunk``-sized sequential chunks
    (lax.map): the 8-corner gathers materialize [B, CQ, H, P, D]
    intermediates, and at encoder scale (Q = Σ t·h·w ≈ 13.6k, 6 layers)
    unchunked temps blow past HBM — the CUDA reference has the same
    structure with im2col_step=64 batch chunking
    (ops/src/cuda/ms_deform_attn_cuda_t.cu:20-80).
    """
    bsz, s_total, nheads, depth = value.shape
    nlevels = len(spatial_shapes)
    assert sampling_locations.shape[3] == nlevels

    sizes = [t * h * w for (t, h, w) in spatial_shapes]
    assert sum(sizes) == s_total, (sizes, s_total)

    q = sampling_locations.shape[1]

    def sample_all_levels(loc, wgt):
        out = jnp.zeros(loc.shape[:2] + (nheads, depth), dtype=value.dtype)
        start = 0
        for lvl, shape in enumerate(spatial_shapes):
            v_l = jax.lax.slice_in_dim(value, start, start + sizes[lvl], axis=1)
            out = out + _sample_level(v_l, shape, loc[:, :, :, lvl],
                                      wgt[:, :, :, lvl])
            start += sizes[lvl]
        return out

    if q <= query_chunk:
        out = sample_all_levels(sampling_locations, attention_weights)
        return out.reshape(bsz, q, nheads * depth)

    pad = (-q) % query_chunk
    loc = jnp.pad(sampling_locations, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    wgt = jnp.pad(attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    n_chunks = (q + pad) // query_chunk
    loc = loc.reshape((bsz, n_chunks, query_chunk) + loc.shape[2:])
    wgt = wgt.reshape((bsz, n_chunks, query_chunk) + wgt.shape[2:])

    out = jax.lax.map(
        lambda lw: sample_all_levels(lw[0], lw[1]),
        (jnp.moveaxis(loc, 1, 0), jnp.moveaxis(wgt, 1, 0)),
    )                                          # [n_chunks, B, CQ, H, D]
    out = jnp.moveaxis(out, 0, 1).reshape(bsz, q + pad, nheads * depth)
    return out[:, :q]


def _sample_level_blocked(
    value: jnp.ndarray,          # [B, t*h*w, H, D] one level
    shape: Tuple[int, int, int],
    loc: jnp.ndarray,            # [B, Q, H, P, 3] (x, y, t)
    weight: jnp.ndarray,         # [B, Q, H, P]
) -> jnp.ndarray:
    """Trilinear sampling via ONE blocked lax.gather per level.

    All 8 corners of each sample are fetched as a (2, 2, 2, D) slice from a
    zero-padded volume (the padding realizes the CUDA kernel's edge-zero
    semantics), which XLA's TPU gather handles ~2-3x faster than eight
    separate row gathers.  Returns [B, Q, H, D].
    """
    t, h, w = shape
    bsz, _, nheads, depth = value.shape
    b_, q, _, p, _ = loc.shape

    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    tt = loc[..., 2] * t - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    t0 = jnp.floor(tt)
    lx = (x - x0).astype(value.dtype)
    ly = (y - y0).astype(value.dtype)
    lt = (tt - t0).astype(value.dtype)

    in_bounds = (
        (tt > -1.0) & (y > -1.0) & (x > -1.0) & (tt < t) & (y < h) & (x < w)
    )
    weight = (weight * in_bounds).astype(value.dtype)

    # +1 shift into the zero-padded volume; clip keeps the slice in range
    # (far-out points are already weight-zeroed by the guard above)
    t0i = jnp.clip(t0.astype(jnp.int32) + 1, 0, t)
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)

    vol = value.transpose(0, 2, 1, 3).reshape(bsz * nheads, t, h, w, depth)
    vol = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    idx = jnp.stack([t0i, y0i, x0i], axis=-1)          # [B, Q, H, P, 3]
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(bsz * nheads, q * p, 3)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    gather_one = lambda v, i: jax.lax.gather(
        v, i, dnums, slice_sizes=(2, 2, 2, depth),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    g = jax.vmap(gather_one)(vol, idx)                 # [BH, QP, 2, 2, 2, D]
    g = g.reshape(bsz, nheads, q, p, 8, depth).transpose(0, 2, 1, 3, 4, 5)

    wt = jnp.stack([1.0 - lt, lt], axis=-1)            # [B, Q, H, P, 2]
    wy = jnp.stack([1.0 - ly, ly], axis=-1)
    wx = jnp.stack([1.0 - lx, lx], axis=-1)
    cw = (
        wt[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    ).reshape(b_, q, nheads, p, 8) * weight[..., None]
    return jnp.einsum("bqhpc,bqhpcd->bqhd", cw, g)


def ms_deform_attn_3d_blocked(
    value, spatial_shapes, sampling_locations, attention_weights,
    query_chunk: int = 2048,
) -> jnp.ndarray:
    """Blocked-gather implementation (same contract as the _xla variant)."""
    bsz, s_total, nheads, depth = value.shape
    sizes = [t * h * w for (t, h, w) in spatial_shapes]
    q = sampling_locations.shape[1]

    def sample_all(loc, wgt):
        out = jnp.zeros(loc.shape[:2] + (nheads, depth), dtype=value.dtype)
        start = 0
        for lvl, shape in enumerate(spatial_shapes):
            v_l = jax.lax.slice_in_dim(value, start, start + sizes[lvl], axis=1)
            out = out + _sample_level_blocked(
                v_l, shape, loc[:, :, :, lvl], wgt[:, :, :, lvl]
            )
            start += sizes[lvl]
        return out

    if q <= query_chunk:
        return sample_all(sampling_locations, attention_weights).reshape(
            bsz, q, nheads * depth
        )
    pad = (-q) % query_chunk
    loc = jnp.pad(sampling_locations, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    wgt = jnp.pad(attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    n_chunks = (q + pad) // query_chunk
    loc = loc.reshape((bsz, n_chunks, query_chunk) + loc.shape[2:])
    wgt = wgt.reshape((bsz, n_chunks, query_chunk) + wgt.shape[2:])
    out = jax.lax.map(
        lambda lw: sample_all(lw[0], lw[1]),
        (jnp.moveaxis(loc, 1, 0), jnp.moveaxis(wgt, 1, 0)),
    )
    out = jnp.moveaxis(out, 0, 1).reshape(bsz, q + pad, nheads * depth)
    return out[:, :q]


def _pack_corners(value: jnp.ndarray, shape: Tuple[int, int, int]):
    """Corner-packed gather table for one level.

    value [B, t*h*w, H, D] -> packed [B*H, (t+1)*(h+1)*(w+1), 8*D] where
    row (u, v, z) holds the 8 trilinear corners of base index
    (u-1, v-1, z-1) of the ZERO-PADDED volume — i.e. all corners a sample
    with clipped floor indices (u, v, z) needs, concatenated along the
    last axis in (dt, dy, dx) order.
    """
    t, h, w = shape
    bsz, _, nheads, depth = value.shape
    vol = value.transpose(0, 2, 1, 3).reshape(bsz * nheads, t, h, w, depth)
    vol = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    parts = [
        vol[:, dt : dt + t + 1, dy : dy + h + 1, dx : dx + w + 1]
        for dt in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    packed = jnp.concatenate(parts, axis=-1)       # [BH, t+1, h+1, w+1, 8D]
    return packed.reshape(bsz * nheads, (t + 1) * (h + 1) * (w + 1),
                          8 * depth)


def _sample_level_packed(
    packed: jnp.ndarray,         # [B*H, Sp, 8*D] corner-packed table
    shape: Tuple[int, int, int],
    loc: jnp.ndarray,            # [B, Q, H, P, 3] (x, y, t)
    weight: jnp.ndarray,         # [B, Q, H, P]
    nheads: int,
    depth: int,
) -> jnp.ndarray:
    """Trilinear sampling via ONE row-gather per (query, head, point).

    The TPU XLA gather is per-ROW bound (~190 M rows/s regardless of row
    width up to 256+ lanes — PERF.md round 2), so fetching all 8 corners
    as one wide row is ~8x fewer gathers than row-per-corner and ~4x
    faster than the (2,2,2,D) blocked slice gather.  Returns [B, Q, H, D].
    """
    t, h, w = shape
    b_, q, _, p, _ = loc.shape

    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    tt = loc[..., 2] * t - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    t0 = jnp.floor(tt)
    lx = (x - x0).astype(packed.dtype)
    ly = (y - y0).astype(packed.dtype)
    lt = (tt - t0).astype(packed.dtype)

    in_bounds = (
        (tt > -1.0) & (y > -1.0) & (x > -1.0) & (tt < t) & (y < h) & (x < w)
    )
    weight = (weight * in_bounds).astype(packed.dtype)

    t0i = jnp.clip(t0.astype(jnp.int32) + 1, 0, t)
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    flat = (t0i * (h + 1) + y0i) * (w + 1) + x0i    # [B, Q, H, P]

    wt = jnp.stack([1.0 - lt, lt], axis=-1)         # [B, Q, H, P, 2]
    wy = jnp.stack([1.0 - ly, ly], axis=-1)
    wx = jnp.stack([1.0 - lx, lx], axis=-1)
    cw = (
        wt[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    ).reshape(b_, q, nheads, p, 8) * weight[..., None]

    # One gather PER (batch, head) from that head's own packed table.  The
    # XLA row-gather rate is table-size dependent (measured on v5e: ~230
    # Mrows/s from a <=24 MB table vs ~78 Mrows/s from the 8-head 194 MB
    # fold — a 2.7x win).  The (point, corner) weighted reduction is done
    # WITHOUT ever reshaping the gathered rows to a depth-minor layout
    # (a [.., 8, D<128] minor dim tiles to (8, 128) with most lanes wasted
    # — the round-1 flat-lanes trap): rows stay [Q, P*8D] and the
    # reduction is one MXU matmul against a constant block-summing matrix,
    # with the corner weights expanded to row width by a second tiny
    # matmul against a 0/1 block expander.
    sp = (t + 1) * (h + 1) * (w + 1)
    tabs = packed.reshape(b_, nheads, sp, 8 * depth)
    pc = p * 8
    expander = jnp.repeat(
        jnp.eye(pc, dtype=packed.dtype), depth, axis=1
    )                                               # [P*8, P*8D]
    summer = jnp.tile(
        jnp.eye(depth, dtype=packed.dtype), (pc, 1)
    )                                               # [P*8D, D]
    outs = []
    for bi in range(b_):
        for hh in range(nheads):
            rows = jnp.take(
                tabs[bi, hh], flat[bi, :, hh].reshape(-1), axis=0, mode="clip"
            ).reshape(q, p * 8 * depth)             # [Q, P*8D]
            cwx = cw[bi, :, hh].reshape(q, pc) @ expander
            outs.append(
                jax.lax.dot(
                    rows * cwx, summer,
                    preferred_element_type=jnp.float32,
                ).astype(packed.dtype)
            )                                       # [Q, D]
    out = jnp.stack(outs).reshape(b_, nheads, q, depth)
    return out.transpose(0, 2, 1, 3)


def ms_deform_attn_3d_packed(
    value, spatial_shapes, sampling_locations, attention_weights,
    query_chunk: int = 65536,
) -> jnp.ndarray:
    """Corner-packed row-gather implementation (same contract as _xla)."""
    bsz, s_total, nheads, depth = value.shape
    sizes = [t * h * w for (t, h, w) in spatial_shapes]
    q = sampling_locations.shape[1]

    packed = []
    start = 0
    for lvl, shape in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value, start, start + sizes[lvl], axis=1)
        packed.append(_pack_corners(v_l, shape))
        start += sizes[lvl]

    def sample_all(loc, wgt):
        out = jnp.zeros(loc.shape[:2] + (nheads, depth), dtype=value.dtype)
        for lvl, shape in enumerate(spatial_shapes):
            out = out + _sample_level_packed(
                packed[lvl], shape, loc[:, :, :, lvl], wgt[:, :, :, lvl],
                nheads, depth,
            )
        return out

    if q <= query_chunk:
        return sample_all(sampling_locations, attention_weights).reshape(
            bsz, q, nheads * depth
        )
    pad = (-q) % query_chunk
    loc = jnp.pad(sampling_locations, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    wgt = jnp.pad(attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    n_chunks = (q + pad) // query_chunk
    loc = loc.reshape((bsz, n_chunks, query_chunk) + loc.shape[2:])
    wgt = wgt.reshape((bsz, n_chunks, query_chunk) + wgt.shape[2:])
    out = jax.lax.map(
        lambda lw: sample_all(lw[0], lw[1]),
        (jnp.moveaxis(loc, 1, 0), jnp.moveaxis(wgt, 1, 0)),
    )
    out = jnp.moveaxis(out, 0, 1).reshape(bsz, q + pad, nheads * depth)
    return out[:, :q]


def ms_deform_attn_3d(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Dispatch to the best available implementation for this backend."""
    return ms_deform_attn_3d_packed(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def directional_offset_init(
    n_heads: int, n_levels: int, n_points: int
) -> jnp.ndarray:
    """Bias init for the sampling-offset head.

    Spreads heads on a circle in (x, y) with the first half of heads carrying
    temporal extent, scaled per point — reference init at
    /root/reference/ops/modules/ms_deform_attn.py:149-159.
    Returns [n_heads * n_levels * n_points * 3] flat bias.
    """
    half = n_heads // 2
    thetas = jnp.arange(half, dtype=jnp.float32) * (2.0 * math.pi / half)
    t_extent = jnp.concatenate([jnp.ones(half), jnp.zeros(n_heads - half)])
    grid = jnp.stack(
        [
            jnp.tile(jnp.cos(thetas), 2)[:n_heads],
            jnp.tile(jnp.sin(thetas), 2)[:n_heads],
            t_extent,
        ],
        axis=-1,
    )  # [H, 3]
    grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    point_scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
    grid = grid * point_scale
    return grid.reshape(-1)


def directional_offset_init_l3hp(
    n_heads: int, n_levels: int, n_points: int
) -> jnp.ndarray:
    """directional_offset_init permuted to (level, component, head, point)
    lane order — the fast encoder's offset head uses this layout so that
    per-(level, component) slices are contiguous lane ranges (no padded
    transposes on TPU; see ops/fast_deform_pallas.py)."""
    g = directional_offset_init(n_heads, n_levels, n_points)
    g = g.reshape(n_heads, n_levels, n_points, 3)
    return g.transpose(1, 3, 0, 2).reshape(-1)


def directional_offset_init_l2hp(
    n_heads: int, n_levels: int, n_points: int
) -> jnp.ndarray:
    """Spatial-only variant of directional_offset_init_l3hp: the (x, y)
    circle components in (level, component, head, point) lane order, for
    the fast encoder's 2D window (``FAST_WINDOW: 2d``)."""
    g = directional_offset_init(n_heads, n_levels, n_points)
    g = g.reshape(n_heads, n_levels, n_points, 3)[..., :2]
    return g.transpose(1, 3, 0, 2).reshape(-1)
