"""Resampling utilities with exact reference numerics.

The reference resamples features three different ways and each has distinct
coordinate math that is parity-critical:

* ``grid_resize_2d/3d`` — reproduces ``F.grid_sample(..., align_corners=False,
  padding_mode='zeros')`` evaluated on a ``linspace(-1, 1, n)`` grid, which is
  how ``make_interpolated_features`` builds the common decoder grid
  (/root/reference/models/detr/dab_transformer.py:239-294).  Note this is NOT
  ``F.interpolate``: the inclusive [-1, 1] endpoints put the outermost samples
  half a pixel outside the source, so edges blend with zero padding.
* ``bicubic_resize_2d`` — reproduces ``F.interpolate(mode='bicubic',
  align_corners=False)`` (Keys kernel a=-0.75, half-pixel centres, clamped
  borders), used for ViT positional-embedding re-interpolation
  (/root/reference/models/backbones/vit_utils.py:378-392).
* nearest mask resize lives in utils.misc.interpolate_mask.

All functions are channels-last and jit-friendly (static output shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def _grid_coords(n_out: int, size: int) -> jnp.ndarray:
    """Source coordinates for grid_sample(align_corners=False) on a
    linspace(-1, 1, n_out) grid: x = ((g + 1) * size - 1) / 2."""
    if n_out == 1:
        g = jnp.zeros((1,), jnp.float32)
    else:
        g = jnp.linspace(-1.0, 1.0, n_out)
    return ((g + 1.0) * size - 1.0) / 2.0


def _lerp_weights(coords: jnp.ndarray, size: int):
    """Corner indices, weights and validity for 1-D linear interp with
    zero padding outside [0, size-1]."""
    i0 = jnp.floor(coords)
    frac = coords - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    ok0 = (i0 >= 0) & (i0 < size)
    ok1 = (i1 >= 0) & (i1 < size)
    return (
        jnp.clip(i0, 0, size - 1),
        jnp.clip(i1, 0, size - 1),
        (1.0 - frac) * ok0,
        frac * ok1,
    )


def grid_resize_2d(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resample [..., H, W, C] to [..., h, w, C] via the linspace
    grid_sample convention (zeros padding)."""
    *lead, H, W, C = x.shape
    oh, ow = out_hw
    ys = _grid_coords(oh, H)
    xs = _grid_coords(ow, W)
    y0, y1, wy0, wy1 = _lerp_weights(ys, H)
    x0, x1, wx0, wx1 = _lerp_weights(xs, W)

    # Gather rows then columns; weights fold in the zero-padding masks.
    r0 = jnp.take(x, y0, axis=-3)
    r1 = jnp.take(x, y1, axis=-3)
    rows = r0 * wy0[:, None, None] + r1 * wy1[:, None, None]
    c0 = jnp.take(rows, x0, axis=-2)
    c1 = jnp.take(rows, x1, axis=-2)
    return c0 * wx0[:, None] + c1 * wx1[:, None]


def grid_resize_3d(x: jnp.ndarray, out_thw: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear resample [..., T, H, W, C] to [..., t, h, w, C], same
    convention as grid_resize_2d."""
    *lead, T, H, W, C = x.shape
    ot, oh, ow = out_thw
    ts = _grid_coords(ot, T)
    t0, t1, wt0, wt1 = _lerp_weights(ts, T)
    p0 = jnp.take(x, t0, axis=-4)
    p1 = jnp.take(x, t1, axis=-4)
    planes = p0 * wt0[:, None, None, None] + p1 * wt1[:, None, None, None]
    return grid_resize_2d(planes, (oh, ow))


def grid_resize_3d_at_frame(
    x: jnp.ndarray, out_thw: tuple[int, int, int], frame: int
) -> jnp.ndarray:
    """Exactly ``grid_resize_3d(x, out_thw)[..., frame, :, :, :]`` without
    computing the other output frames — the single-frame ("eff") decoder
    consumes only the centre frame of the common grid.  Returns
    [..., 1, h, w, C] (the frame axis is kept, size 1)."""
    *lead, T, H, W, C = x.shape
    ot, oh, ow = out_thw
    ts = _grid_coords(ot, T)[frame : frame + 1]
    t0, t1, wt0, wt1 = _lerp_weights(ts, T)
    p0 = jnp.take(x, t0, axis=-4)
    p1 = jnp.take(x, t1, axis=-4)
    planes = p0 * wt0[:, None, None, None] + p1 * wt1[:, None, None, None]
    return grid_resize_2d(planes, (oh, ow))


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel (torch uses a=-0.75)."""
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _cubic_axis(n_out: int, size: int):
    """Indices [n_out, 4] (clamped) and weights [n_out, 4] for one axis of
    torch bicubic interpolation with align_corners=False."""
    scale = size / n_out
    dst = jnp.arange(n_out, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    frac = src - jnp.floor(src)
    offs = jnp.arange(-1, 3)
    idx = i0[:, None] + offs[None, :]
    w = _cubic_kernel(frac[:, None] - offs[None, :].astype(jnp.float32))
    idx = jnp.clip(idx, 0, size - 1)  # torch clamps border reads
    return idx, w


def bicubic_resize_2d(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic resample [..., H, W, C] → [..., h, w, C] matching
    F.interpolate(mode='bicubic', align_corners=False)."""
    *lead, H, W, C = x.shape
    oh, ow = out_hw
    yi, yw = _cubic_axis(oh, H)
    xi, xw = _cubic_axis(ow, W)
    rows = jnp.take(x, yi.reshape(-1), axis=-3)
    rows = rows.reshape(*lead, oh, 4, W, C)
    rows = (rows * yw[:, :, None, None]).sum(axis=-3)       # [..., oh, W, C]
    cols = jnp.take(rows, xi.reshape(-1), axis=-2)
    cols = cols.reshape(*lead, oh, ow, 4, C)
    return (cols * xw[:, :, None]).sum(axis=-2)             # [..., oh, ow, C]
