"""3D sine positional encoding.

Functional port of ``PositionEmbeddingSine_3D``
(/root/reference/models/position_encoding.py:15-77): cumulative-sum position
over the valid (unpadded) region of the mask, normalized to [0, 2π], split
2/8 of the channels to time and 3/8 each to y and x.

Parity notes pinned against the reference:
* the frequency exponent uses TRUE division — ``temperature ** (2*(i/2)/n)``
  = ``temperature ** (i/n)`` (``torch.div``, reference line 55; the standard
  floor-div variant is commented out there);
* channel interleave is sin(p[0::2]) / cos(p[1::2]) stacked pairwise;
* channel order is (t, y, x).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sincos(p: jnp.ndarray) -> jnp.ndarray:
    """[..., n] -> [..., n] with out[2k]=sin(p[2k]), out[2k+1]=cos(p[2k+1])."""
    s = jnp.sin(p[..., 0::2])
    c = jnp.cos(p[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*p.shape[:-1], -1)


def position_embedding_sine_3d(
    mask: jnp.ndarray,
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """mask: [B, T, H, W] bool (True = padded) -> pos [B, T, H, W, C].

    ``num_pos_feats`` is the full channel count C (the reference passes
    D_MODEL and splits internally).
    """
    if scale is None:
        scale = 2.0 * math.pi
    n_t = num_pos_feats // 8 * 2
    n_s = num_pos_feats // 8 * 3

    not_mask = (~mask).astype(jnp.float32)
    t_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    if normalize:
        eps = 1e-6
        t_embed = t_embed / (t_embed[:, -1:, :, :] + eps) * scale
        y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale

    # true-division exponent: temperature ** (i / n)
    dim_t = temperature ** (jnp.arange(n_t, dtype=jnp.float32) / n_t)
    dim_s = temperature ** (jnp.arange(n_s, dtype=jnp.float32) / n_s)

    pos_t = _interleave_sincos(t_embed[..., None] / dim_t)
    pos_y = _interleave_sincos(y_embed[..., None] / dim_s)
    pos_x = _interleave_sincos(x_embed[..., None] / dim_s)
    return jnp.concatenate([pos_t, pos_y, pos_x], axis=-1)


def position_embedding_sine_3d_frames(
    mask2d: jnp.ndarray,
    frames,
    t_total: int,
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    scale: float | None = None,
) -> jnp.ndarray:
    """Sine embedding at a subset of absolute temporal frames.

    ``mask2d``: [B, H, W] bool (True = padded), replicated over time (the
    ViT/CSN level masks are — backbone.level_masks_and_poses broadcasts one
    spatial mask over T_l).  ``frames``: absolute 0-based frame indices;
    ``t_total``: the level's full temporal extent.  Bit-equal to slicing
    ``position_embedding_sine_3d`` of the replicated [B, t_total, H, W]
    mask at ``frames``: with a time-replicated mask the temporal cumsum at
    frame i is (i+1)·~mask and its normalizer is t_total·~mask, both
    reproduced here without materializing the full-T volume.
    """
    if scale is None:
        scale = 2.0 * math.pi
    n_t = num_pos_feats // 8 * 2
    n_s = num_pos_feats // 8 * 3
    eps = 1e-6

    nm = (~mask2d).astype(jnp.float32)                    # [B, H, W]
    fr = jnp.asarray(list(frames), jnp.float32) + 1.0     # cumsum values
    # [B, F, H, W]: ((i+1)*nm) / (t_total*nm + eps) * scale
    t_embed = (fr[None, :, None, None] * nm[:, None]) / (
        t_total * nm[:, None] + eps
    ) * scale
    y_embed = jnp.cumsum(nm, axis=1)
    x_embed = jnp.cumsum(nm, axis=2)
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = temperature ** (jnp.arange(n_t, dtype=jnp.float32) / n_t)
    dim_s = temperature ** (jnp.arange(n_s, dtype=jnp.float32) / n_s)

    f = len(list(frames))
    b, h, w = mask2d.shape
    pos_t = _interleave_sincos(t_embed[..., None] / dim_t)
    pos_y = jnp.broadcast_to(
        _interleave_sincos(y_embed[..., None] / dim_s)[:, None],
        (b, f, h, w, n_s),
    )
    pos_x = jnp.broadcast_to(
        _interleave_sincos(x_embed[..., None] / dim_s)[:, None],
        (b, f, h, w, n_s),
    )
    return jnp.concatenate([pos_t, pos_y, pos_x], axis=-1)


def vit_sinusoid_table(n_position: int, d_hid: int) -> jnp.ndarray:
    """VideoMAE fixed sinusoid table
    (/root/reference/models/backbones/vit_utils.py:196-207): angle =
    pos / 10000^(2*(j//2)/d); even dims sin, odd dims cos.  Returns
    [n_position, d_hid] float32.
    """
    j = jnp.arange(d_hid)
    denom = jnp.power(10000.0, 2.0 * (j // 2) / d_hid)
    angles = jnp.arange(n_position, dtype=jnp.float32)[:, None] / denom[None, :]
    table = jnp.where(j[None, :] % 2 == 0, jnp.sin(angles), jnp.cos(angles))
    return table.astype(jnp.float32)
