"""Deformable transformer encoder (3D multi-scale) — TPU-native.

Parity references:
* ``MSDeformAttn3D`` module-level math (projections, offset/weight heads,
  sampling-location formation incl. the reference's permuted offset
  normalizer (T, W, H) against (x, y, t) offsets) —
  /root/reference/ops/modules/ms_deform_attn.py:117-204;
* encoder reference-point grid and valid-ratio scaling —
  /root/reference/models/detr/dab_transformer.py:425-482;
* encoder layer: deformable self-attn + FFN, post-norm —
  dab_transformer.py:484-523.

The sampling itself is ``ops.deform_attn.ms_deform_attn_3d`` (XLA gather /
Pallas); this file is the glue that keeps every linear in MXU-friendly
[tokens, C] layout.  The encoder runs in float32 — the reference wraps it in
an autocast-disabled island (dab_transformer.py:333-334).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_attn import directional_offset_init, ms_deform_attn_3d

# the directional bias init lives in ops.deform_attn (tested there)
deform_offset_init_bias = directional_offset_init


class MSDeformAttn3D(nn.Module):
    """3D multi-scale deformable attention module (projections + sampling)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                 # [B, Q, C]
        reference_points: jnp.ndarray,      # [B, Q, L, 3] (x, y, t) or [B, Q, L, 6]
        value_src: jnp.ndarray,             # [B, S, C] flattened levels
        spatial_shapes: Sequence[Tuple[int, int, int]],  # static (t, h, w)
        padding_mask: jnp.ndarray | None = None,          # [B, S] True=pad
    ) -> jnp.ndarray:
        b, q, _ = query.shape
        s = value_src.shape[1]
        nh, nl, np_ = self.n_heads, self.n_levels, self.n_points
        head_dim = self.d_model // nh

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value_src)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(b, s, nh, head_dim)

        offsets = nn.Dense(
            nh * nl * np_ * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: deform_offset_init_bias(nh, nl, np_),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, q, nh, nl, np_, 3)
        weights = nn.Dense(
            nh * nl * np_,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(b, q, nh, nl * np_)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, q, nh, nl, np_)

        if reference_points.shape[-1] == 3:
            # Reference quirk: normalizer is stacked (T, W, H) against
            # (x, y, t)-ordered offsets (ms_deform_attn.py:192).
            normalizer = jnp.asarray(
                [[t, w, h] for (t, h, w) in spatial_shapes], jnp.float32
            )  # [L, 3]
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 6:
            loc = (
                reference_points[:, :, None, :, None, :3]
                + offsets / np_ * reference_points[:, :, None, :, None, 3:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 3 or 6")

        out = ms_deform_attn_3d(value, tuple(spatial_shapes), loc, weights)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    """Post-norm deformable self-attention + FFN (dab_transformer.py:484-523)."""

    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, src, pos, reference_points, spatial_shapes, padding_mask,
        deterministic: bool = True, q_chunks=None,
    ):
        # q_chunks: static ((start, stop), ...) token-row spans — restrict
        # this layer's QUERIES (and its output) to those rows while the
        # sampling still reads the full value stream.  Exact for the FINAL
        # encoder layer in single-frame mode: only the centre-lerp frames
        # of each level are consumed downstream, and every per-query op
        # (offset/weight heads, sampling, residual, LN, FFN) is row-
        # independent given full values.
        if q_chunks is not None:
            take = lambda x: jnp.concatenate(
                [x[:, a:b] for a, b in q_chunks], axis=1
            )
            q_src, q_pos, q_ref = (
                take(src), take(pos), take(reference_points)
            )
        else:
            q_src, q_pos, q_ref = src, pos, reference_points
        attn = MSDeformAttn3D(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.dtype, name="self_attn",
        )(q_src + q_pos, q_ref, src, spatial_shapes, padding_mask)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(q_src + attn)

        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src + y)


def encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int, int]], valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """Per-token (x, y, t) reference grid scaled by valid ratios.

    valid_ratios: [B, L, 3] in (w, h, t) order — reference
    dab_transformer.py:433-449.  Returns [B, S, L, 3].
    """
    refs = []
    for lvl, (t, h, w) in enumerate(spatial_shapes):
        rt = (jnp.arange(t, dtype=jnp.float32) + 0.5)
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        gt, gy, gx = jnp.meshgrid(rt, ry, rx, indexing="ij")
        flat_t = gt.reshape(-1)[None] / (valid_ratios[:, None, lvl, 2] * t)
        flat_y = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        flat_x = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([flat_x, flat_y, flat_t], axis=-1))  # [B, thw, 3]
    ref = jnp.concatenate(refs, axis=1)                            # [B, S, 3]
    return ref[:, :, None] * valid_ratios[:, None]                 # [B, S, L, 3]


def get_valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """mask [B, T, H, W] (True=pad) -> [B, 3] valid fraction in (w, h, t)
    order, probing the first row/column like the reference
    (dab_transformer.py:228-237)."""
    t, h, w = mask.shape[1:]
    valid_t = jnp.sum(~mask[:, :, 0, 0], axis=1).astype(jnp.float32) / t
    valid_h = jnp.sum(~mask[:, 0, :, 0], axis=1).astype(jnp.float32) / h
    valid_w = jnp.sum(~mask[:, 0, 0, :], axis=1).astype(jnp.float32) / w
    return jnp.stack([valid_w, valid_h, valid_t], axis=-1)


class DeformableEncoder(nn.Module):
    """Stack of deformable encoder layers over flattened multi-level tokens."""

    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, src, spatial_shapes, valid_ratios, pos, padding_mask,
        deterministic: bool = True, last_layer_chunks=None,
    ):
        # last_layer_chunks: static row spans for the FINAL layer's queries
        # (see DeformableEncoderLayer.q_chunks) — the returned memory then
        # contains only those rows, concatenated in chunk order.  Layers
        # 1..N-1 stay full: their outputs feed the next layer's
        # unconstrained 3D sampling at every frame.
        reference_points = encoder_reference_points(spatial_shapes, valid_ratios)
        layer_cls = DeformableEncoderLayer
        if self.remat:
            layer_cls = nn.remat(
                DeformableEncoderLayer, static_argnums=(3, 5, 6)
            )
        out = src
        for i in range(self.num_layers):
            chunks = (
                last_layer_chunks if i == self.num_layers - 1 else None
            )
            out = layer_cls(
                self.d_model, self.d_ffn, self.n_levels, self.n_heads,
                self.n_points, self.dropout, self.dtype, name=f"layers_{i}",
            )(out, pos, reference_points, spatial_shapes, padding_mask,
              deterministic, chunks)
        return out
