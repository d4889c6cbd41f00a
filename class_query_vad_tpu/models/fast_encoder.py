"""Fast deformable encoder — gather-free windowed multi-scale attention.

A TPU-first alternative to :class:`.deform_encoder.DeformableEncoder`
(selected with ``CONFIG.MODEL.ENCODER_TYPE = 'fast_attention'``).  It keeps
the reference encoder's macro-structure — per-token multi-scale deformable
self-attention + FFN with post-norm residuals, matching the layer layout of
/root/reference/models/detr/dab_transformer.py:484-523 — but replaces the
unconstrained sampler with :mod:`..ops.fast_deform`'s window-clamped blend:
offsets are ``radius * tanh(head(q))`` pixels on the query's own grid, so
trilinear sampling reduces to (2R+1)^3 statically-shifted dense
multiply-adds instead of HBM gathers.  See PERF.md for the measured gap
this closes.

Differences from the exact path (intentional, documented):
* offsets are bounded to +-radius pixels of the query grid per layer
  (multi-scale levels + depth still give a global receptive field);
* cross-level values are pre-aligned to the query grid with power-of-two
  resampling rather than sampled at the native level resolution;
* no valid-ratio rescaling — padding is handled by zeroing padded values,
  identical in effect to the reference's zero-filled sampler corners.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_attn import directional_offset_init
from ..ops.fast_deform import align_level, windowed_blend_fused


class FastDeformAttn3D(nn.Module):
    """Windowed multi-scale deformable self-attention over level grids.

    Heads (value/offset/weight/output projections) are shared across query
    levels, like the reference MSDeformAttn's single set of projections over
    the flattened token stream (ms_deform_attn.py:117-163).
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    radius: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src_levels: Sequence[jnp.ndarray],   # per level [B, T, Hl, Wl, C]
        pos_levels: Sequence[jnp.ndarray],   # per level like src
        mask_levels: Sequence[jnp.ndarray] | None,  # [B, T, Hl, Wl] True=pad
    ) -> List[jnp.ndarray]:
        nh, nl, np_, r = self.n_heads, self.n_levels, self.n_points, self.radius
        head_dim = self.d_model // nh

        value_proj = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")
        offset_head = nn.Dense(
            nh * nl * np_ * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: directional_offset_init(nh, nl, np_),
            dtype=self.dtype,
            name="sampling_offsets",
        )
        weight_head = nn.Dense(
            nh * nl * np_,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )
        output_proj = nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")

        values = []
        for j, s in enumerate(src_levels):
            v = value_proj(s)
            if mask_levels is not None:
                v = jnp.where(mask_levels[j][..., None], 0.0, v)
            values.append(v.reshape(v.shape[:4] + (nh, head_dim)))

        outs = []
        for i, (s, p) in enumerate(zip(src_levels, pos_levels)):
            q = s + p
            b, t, h, w, _ = q.shape
            # elementwise ops run on flat [..., nh*L*P*{3,1}] lanes; the
            # logical reshapes happen after, so no lane-padded (.., 3) or
            # (.., P) tensor is ever materialized (see windowed_blend_fused)
            raw = r * jnp.tanh(offset_head(q))
            offsets = raw.reshape(b, t, h, w, nh, nl, np_, 3)
            logits = weight_head(q).reshape(b, t, h, w, nh, nl * np_)
            weights = jax.nn.softmax(logits, axis=-1).reshape(
                b, t, h, w, nh, nl, np_
            )
            aligned = [align_level(v, (h, w)) for v in values]
            out = windowed_blend_fused(aligned, offsets, weights, r)
            outs.append(output_proj(out.reshape(b, t, h, w, self.d_model)))
        return outs


class FastEncoderLayer(nn.Module):
    """Windowed deformable self-attn + FFN, post-norm (mirrors
    DeformableTransformerEncoderLayer, dab_transformer.py:484-523)."""

    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    radius: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, src_levels, pos_levels, mask_levels, deterministic: bool = True
    ):
        attn_outs = FastDeformAttn3D(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.radius, self.dtype, name="self_attn",
        )(src_levels, pos_levels, mask_levels)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        lin1 = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        drop2 = nn.Dropout(self.dropout, deterministic=deterministic)
        drop3 = nn.Dropout(self.dropout, deterministic=deterministic)

        outs = []
        for s, a in zip(src_levels, attn_outs):
            x = norm1(s + drop(a))
            y = lin2(drop2(nn.relu(lin1(x))))
            outs.append(norm2(x + drop3(y)))
        return outs


class FastDeformableEncoder(nn.Module):
    """Stack of windowed deformable layers over per-level grids."""

    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    radius: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        src_levels: Sequence[jnp.ndarray],
        pos_levels: Sequence[jnp.ndarray],
        mask_levels: Sequence[jnp.ndarray] | None,
        deterministic: bool = True,
    ) -> List[jnp.ndarray]:
        layer_cls = FastEncoderLayer
        if self.remat:
            layer_cls = nn.remat(FastEncoderLayer, static_argnums=(4,))
        out = list(src_levels)
        for i in range(self.num_layers):
            out = layer_cls(
                self.d_model, self.d_ffn, self.n_levels, self.n_heads,
                self.n_points, self.radius, self.dropout, self.dtype,
                name=f"layers_{i}",
            )(out, pos_levels, mask_levels, deterministic)
        return out
