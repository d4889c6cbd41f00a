"""Shared model building blocks (flax.linen)."""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """ReLU MLP head, matching the reference MLP
    (/root/reference/models/detr/criterion.py:847-859)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def get_activation(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "glu": nn.glu,
        "selu": nn.selu,
    }[name]


def sine_embed_for_position(pos: jnp.ndarray, d_half: int = 128) -> jnp.ndarray:
    """DAB-DETR anchor sine embedding.

    pos: [..., 2 or 4] normalized (x, y[, w, h]).  Returns [..., d_half*2] for
    2-dim inputs / [..., d_half*4] for 4-dim, ordered (y, x[, w, h]) —
    reference: /root/reference/models/detr/dab_transformer.py:50-76.
    """
    scale = 2.0 * math.pi
    dim_t = jnp.arange(d_half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / d_half)

    def embed(coord):
        p = coord[..., None] * scale / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*coord.shape, d_half)

    pos_x = embed(pos[..., 0])
    pos_y = embed(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    pos_w = embed(pos[..., 2])
    pos_h = embed(pos[..., 3])
    return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis for [..., C] inputs with eps=1e-6,
    matching the reference channel-wise variant
    (/root/reference/models/backbone_3d_builder.py:20-40).  Our layout is
    channels-last so this is a plain LayerNorm with the ConvNeXt epsilon."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)
