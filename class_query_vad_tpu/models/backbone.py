"""Backbone wrapper + multi-scale FPN + positional encodings.

TPU-native equivalent of ``Backbone``/``Joiner``
(/root/reference/models/backbone_3d_builder.py:42-254):

* ViT path: the single-scale token map is expanded to a 4-level pyramid by
  ``lateral_convs`` at scales [4, 2, 1, 0.5] — ConvTranspose3d (1,2,2) ups /
  MaxPool3d (1,2,2) down, then 1x1 Conv3d (no bias) + channel-LayerNorm
  (eps 1e-6) + 3x3 Conv3d (no bias) (reference :139-180);
* CSN path: returns the raw layer1..4 pyramid; the per-level input
  projections (1x1 Conv3d + GroupNorm(32)) live in the DETR top module,
  mirroring the reference split (models/model.py:62-85);
* per-level pad mask = nearest-resize of the batch mask (reference :221-222)
  replicated over the level's temporal extent;
* per-level positional encodings = 3D sine over the level mask (Joiner,
  reference :233-242).

Layout: channels-last [B, T, H, W, C]; masks [B, T, H, W] bool (True=pad).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils.misc import interpolate_mask
from .common import ChannelLayerNorm
from .position_encoding import position_embedding_sine_3d
from .vit import ViT, build_vit

FPN_SCALES = (4.0, 2.0, 1.0, 0.5)


class LateralConv(nn.Module):
    """One FPN branch (reference backbone_3d_builder.py:139-180)."""

    scale: float
    in_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, H, W, C]
        if self.scale == 4.0:
            x = nn.ConvTranspose(
                self.in_dim // 2, kernel_size=(1, 2, 2), strides=(1, 2, 2),
                dtype=self.dtype, name="up1",
            )(x)
            x = ChannelLayerNorm(dtype=self.dtype, name="up1_norm")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.ConvTranspose(
                self.in_dim // 4, kernel_size=(1, 2, 2), strides=(1, 2, 2),
                dtype=self.dtype, name="up2",
            )(x)
        elif self.scale == 2.0:
            x = nn.ConvTranspose(
                self.in_dim // 2, kernel_size=(1, 2, 2), strides=(1, 2, 2),
                dtype=self.dtype, name="up1",
            )(x)
        elif self.scale == 0.5:
            x = nn.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))
        x = nn.Conv(
            self.out_dim, kernel_size=(1, 1, 1), use_bias=False,
            dtype=self.dtype, name="proj1",
        )(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="proj_norm")(x)
        x = nn.Conv(
            self.out_dim, kernel_size=(3, 3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="proj2",
        )(x)
        return x


def level_masks_and_poses(
    features: List[jnp.ndarray], mask: jnp.ndarray, d_model: int
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Per-level pad masks (nearest-resized, replicated over T_l) and 3D sine
    positional encodings, computed in float32."""
    masks, poses = [], []
    for x in features:
        t_l, h_l, w_l = x.shape[1:4]
        m = interpolate_mask(mask, (h_l, w_l))               # [B, h, w]
        m = jnp.broadcast_to(m[:, None], (m.shape[0], t_l, h_l, w_l))
        masks.append(m)
        poses.append(position_embedding_sine_3d(m, d_model))
    return masks, poses


class ViTBackboneFPN(nn.Module):
    """ViT body + 4-scale FPN.

    Returns (features, masks, poses): features[l] [B, T_l, H_l, W_l, D],
    masks[l] [B, T_l, H_l, W_l] (True = pad), poses[l] like features[l] —
    the srcs/masks/poses triplet the transformer consumes
    (/root/reference/models/model.py:151-157).
    """

    spec: object                      # ModelSpec
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels, mask, deterministic: bool = True):
        # pixels: [B, T, H, W, 3]; mask: [B, H, W] (True = padded)
        tokens = build_vit(
            self.spec.vit, dtype=self.dtype, name="body",
            remat=(self.spec.gradient_checkpointing
                   or self.spec.vit.use_checkpoint),
        )(pixels, deterministic)
        embed_dim = tokens.shape[-1]

        features = []
        for i, scale in enumerate(FPN_SCALES):
            features.append(
                LateralConv(
                    scale, embed_dim, self.d_model, self.dtype,
                    name=f"lateral_convs_{i}",
                )(tokens)
            )
        masks, poses = level_masks_and_poses(features, mask, self.d_model)
        return features, masks, poses
