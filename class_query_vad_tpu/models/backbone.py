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
from .position_encoding import (
    position_embedding_sine_3d,
    position_embedding_sine_3d_frames,
)
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


def level_masks_and_poses_frames(
    features: List[jnp.ndarray], mask: jnp.ndarray, d_model: int,
    frames, t_total: int,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Per-level pad masks + sine poses when every level carries only the
    temporal ``frames`` (absolute indices) of a ``t_total``-frame pyramid.
    Bit-equal to slicing level_masks_and_poses' full-T output at
    ``frames`` (see position_embedding_sine_3d_frames)."""
    masks, poses = [], []
    f = len(list(frames))
    for x in features:
        h_l, w_l = x.shape[2:4]
        m2 = interpolate_mask(mask, (h_l, w_l))              # [B, h, w]
        masks.append(
            jnp.broadcast_to(m2[:, None], (m2.shape[0], f, h_l, w_l))
        )
        poses.append(
            position_embedding_sine_3d_frames(m2, frames, t_total, d_model)
        )
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
    def __call__(self, pixels, mask, deterministic: bool = True,
                 out_frames=None, dec_frame=None):
        # pixels: [B, T, H, W, 3]; mask: [B, H, W] (True = padded)
        #
        # out_frames: contiguous absolute token-frame indices — produce the
        # FPN pyramid ONLY at those frames (the centre-frame encoder slice
        # pushed into the backbone).  Exactness: the lateral branches'
        # temporal receptive field is the single 3x3x3 proj2 conv (the
        # ConvTranspose/MaxPool/1x1 stages are spatial-only), so FPN output
        # frame i needs token frames i-1..i+1; the ViT body computes that
        # halo range (last block query-sliced — vit.py) and proj2's interior
        # output frames are exact.  Edge frames that would read the zero
        # padding do so in the full computation too.
        # dec_frame: additionally return the ref level's (index -2) sine
        # pose at this absolute frame (the decoder's pos_common frame,
        # transformer._center_frame_decode).
        s = self.spec
        vit = build_vit(
            s.vit, dtype=self.dtype, name="body",
            remat=(s.gradient_checkpointing or s.vit.use_checkpoint),
        )
        if out_frames is None:
            tokens = vit(pixels, deterministic)
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

        of = tuple(sorted(set(out_frames)))
        assert of[-1] - of[0] == len(of) - 1, "out_frames must be contiguous"
        t_tokens = pixels.shape[1] // s.vit.tubelet_size
        v0 = max(of[0] - 1, 0)
        v1 = min(of[-1] + 2, t_tokens)
        tokens = vit(pixels, deterministic, out_frame_range=(v0, v1))
        embed_dim = tokens.shape[-1]
        lo, hi = of[0] - v0, of[-1] + 1 - v0
        features = []
        for i, scale in enumerate(FPN_SCALES):
            features.append(
                LateralConv(
                    scale, embed_dim, self.d_model, self.dtype,
                    name=f"lateral_convs_{i}",
                )(tokens)[:, lo:hi]
            )
        masks, poses = level_masks_and_poses_frames(
            features, mask, self.d_model, of, t_tokens
        )
        pos_dec = None
        if dec_frame is not None:
            ref = features[len(FPN_SCALES) - 2]
            m2 = interpolate_mask(mask, ref.shape[2:4])
            pos_dec = position_embedding_sine_3d_frames(
                m2, (dec_frame,), t_tokens, self.d_model
            )
        return features, masks, poses, pos_dec
