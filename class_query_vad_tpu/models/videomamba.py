"""VideoMamba backbone — TPU-native.

The reference imports this backbone from the EXTERNAL (non-vendored)
``VideoMamba`` package (/root/reference/models/backbones/mamba.py:15-20);
only its integration surface is visible: constructor args (img_size,
kernel_size=1, num_frames — mamba.py:38-48), checkpoint keys (pos_embed
[1, 1+hw, C], temporal_pos_embedding [1, T, C], cls_token, patch_embed,
bidirectional mamba layers — :92-127), and the output contract consumed by
the FPN wrapper: a (token map [B, C, T, H, W], per-frame summary [B, T, C])
tuple (backbone_3d_builder.py:208-211).

Structure follows the published VideoMamba-S/M (OpenGVLab) design:

* per-frame 16x16 patch embed (Conv3d kernel (1, 16, 16));
* cls token + spatial pos embed + per-frame temporal pos embed, tokens
  ordered (t, hw) with the single cls token prepended;
* N residual blocks: LayerNorm -> bidirectional Mamba (shared in/out
  projections, separate conv/x_proj/dt_proj/A/D per direction, per-direction
  z-gating, backward branch on the flipped sequence);
* final LayerNorm.

The per-frame summary is the mean over each frame's spatial tokens (the
external package's modified forward is not observable; documented
assumption).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.selective_scan_pallas import selective_scan_pallas as selective_scan
from .mamba_block import _dt_proj_init


class BiMamba(nn.Module):
    """Bidirectional Mamba mixer (Vim/VideoMamba 'v2' bimamba)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u):  # [B, L, D]
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        n = self.d_state
        b, l, _ = u.shape

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype,
                      name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)

        def branch(xs, suffix):
            h = nn.Conv(
                d_inner, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
                feature_group_count=d_inner, use_bias=True, dtype=self.dtype,
                name=f"conv1d{suffix}",
            )(xs)
            h = nn.silu(h)
            dbl = nn.Dense(dt_rank + 2 * n, use_bias=False, dtype=self.dtype,
                           name=f"x_proj{suffix}")(h)
            dt, B, C = jnp.split(dbl, [dt_rank, dt_rank + n], axis=-1)
            k_init, b_init = _dt_proj_init(dt_rank, d_inner)
            dt_kernel = self.param(
                f"dt_proj{suffix}_kernel", k_init, (dt_rank, d_inner)
            )
            dt_bias = self.param(f"dt_proj{suffix}_bias", b_init, (d_inner,))
            dt = jnp.einsum("blr,rd->bld", dt, dt_kernel)
            A_log = self.param(
                f"A{suffix}_log",
                lambda key, shape: jnp.log(
                    jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32),
                             (d_inner, 1))
                ),
                (d_inner, n),
            )
            D = self.param(f"D{suffix}", nn.initializers.ones, (d_inner,))
            y = selective_scan(
                h.transpose(0, 2, 1), dt.transpose(0, 2, 1),
                -jnp.exp(A_log.astype(jnp.float32)),
                B.transpose(0, 2, 1), C.transpose(0, 2, 1), D,
                delta_bias=dt_bias, delta_softplus=True,
            ).transpose(0, 2, 1)
            return y

        y_f = branch(x, "") * nn.silu(z)
        y_b = branch(x[:, ::-1], "_b") * nn.silu(z[:, ::-1])
        y = y_f + y_b[:, ::-1]
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="out_proj")(y)


class VideoMambaBlock(nn.Module):
    dim: int
    d_state: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x + BiMamba(self.dim, d_state=self.d_state, dtype=self.dtype,
                           name="mixer")(y)


class VideoMamba(nn.Module):
    embed_dim: int = 192          # tiny=192, small=384, middle=576
    depth: int = 24
    patch_size: int = 16
    num_frames: int = 16
    d_state: int = 16
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixels) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixels [B, T, H, W, 3] -> (map [B, T, h, w, C], frame summary
        [B, T, C])."""
        b, T, H, W, _ = pixels.shape
        x = nn.Conv(
            self.embed_dim, (1, self.patch_size, self.patch_size),
            strides=(1, self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(pixels.astype(self.dtype))                  # [B, T, h, w, C]
        t, h, w = x.shape[1:4]

        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + h * w, self.embed_dim),
        )
        temporal_pos = self.param(
            "temporal_pos_embedding", nn.initializers.normal(0.02),
            (1, self.num_frames, self.embed_dim),
        )
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )

        x = x.reshape(b, t, h * w, self.embed_dim)
        x = x + pos_embed[:, None, 1:]
        x = x + temporal_pos[:, :t, None]
        x = x.reshape(b, t * h * w, self.embed_dim)
        cls = jnp.broadcast_to(
            cls_token + pos_embed[:, :1], (b, 1, self.embed_dim)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        # Per-layer remat (CONFIG.GRADIENT_CHECKPOINTING): the backward of
        # each BiMamba layer re-derives the associative-scan recurrence and
        # its [B, L, KD, N]-scale temps; without remat the 24-32 layers'
        # saved activations blow past HBM at flagship shapes (measured:
        # 32.8 GB vs 15.75 on the first VSS train-step chip compile,
        # round 5).  The reference checkpoints its encoder layers the same
        # way (dab_transformer.py:468-478).
        block_cls = VideoMambaBlock
        if self.remat:
            block_cls = nn.remat(VideoMambaBlock)
        for i in range(self.depth):
            x = block_cls(
                self.embed_dim, self.d_state, self.dtype, name=f"layers_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_f")(x)

        tokens = x[:, 1:].reshape(b, t, h, w, self.embed_dim)
        frame_summary = tokens.mean(axis=(2, 3))      # [B, T, C]
        return tokens, frame_summary


VIDEOMAMBA_SPECS = {
    "videomamba_tiny": dict(embed_dim=192, depth=24),
    "videomamba_small": dict(embed_dim=384, depth=24),
    "videomamba_middle": dict(embed_dim=576, depth=32),
}


def build_videomamba(backbone_type: str, num_frames: int, dtype=jnp.float32,
                     name=None, remat: bool = False) -> VideoMamba:
    spec = VIDEOMAMBA_SPECS[backbone_type]
    return VideoMamba(num_frames=num_frames, dtype=dtype, name=name,
                      remat=remat, **spec)
