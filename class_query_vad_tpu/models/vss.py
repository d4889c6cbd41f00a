"""SS2D / VSSBlock (VMamba / Mamba-YOLO blocks) — TPU-native.

Port of /root/reference/models/detr/VSS.py and common_utils_mbyolo.py:

* ``SS2D`` (VSS.py:6-191): 1x1 in-proj -> split (x, z) -> depthwise 3x3 ->
  GELU -> 4-direction CrossScan -> selective scan (ops.selective_scan) ->
  CrossMerge -> LayerNorm -> gate by GELU(z) -> 1x1 out-proj;
* ``CrossScan``/``CrossMerge`` (common_utils_mbyolo.py:54-96): row-major,
  column-major, and their reversals; merge sums the four directions after
  un-flipping/un-transposing;
* ``cross_selective_scan`` (:141-203): per-direction x_proj produces
  (dt, B, C); dt through dt_projs; As = -exp(A_logs); scan with
  delta_softplus and dt_projs_bias as delta_bias;
* ``LSBlock``/``RGBlock``/``VSSBlock`` (VSS.py:194-388) with post_norm and
  mlp_ratio=0 as used by the encoder (dab_transformer.py:607).

Layout: channels-last [B, H, W, C].  BatchNorm2d appears in proj_conv and
LSBlock; it is carried in inference form (FrozenBatchNorm, running stats
as frozen parameters) — exact for eval/converted weights.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.selective_scan_pallas import selective_scan_pallas as selective_scan
from .csn import FrozenBatchNorm


def cross_scan(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, D] -> [B, 4, D, L]: row-major, col-major, and reversals."""
    b, h, w, d = x.shape
    row = x.reshape(b, h * w, d).transpose(0, 2, 1)            # [B, D, L]
    col = x.transpose(0, 2, 1, 3).reshape(b, h * w, d).transpose(0, 2, 1)
    return jnp.stack(
        [row, col, row[:, :, ::-1], col[:, :, ::-1]], axis=1
    )


def cross_merge(ys: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, 4, D, L] -> [B, D, L] summing the four directions."""
    b, k, d, l = ys.shape
    fwd = ys[:, 0:2] + ys[:, 2:4][..., ::-1]
    col = fwd[:, 1].reshape(b, d, w, h).transpose(0, 1, 3, 2).reshape(b, d, l)
    return fwd[:, 0] + col


class SS2D(nn.Module):
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_rank_ratio: float = 2.0
    dt_rank: Optional[int] = None
    d_conv: int = 3
    conv_bias: bool = True
    bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_expand = int(self.ssm_ratio * self.d_model)
        d_inner = int(min(self.ssm_rank_ratio, self.ssm_ratio) * self.d_model)
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        n = self.d_state
        K = 4
        b, h, w, _ = x.shape

        xz = nn.Dense(2 * d_expand, use_bias=self.bias, dtype=self.dtype,
                      name="in_proj")(x)
        xx, z = jnp.split(xz, 2, axis=-1)
        z1 = nn.gelu(z, approximate=False)
        if self.d_conv > 1:
            xx = nn.Conv(
                d_expand, (self.d_conv, self.d_conv),
                padding=(self.d_conv - 1) // 2,
                feature_group_count=d_expand, use_bias=self.conv_bias,
                dtype=self.dtype, name="conv2d",
            )(xx)
        xx = nn.gelu(xx, approximate=False)

        low_rank = d_inner < d_expand
        if low_rank:
            xx = nn.Dense(d_inner, use_bias=False, dtype=self.dtype,
                          name="in_rank")(xx)

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.lecun_normal(),
            (K, dt_rank + 2 * n, d_inner),
        )
        dt_projs_weight = self.param(
            "dt_projs_weight", nn.initializers.normal(1.0),
            (K, d_inner, dt_rank),
        )
        dt_projs_bias = self.param(
            "dt_projs_bias", nn.initializers.normal(1.0), (K, d_inner)
        )
        A_logs = self.param(
            "A_logs", nn.initializers.zeros, (K * d_inner, n)
        )
        Ds = self.param("Ds", nn.initializers.ones, (K * d_inner,))

        xs = cross_scan(xx.astype(jnp.float32))               # [B, K, D, L]
        x_dbl = jnp.einsum("bkdl,kcd->bkcl", xs, x_proj_weight)
        dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=2)
        dts = jnp.einsum("bkrl,kdr->bkdl", dts, dt_projs_weight)

        L = h * w
        ys = selective_scan(
            xs.reshape(b, K * d_inner, L),
            dts.reshape(b, K * d_inner, L),
            -jnp.exp(A_logs.astype(jnp.float32)),
            Bs, Cs, Ds,
            delta_bias=dt_projs_bias.reshape(-1),
            delta_softplus=True,
        ).reshape(b, K, d_inner, L)

        y = cross_merge(ys, h, w).transpose(0, 2, 1)          # [B, L, D]
        y = nn.LayerNorm(dtype=self.dtype, name="out_norm")(y)
        y = y.reshape(b, h, w, d_inner)
        if low_rank:
            y = nn.Dense(d_expand, use_bias=False, dtype=self.dtype,
                         name="out_rank")(y)
        y = y * z1
        return nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                        name="out_proj")(y)


class LSBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1,
                    feature_group_count=self.features, dtype=self.dtype,
                    name="fc1")(x)
        y = FrozenBatchNorm(self.features, eps=1e-5, dtype=self.dtype,
                            name="norm")(y)
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="fc2")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="fc3")(y)
        return x + y


class RGBlock(nn.Module):
    features: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(2 * self.hidden / 3)
        xv = nn.Conv(hidden * 2, (1, 1), dtype=self.dtype, name="fc1")(x)
        y, v = jnp.split(xv, 2, axis=-1)
        y = nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden,
                    dtype=self.dtype, name="dwconv")(y) + y
        y = nn.gelu(y, approximate=False) * v
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="fc2")(y)


class VSSBlock(nn.Module):
    in_channels: int
    hidden_dim: int
    ssm_d_state: int = 16
    mlp_ratio: float = 4.0
    post_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # proj_conv: 1x1 + BN + SiLU
        y = nn.Conv(self.hidden_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name="proj_conv")(x)
        y = FrozenBatchNorm(self.hidden_dim, eps=1e-5, dtype=self.dtype,
                            name="proj_bn")(y)
        y = nn.silu(y)

        x1 = LSBlock(self.hidden_dim, self.dtype, name="lsblock")(y)
        op = SS2D(self.hidden_dim, d_state=self.ssm_d_state, dtype=self.dtype,
                  name="op")
        if self.post_norm:
            out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(
                y + op(x1, deterministic)
            )
        else:
            out = y + op(
                nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x1),
                deterministic,
            )
        if self.mlp_ratio > 0:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(out)
            out = out + RGBlock(
                self.hidden_dim, int(self.hidden_dim * self.mlp_ratio),
                self.dtype, name="mlp",
            )(h)
        return out
