"""Mamba (S6) block — the external ``mamba_simple.Mamba`` dependency the
reference imports (/root/reference/models/detr/dab_transformer.py:526,
instantiated :535 with d_state=4, d_conv=2, expand=1, dt_rank=4,
bimamba=False), re-implemented TPU-native.

Math (mamba_ssm.modules.mamba_simple, unidirectional):
    xz = in_proj(u)                     # [B, L, 2*d_inner], no bias
    x, z = split(xz)
    x = silu(causal_conv1d(x))          # depthwise, kernel d_conv, left pad
    dt, B, C = split(x_proj(x))         # [R], [N], [N], no bias
    dt = dt @ dt_proj.weight^T          # bias folded into the scan
    y = selective_scan(x, dt, -exp(A_log), B, C, D,
                       delta_bias=dt_proj.bias, delta_softplus=True)
    out = out_proj(y * silu(z))         # no bias

The time recurrence runs in ops.selective_scan (fp32-carry associative
scan) rather than the reference's CUDA kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.selective_scan_pallas import selective_scan_pallas as selective_scan


def _dt_proj_init(dt_rank: int, d_inner: int, dt_min=0.001, dt_max=0.1,
                  dt_init_floor=1e-4):
    """mamba_simple's dt projection init (mirrored in VSS.py:101-127):
    kernel ~ U(-dt_rank^-0.5, dt_rank^-0.5); bias = softplus^-1(dt) with
    dt ~ LogUniform(dt_min, dt_max) clamped at dt_init_floor."""

    def kernel_init(key, shape, dtype=jnp.float32):
        std = shape[0] ** -0.5
        return jax.random.uniform(key, shape, dtype, -std, std)

    def bias_init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, dt_init_floor)
        return dt + jnp.log(-jnp.expm1(-dt))

    return kernel_init, bias_init


class Mamba(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    conv_bias: bool = True
    bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u):  # u: [B, L, D]
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        n = self.d_state
        b, l, _ = u.shape

        xz = nn.Dense(2 * d_inner, use_bias=self.bias, dtype=self.dtype,
                      name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv over L (left pad d_conv - 1)
        x = nn.Conv(
            d_inner, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
            feature_group_count=d_inner, use_bias=self.conv_bias,
            dtype=self.dtype, name="conv1d",
        )(x)
        x = nn.silu(x)

        x_dbl = nn.Dense(dt_rank + 2 * n, use_bias=False, dtype=self.dtype,
                         name="x_proj")(x)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=-1)
        k_init, b_init = _dt_proj_init(dt_rank, d_inner)
        dt_kernel = self.param("dt_proj_kernel", k_init, (dt_rank, d_inner))
        dt_bias = self.param("dt_proj_bias", b_init, (d_inner,))
        dt = jnp.einsum("blr,rd->bld", dt, dt_kernel)

        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.log(
                jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32), (d_inner, 1))
            ),
            (d_inner, n),
        )
        D = self.param("D", nn.initializers.ones, (d_inner,))

        y = selective_scan(
            x.transpose(0, 2, 1),                   # [B, D, L]
            dt.transpose(0, 2, 1),
            -jnp.exp(A_log.astype(jnp.float32)),
            B.transpose(0, 2, 1),                   # [B, N, L] (G = 1)
            C.transpose(0, 2, 1),
            D,
            delta_bias=dt_bias,
            delta_softplus=True,
        ).transpose(0, 2, 1)                        # [B, L, D]

        y = y * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                        name="out_proj")(y)
