"""VideoMAE-style ViT-B video backbone — TPU-native (flax.linen).

Functional parity with /root/reference/models/backbones/vit.py:13-105 and
vit_utils.py:66-191:

* 3D tubelet patch embed: Conv3d kernel=stride=(tubelet, patch, patch);
* fixed sinusoid positional table with online spatial BICUBIC
  re-interpolation (a=-0.75, vit_utils.py:378-392) when the token grid
  differs from the 14x14 pretrain grid;
* pre-norm blocks with joint space-time attention, fused qkv with the
  q/v-bias trick (k has no bias, vit_utils.py:78-98), LayerNorm eps 1e-6;
* output: final token map [B, t, h, w, C] (the reference replicates it x4
  as a pseudo-pyramid; we leave the replication to the FPN caller).

TPU-first design: channels-last layout throughout so the qkv/mlp matmuls hit
the MXU at [B*N, C] x [C, 3C] shapes; attention uses a single einsum chain
that XLA fuses; dtype policy = bf16 compute / f32 params (replacing torch
AMP fp16 autocast).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import DropPath
from .position_encoding import vit_sinusoid_table
from .resize import bicubic_resize_2d


class ViTAttention(nn.Module):
    """Joint space-time attention with fused qkv and q/v-only bias."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None):
        # x: [B, Nq, C] (queries); kv: [B, N, C] key/value tokens, or None
        # for plain self-attention.  The split path reuses the SAME fused
        # qkv_kernel param (column slices), so the param tree / checkpoint
        # layout is identical — it exists so the caller can restrict the
        # final block's QUERIES to the frames the FPN actually consumes
        # (centre-frame slice; see ViT.__call__ out_frame_range).
        b, nq, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (c, 3 * self.dim)
        )
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(v_bias), v_bias])
        else:
            bias = None

        if kv is None:
            n = nq
            qkv = jnp.dot(x.astype(self.dtype), qkv_kernel.astype(self.dtype))
            if bias is not None:
                qkv = qkv + bias.astype(self.dtype)
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        else:
            n = kv.shape[1]
            q = jnp.dot(x.astype(self.dtype),
                        qkv_kernel[:, : self.dim].astype(self.dtype))
            kvm = jnp.dot(kv.astype(self.dtype),
                          qkv_kernel[:, self.dim :].astype(self.dtype))
            if bias is not None:
                q = q + bias[: self.dim].astype(self.dtype)
                kvm = kvm + bias[self.dim :].astype(self.dtype)
            q = q.reshape(b, nq, self.num_heads, head_dim)
            kvm = kvm.reshape(b, n, 2, self.num_heads, head_dim)
            k, v = kvm[:, :, 0], kvm[:, :, 1]

        # Manual max-subtracted softmax keeping the score tensor in the
        # compute dtype (exp and the denominator accumulate in fp32).  In
        # fp32 mode this IS jax.nn.softmax; in bf16 mode it avoids
        # materializing the [H, N, N] scores a second time in fp32 —
        # measured 1.24 -> 1.02 ms/block on v5e at [1, 12, 2560, 64]
        # (a pallas flash kernel is faster per-op but its layout
        # transposes make it end-to-end neutral; see PERF.md).
        #
        # Batched (b > 1) clips need the heads axis MAJOR before the score
        # matmul: with [B, N, H, D] operands XLA lowers the batched einsum
        # to a dilated-convolution trick plus a full extra relayout of the
        # [B, H, N, N] scores (measured 1.51 ms/clip-layer at B=2 vs 1.06
        # at B=1 on v5e); pre-transposing to [B, H, N, D] gives clean
        # batched dots at 0.85/0.75 ms/clip-layer (B=2/8).  At b == 1 the
        # untransposed form fuses best — jit specializes per shape, so the
        # branch is static.
        if b == 1:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        else:
            q = (q * scale).transpose(0, 2, 1, 3)       # [B, H, N, D]
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        mx = jax.lax.stop_gradient(jnp.max(attn, axis=-1, keepdims=True))
        e = jnp.exp((attn - mx).astype(jnp.float32)).astype(self.dtype)
        s = e.astype(jnp.float32).sum(axis=-1, keepdims=True)
        # NOTE: normalizing AFTER the PV matmul ((e @ v) / s) looks like a
        # traffic win on paper but measured 12% SLOWER end-to-end (98.6 vs
        # 86.4 ms/batch at B=2): the canonical e/s form pattern-matches
        # XLA's fused softmax and fuses into the score tensor's producer,
        # so the "extra pass" never actually hits HBM.  Keep e/s.
        attn = e / s.astype(self.dtype)
        if b == 1:
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, nq, self.dim)
        else:
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(
                0, 2, 1, 3).reshape(b, nq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, q_rows=None):
        # q_rows=(start, stop): restrict this block's QUERIES (and therefore
        # its entire output) to token rows [start:stop); keys/values still
        # read every token.  Exact for the final block when downstream
        # consumers only use those rows — attention output rows are
        # independent given full k/v, and LN/MLP/residual are per-token.
        dp = DropPath(self.drop_path, name="drop_path")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn = ViTAttention(
            self.dim, self.num_heads, self.qkv_bias, self.dtype, name="attn"
        )
        if q_rows is None:
            y = attn(y)
        else:
            x = x[:, q_rows[0] : q_rows[1]]
            y = attn(y[:, q_rows[0] : q_rows[1]], kv=y)
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y, deterministic)


class ViT(nn.Module):
    """ViT backbone.  Input [B, T, H, W, 3] -> token map [B, t, h, w, C]."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 16
    tubelet_size: int = 2
    pretrain_img_size: int = 224
    num_frames: int = 16
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, out_frame_range=None):
        # out_frame_range=(f0, f1): return token frames [f0:f1) only.  All
        # blocks but the last run on the full token stream (joint space-
        # time attention mixes every frame into every key/value); the LAST
        # block restricts its queries to those frames — exact, because its
        # other rows have no downstream consumer — and the final LayerNorm
        # is per-token.  Used by the centre-frame FPN slice
        # (backbone.ViTBackboneFPN) to skip ~half of block 12 + final LN.
        b, T, H, W, _ = x.shape
        t = T // self.tubelet_size
        h, w = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.tubelet_size, self.patch_size, self.patch_size),
            strides=(self.tubelet_size, self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))                              # [B, t, h, w, C]

        # Fixed sinusoid table over the pretrain grid, spatially re-interpolated
        # online (bicubic, per frame) when the runtime grid differs.
        grid = self.pretrain_img_size // self.patch_size
        t0 = self.num_frames // self.tubelet_size
        table = vit_sinusoid_table(t0 * grid * grid, self.embed_dim)
        pos = table.reshape(t0, grid, grid, self.embed_dim)
        if (h, w) != (grid, grid):
            pos = bicubic_resize_2d(pos, (h, w))
        pos = jax.lax.stop_gradient(pos)

        x = x + pos.astype(self.dtype)[None]
        x = x.reshape(b, t * h * w, self.embed_dim)

        block = ViTBlock
        if self.remat:
            block = nn.remat(ViTBlock, static_argnums=(2, 3))
        # stochastic depth decay (vit_utils.py:234)
        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]
        q_rows = None
        n_frames = t
        if out_frame_range is not None:
            f0, f1 = out_frame_range
            q_rows = (f0 * h * w, f1 * h * w)   # token rows are t-major
            n_frames = f1 - f0
        for i in range(self.depth):
            x = block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.qkv_bias,
                dpr[i],
                self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic, q_rows if i == self.depth - 1 else None)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x.reshape(b, n_frames, h, w, self.embed_dim)


def build_vit(spec, dtype=jnp.float32, name=None, remat=False) -> ViT:
    """spec: ModelSpec.vit (ViTSpec).  Config mapping mirrors
    /root/reference/models/backbones/vit.py:19-70."""
    return ViT(
        name=name,
        embed_dim=spec.embed_dim,
        depth=spec.depth,
        num_heads=spec.num_heads,
        mlp_ratio=spec.mlp_ratio,
        qkv_bias=spec.qkv_bias,
        patch_size=spec.patch_size,
        tubelet_size=spec.tubelet_size,
        pretrain_img_size=spec.pretrain_img_size,
        num_frames=spec.num_frames,
        drop_path_rate=spec.drop_path_rate,
        dtype=dtype,
        remat=remat,
    )
