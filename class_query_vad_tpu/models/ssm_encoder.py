"""SSM / VSS transformer encoders (Mamba path).

Port of ``MambaEncoderLayer`` / ``VSSMambaEncoderLayer`` / ``GeneralEncoder``
(/root/reference/models/detr/dab_transformer.py:400-423,528-669):

* each layer compresses d_model -> d_model/2 (separately for features and
  positional encodings), then runs a BIDIRECTIONAL per-frame recurrence
  over T: frame t's input is LayerNorm(src[t] + out[t-1]) (plain src[t] at
  the boundary), the spatial block is a Mamba sequence scan ('ssm') or a
  VSSBlock 2D cross-scan ('vssm'), and the per-frame outputs replace the
  sequence; the reference's python loop (:569-581) becomes one
  ``jax.lax.scan`` per direction;
* intermediate layers emit f_src + b_src over all frames; the LAST layer
  (return_key) emits only frame key_idx = -1 plus that frame's original
  positional encoding (:584-597);
* decompress + post-norm FFN close each layer.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mamba_block import Mamba
from .vss import VSSBlock


class _RecurrentStep(nn.Module):
    """One frame of the time recurrence (reference loop body,
    dab_transformer.py:569-581): x_in = src[t] at the boundary else
    LayerNorm(src[t] + previous output); spatial SSM block on x_in + pos."""

    d_half: int
    kind: str                      # 'ssm' | 'vssm'
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.kind == "ssm":
            self.block = Mamba(
                self.d_half, d_state=4, d_conv=2, expand=1, dt_rank=4,
                dtype=self.dtype, name="ssm",
            )
        else:
            self.block = VSSBlock(
                self.d_half, self.d_half, ssm_d_state=4, mlp_ratio=0.0,
                post_norm=True, dtype=self.dtype, name="ssm",
            )
        self.ssm_norm = nn.LayerNorm(dtype=self.dtype, name="ssm_norm")

    def __call__(self, carry, inp):
        x_t, pos_t, is_first = inp
        x_in = jnp.where(is_first, x_t, self.ssm_norm(x_t + carry))
        if self.kind == "ssm":
            b, h, w, c = x_in.shape
            out = self.block((x_in + pos_t).reshape(b, h * w, c))
            out = out.reshape(b, h, w, c)
        else:
            out = self.block(x_in + pos_t)
        return out, out


class _TimeRecurrentSpatial(nn.Module):
    """Bidirectional frame recurrence wrapping a spatial block.

    src, pos: [B, T, H, W, C].  Returns (f_src, b_src) like-shaped.  Both
    directions share one set of block parameters (the reference reuses
    self.ssm for f/b), realized by calling the same nn.scan-lifted module
    instance twice.
    """

    d_half: int
    kind: str
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        scan_cls = nn.scan(
            _RecurrentStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )
        self.step = scan_cls(self.d_half, self.kind, self.dtype, name="step")

    def _run(self, src, pos):
        t = src.shape[1]
        xs = (
            jnp.moveaxis(src, 1, 0),
            jnp.moveaxis(pos, 1, 0),
            (jnp.arange(t) == 0).reshape(t, 1, 1, 1, 1),
        )
        init = jnp.zeros_like(src[:, 0])
        _, outs = self.step(init, xs)
        return jnp.moveaxis(outs, 0, 1)            # [B, T, H, W, C]

    def __call__(self, src, pos):
        f_src = self._run(src, pos)
        b_src = self._run(src[:, ::-1], pos[:, ::-1])[:, ::-1]
        return f_src, b_src


class SSMEncoderLayer(nn.Module):
    """One encoder layer (Mamba or VSS variant)."""

    d_model: int = 256
    d_ffn: int = 2048
    kind: str = "vssm"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, orig_pos, shape: Tuple[int, int, int],
                 return_key: bool = False, key_idx: int = -1,
                 deterministic: bool = True):
        # src, orig_pos: [B, S=T*H*W, C]
        t, h, w = shape
        b = src.shape[0]
        d_half = self.d_model // 2

        x = nn.Dense(d_half, dtype=self.dtype, name="compress")(src)
        pos = nn.Dense(d_half, dtype=self.dtype, name="pos_compress")(orig_pos)
        x = x.reshape(b, t, h, w, d_half)
        pos = pos.reshape(b, t, h, w, d_half)

        f_src, b_src = _TimeRecurrentSpatial(
            d_half, self.kind, self.dtype, name="recurrent"
        )(x, pos)

        if return_key:
            out = (f_src[:, key_idx] + b_src[:, key_idx]).reshape(b, h * w, d_half)
            key_pos = orig_pos.reshape(b, t, h * w, -1)[:, key_idx]
        else:
            out = (f_src + b_src).reshape(b, t * h * w, d_half)
            key_pos = None

        out = nn.Dense(self.d_model, dtype=self.dtype, name="decompress")(out)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(out)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        out = nn.LayerNorm(dtype=self.dtype, name="norm2")(out + y)
        if return_key:
            return out, key_pos
        return out


class SSMEncoder(nn.Module):
    """GeneralEncoder (dab_transformer.py:400-423): N layers, the last one
    collapses to the key frame and returns (memory, key_pos)."""

    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 2048
    kind: str = "vssm"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # gradient-checkpoint each layer (reference checkpoints encoder layers
    # under CONFIG.GRADIENT_CHECKPOINTING, dab_transformer.py:468-478)
    remat: bool = False

    @nn.compact
    def __call__(self, src, pos, shape, deterministic: bool = True):
        layer_cls = SSMEncoderLayer
        if self.remat:
            # static: shape(3), return_key(4), key_idx(5), deterministic(6)
            layer_cls = nn.remat(SSMEncoderLayer, static_argnums=(3, 4, 5, 6))
        out = src
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            res = layer_cls(
                self.d_model, self.d_ffn, self.kind, self.dropout,
                self.dtype, name=f"layers_{i}",
            )(out, pos, shape, last, -1, deterministic)
            out = res[0] if last else res
        return out, res[1]
