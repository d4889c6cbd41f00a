"""Core tensor utilities.

TPU-native replacements for the reference ``utils/misc.py``:

* ``PaddedClip`` replaces ``NestedTensor`` (/root/reference/utils/misc.py:375)
  — a pytree of a fixed-shape pixel array plus a boolean pad mask.  XLA needs
  static shapes, so batches are padded to a canonical resolution up front and
  the mask threads through every level exactly like the reference mask does.
* ``inverse_sigmoid`` matches /root/reference/utils/misc.py:530-534.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PaddedClip(NamedTuple):
    """A batch of video clips with a spatial padding mask.

    pixels: [B, T, H, W, C] float — channels-last (TPU-friendly layout; the
        reference uses [B, C, T, H, W]).
    mask:   [B, H, W] bool — True on padded pixels (same convention as the
        reference NestedTensor mask).
    """

    pixels: jnp.ndarray
    mask: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.pixels.shape[0]

    @property
    def temporal(self) -> int:
        return self.pixels.shape[1]


def pad_clips_to_shape(
    clips: list[np.ndarray], height: int, width: int
) -> PaddedClip:
    """Pack per-sample [T, h, w, C] arrays into one padded batch.

    Equivalent to nested_tensor_from_tensor_list
    (/root/reference/utils/misc.py:338-372) but with a *fixed* target (H, W)
    so compiled shapes never vary across steps.
    """
    bsz = len(clips)
    t, c = clips[0].shape[0], clips[0].shape[-1]
    pixels = np.zeros((bsz, t, height, width, c), dtype=np.float32)
    mask = np.ones((bsz, height, width), dtype=bool)
    for i, clip in enumerate(clips):
        th, tw = clip.shape[1], clip.shape[2]
        if th > height or tw > width:
            raise ValueError(
                f"clip spatial size ({th},{tw}) exceeds canvas ({height},{width})"
            )
        pixels[i, :, :th, :tw] = clip
        mask[i, :th, :tw] = False
    return PaddedClip(jnp.asarray(pixels), jnp.asarray(mask))


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1.0 - x, min=eps)
    return jnp.log(x1 / x2)


def interpolate_mask(mask: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize a [B, H, W] bool mask to [B, h, w].

    Matches F.interpolate(mask[None].float(), size=...).bool()
    (/root/reference/models/backbone_3d_builder.py:221): torch's default
    'nearest' picks src_idx = floor(dst_idx * scale).
    """
    b, h, w = mask.shape
    oh, ow = out_hw
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]


def tree_size_mb(tree: Any) -> float:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(l.size * l.dtype.itemsize for l in leaves) / 1e6


def param_count(tree: Any) -> int:
    return sum(l.size for l in jax.tree_util.tree_leaves(tree))


def accuracy_sigmoid(output, target) -> float:
    """Exact-set multilabel accuracy: % of rows where the top-k predictions
    (k = number of positives) equal the positive label set (reference
    utils/misc.py:467-489).  numpy in / float out."""
    import numpy as np

    output = np.asarray(output)
    target = np.asarray(target)
    if target.size == 0:
        return 0.0
    hits = 0
    for n in range(target.shape[0]):
        labels = np.nonzero(target[n])[0]
        if len(labels) == 0:
            continue
        pred = np.argsort(-output[n])[: len(labels)]
        if set(labels.tolist()) == set(pred.tolist()):
            hits += 1
    return hits * (100.0 / target.shape[0])
