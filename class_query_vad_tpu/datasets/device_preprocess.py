"""On-device (XLA) evaluation preprocessing graph.

BASELINE.json north star: "datasets/* frame sampling plus
video_transforms ... become a fused on-device XLA preprocessing graph".
This module moves the VAL pixel pipeline onto the device:

    uint8 native frames -> Pillow-BICUBIC short-side resize
                        -> ResizeCustom centre crop
                        -> /255, ImageNet normalize -> model dtype

* The resize is BIT-EXACT Pillow (``Image.resize`` default = BICUBIC,
  a = -0.5): per-axis fixed-point convolution with Pillow's 8.22
  coefficient quantization, int32 accumulation, and the clip8 rounding,
  horizontal-then-vertical with a uint8 intermediate — the same math as
  ``native/decode.cpp`` (which mirrors Pillow's Resample.c int path).
  Coefficients are precomputed on the host per (in_size, out_size) pair;
  on device each pass is a static gather + weighted sum — no matmul, so
  the int32 arithmetic that bit-exactness requires stays on the VPU.
* The crop/normalize stages replicate datasets/transforms.py
  (ResizeCustom :99-113, ToArray/Normalize :169-200) and
  datasets/ava.py's truncated ``_resized_dims`` math (:70-77, :111).
* Host work drops to JPEG decode + uint8 shipping: the device transfer
  shrinks 4x vs fp32 (and model-side normalize fuses into the backbone's
  first op under jit).

Box/target math stays on the host (tiny); reference pixel semantics:
/root/reference/datasets/ava_frame.py:116-141,
/root/reference/datasets/video_transforms.py:251-266,346-362.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import IMAGENET_MEAN, IMAGENET_STD

PRECISION_BITS = 32 - 8 - 2          # Pillow PRECISION_BITS (8.22 fixed point)


def _bicubic_filter(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def pil_axis_coeffs(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pillow bicubic coefficients for one axis: (idx [out, k] int32,
    coeff [out, k] int32).  Zero coefficients pad ragged tap counts, so the
    gather indices can clamp to 0 without affecting the sum."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    idx = np.zeros((out_size, ksize), np.int32)
    kk = np.zeros((out_size, ksize), np.int32)
    inv = 1.0 / filterscale
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        n = xmax - xmin
        w = _bicubic_filter((np.arange(n) + xmin - center + 0.5) * inv)
        tot = w.sum()
        if tot != 0.0:
            w = w / tot
        # C truncation toward zero of w * 2^22 +/- 0.5 (decode.cpp:81-83)
        q = np.trunc(
            np.where(w < 0, w * (1 << PRECISION_BITS) - 0.5,
                     w * (1 << PRECISION_BITS) + 0.5)
        ).astype(np.int32)
        idx[xx, :n] = np.arange(xmin, xmax)
        kk[xx, :n] = q
    return idx, kk


def _clip8(ss: jnp.ndarray) -> jnp.ndarray:
    hi = 1 << (PRECISION_BITS + 8)
    return jnp.where(
        ss >= hi, 255,
        jnp.where(ss <= 0, 0, jnp.right_shift(ss, PRECISION_BITS)),
    )


def _resample_axis(x: jnp.ndarray, in_size: int, out_size: int,
                   axis: int) -> jnp.ndarray:
    """One Pillow pass along ``axis``: int32 [..] -> int32 [..] with the
    axis length changed to out_size, values already clip8-rounded."""
    idx, kk = pil_axis_coeffs(in_size, out_size)
    axis = axis % x.ndim
    g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    g = jnp.reshape(
        g, x.shape[:axis] + (out_size, idx.shape[1]) + x.shape[axis + 1:]
    )
    shape = [1] * g.ndim
    shape[axis] = out_size
    shape[axis + 1] = idx.shape[1]
    w = jnp.asarray(kk).reshape(shape)
    ss = (g * w).sum(axis=axis + 1) + (1 << (PRECISION_BITS - 1))
    return _clip8(ss)


def pil_resize_bicubic(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Pillow-bit-exact BICUBIC resize of uint8 [..., H, W, C] to
    [..., h, w, C] uint8 (horizontal pass then vertical, like Pillow)."""
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    y = x.astype(jnp.int32)
    if ow != W:
        y = _resample_axis(y, W, ow, axis=-2)
    if oh != H:
        y = _resample_axis(y, H, oh, axis=-3)
    return y.astype(jnp.uint8)


def resized_dims(size: int, ow: int, oh: int) -> Tuple[int, int]:
    """datasets/ava.py:70-77,111 — short side to ``size``, aspect kept,
    both dims int-truncated."""
    if oh <= ow:
        nh, nw = size, size * (ow / oh)
    else:
        nw, nh = size, size * (oh / ow)
    return int(nw), int(nh)


def center_crop_box(size: int, w: int, h: int) -> Tuple[int, int, int, int]:
    """transforms.ResizeCustom:99-113 — (top, left, ch, cw)."""
    if w < h:
        cw = size
        ch = int(size * (h / w))
    else:
        ch = size
        cw = int(size * (w / h))
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return top, left, ch, cw


def make_eval_preprocess(img_size: int, in_hw: Tuple[int, int],
                         dtype=jnp.float32):
    """Build the jittable val pixel graph for native frames of shape
    ``in_hw``.  Returns (fn, out_hw): fn maps uint8 [..., H0, W0, 3] ->
    ``dtype`` [..., h2, w2, 3] (resize -> centre crop -> /255 ->
    ImageNet normalize), exactly the host path's pixels."""
    H0, W0 = in_hw
    nw, nh = resized_dims(img_size, W0, H0)
    top, left, ch, cw = center_crop_box(img_size, nw, nh)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def fn(frames_u8: jnp.ndarray) -> jnp.ndarray:
        x = pil_resize_bicubic(frames_u8, (nh, nw))
        x = jax.lax.slice_in_dim(x, top, top + ch, axis=-3)
        x = jax.lax.slice_in_dim(x, left, left + cw, axis=-2)
        x = x.astype(jnp.float32) / 255.0
        return ((x - mean) / std).astype(dtype)

    return fn, (ch, cw)
