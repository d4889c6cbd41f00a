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


# ---------------------------------------------------------------------------
# TRAIN augmentation graph (round-4 verdict item 7)
#
# The reference's clip-consistent train transforms
# (/root/reference/datasets/video_transforms.py: RandomHorizontalFlip :68-83,
# RandomSizeCrop_Custom :222-249, ColorJitter :376-407, PCAJitter :162-200,
# ToTensor+Normalize :332-362) become one jittable pixel graph over the
# decoded uint8 clip.  The RANDOM DRAWS happen on the host
# (draw_train_params, same np.random.Generator call order as the PIL
# Compose, so a per-clip seed reproduces the host path bit-for-bit), the
# box math stays on the host (train_target_transform), and the device
# applies flip -> crop -> HSV jitter -> PCA lighting -> /255 -> normalize.
#
# Parity: flip/crop/normalize are EXACT (integer slice / arithmetic).  The
# HSV stage reproduces OpenCV's 8-bit fixed-point RGB2HSV (hsv_shift=12
# division tables, rounded shifts) and its float HSV2RGB with
# round-to-nearest-even saturation; residual deviations vs cv2 are <=1 LSB
# on a few pixels (cv2's SIMD float path rounds intermediate products
# slightly differently) — pinned by tests/test_device_preprocess.py.  The
# PCA stage reproduces the reference's uint8 WRAPPING add (numpy unsafe
# float->uint8 cast: trunc toward zero, modulo 256) including the
# channel-reversal quirk (rgb[2 - idx]).
# ---------------------------------------------------------------------------

_HSV_SHIFT = 12


@functools.lru_cache(maxsize=1)
def _hsv_tables() -> Tuple[np.ndarray, np.ndarray]:
    i = np.arange(1, 256, dtype=np.float64)
    sdiv = np.concatenate(
        [[0], np.rint((255 << _HSV_SHIFT) / i)]
    ).astype(np.int32)
    hdiv = np.concatenate(
        [[0], np.rint((180 << _HSV_SHIFT) / (6.0 * i))]
    ).astype(np.int32)
    return sdiv, hdiv


def rgb_to_hsv_u8(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV COLOR_RGB2HSV for uint8 ([..., 3] -> [..., 3] int32 with
    H in [0, 180), S/V in [0, 255]); fixed-point tables + rounded shifts
    exactly as imgproc/color_hsv (RGB2HSV_b)."""
    sdiv_t, hdiv_t = _hsv_tables()
    r = x[..., 0].astype(jnp.int32)
    g = x[..., 1].astype(jnp.int32)
    b = x[..., 2].astype(jnp.int32)
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    half = 1 << (_HSV_SHIFT - 1)
    s = jnp.right_shift(
        diff * jnp.take(jnp.asarray(sdiv_t), v) + half, _HSV_SHIFT
    )
    h_num = jnp.where(
        v == r, g - b,
        jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff),
    )
    h = jnp.right_shift(
        h_num * jnp.take(jnp.asarray(hdiv_t), diff) + half, _HSV_SHIFT
    )
    h = h + jnp.where(h < 0, 180, 0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """OpenCV COLOR_HSV2RGB for uint8 (int32 [..., 3] H<180 -> uint8 RGB):
    the float sector formula with saturate_cast rounding (HSV2RGB_b)."""
    h = hsv[..., 0].astype(jnp.float32) * jnp.float32(6.0 / 180.0)
    s = hsv[..., 1].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    v = hsv[..., 2].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    sector = jnp.floor(h)
    f = h - sector
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    sec = jnp.clip(sector.astype(jnp.int32), 0, 5)
    # per-sector (r, g, b) selection
    r = jnp.select(
        [sec == 0, sec == 1, sec == 2, sec == 3, sec == 4], [v, q, p, p, t], v
    )
    g = jnp.select(
        [sec == 0, sec == 1, sec == 2, sec == 3, sec == 4], [t, v, v, q, p], p
    )
    b = jnp.select(
        [sec == 0, sec == 1, sec == 2, sec == 3, sec == 4], [p, p, t, v, v], q
    )
    rgb = jnp.stack([r, g, b], axis=-1) * 255.0
    return jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8)


def random_crop_dims(img_size: int, in_hw: Tuple[int, int]) -> Tuple[int, int]:
    """RandomSizeCrop_Custom's (static) crop height/width for a decoded
    frame of ``in_hw`` (video_transforms.py:222-249 / transforms.py:82-96)."""
    H0, W0 = in_hw
    if W0 < H0:
        w = W0 if W0 < img_size else img_size
        h = int(w * (H0 / W0))
    else:
        h = H0 if H0 < img_size else img_size
        w = int(h * (W0 / H0))
    return h, w


def draw_train_params(rng: np.random.Generator, img_size: int,
                      in_hw: Tuple[int, int], sat_shift: float,
                      val_shift: float, alphastd: float,
                      eigval: np.ndarray, eigvec: np.ndarray,
                      hue_shift: float = 20.0) -> dict:
    """Draw the per-clip augmentation parameters with the SAME generator
    call order as the host Compose (flip, crop x1/y1, hue/sat/val, pca
    alpha), so a shared per-clip seed makes host and device paths agree."""
    H0, W0 = in_hw
    flip = bool(rng.random() < 0.5)
    ch, cw = random_crop_dims(img_size, in_hw)
    x1 = int(rng.integers(0, W0 - cw + 1))
    y1 = int(rng.integers(0, H0 - ch + 1))
    hue_bound = int(round(hue_shift / 2))
    sat_bound = int(round(sat_shift * 255))
    val_bound = int(round(val_shift * 255))
    hue_s = int(rng.integers(-hue_bound, hue_bound + 1))
    sat_s = int(rng.integers(-sat_bound, sat_bound + 1))
    val_s = int(rng.integers(-val_bound, val_bound + 1))
    alpha = rng.normal(0, alphastd, size=(1, 3))
    rgb = np.sum(
        np.asarray(eigvec, np.float32) * np.repeat(alpha, 3, axis=0)
        * np.repeat(np.asarray(eigval, np.float32).reshape(1, 3), 3, axis=0),
        axis=1,
    )
    return {
        "flip": np.asarray(flip),
        "crop_yx": np.asarray([y1, x1], np.int32),
        "hsv_shift": np.asarray([hue_s, sat_s, val_s], np.int32),
        "pca_rgb": np.asarray(rgb, np.float32),
    }


def train_target_transform(target: dict, img_size: int,
                           in_hw: Tuple[int, int], params: dict) -> dict:
    """Apply the flip + crop BOX math of transforms.hflip/crop to a target
    dict without touching pixels (the device graph does those).  Same
    order as the Compose: flip first, then crop.  The Normalize stage's
    xyxy -> normalized-cxcywh conversion is left to the caller (it needs
    the final padded canvas size, like the host pipeline)."""
    H0, W0 = in_hw
    target = dict(target)
    if bool(params["flip"]) and "boxes" in target and len(target["boxes"]):
        b = target["boxes"][:, 1:]
        b = b[:, [2, 1, 0, 3]] * np.array([-1, 1, -1, 1]) + np.array(
            [W0, 0, W0, 0]
        )
        target["boxes"] = np.concatenate([target["boxes"][:, :1], b], axis=1)
        target["raw_boxes"] = np.concatenate(
            [target["raw_boxes"][:, :1], target["boxes"]], axis=1
        )
    ch, cw = random_crop_dims(img_size, in_hw)
    y1, x1 = (int(v) for v in params["crop_yx"])
    target["size"] = np.array([ch, cw])
    if "boxes" in target and len(target["boxes"]):
        boxes = target["boxes"][:, 1:].astype(np.float32)
        boxes = boxes - np.array([x1, y1, x1, y1], np.float32)
        boxes = np.minimum(
            boxes.reshape(-1, 2, 2), np.array([cw, ch], np.float32)
        ).clip(min=0)
        target["boxes"] = np.concatenate(
            [target["boxes"][:, :1], boxes.reshape(-1, 4)], axis=1
        )
        target["raw_boxes"] = np.concatenate(
            [target["raw_boxes"][:, :1], target["boxes"]], axis=1
        )
    return target


def make_train_preprocess(img_size: int, in_hw: Tuple[int, int],
                          dtype=jnp.float32):
    """Build the jittable TRAIN pixel graph for decoded uint8 frames of
    shape ``in_hw``.  Returns (fn, out_hw): fn(frames_u8 [..., H0, W0, 3],
    params) -> ``dtype`` [..., ch, cw, 3] where params is the dict from
    draw_train_params (arrays, so one compiled graph serves every clip of
    this shape)."""
    H0, W0 = in_hw
    ch, cw = random_crop_dims(img_size, in_hw)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def fn(frames_u8: jnp.ndarray, params: dict) -> jnp.ndarray:
        x = frames_u8
        x = jnp.where(params["flip"], x[..., ::-1, :], x)
        y1 = params["crop_yx"][0]
        x1 = params["crop_yx"][1]
        # dynamic position, static size — XLA dynamic_slice
        x = jax.lax.dynamic_slice_in_dim(x, y1, ch, axis=-3)
        x = jax.lax.dynamic_slice_in_dim(x, x1, cw, axis=-2)
        # HSV jitter (ColorJitter): int shifts in cv2's uint8 HSV space
        hsv = rgb_to_hsv_u8(x)
        h = jnp.mod(hsv[..., 0] + params["hsv_shift"][0] + 180, 180)
        s = jnp.clip(hsv[..., 1] + params["hsv_shift"][1], 0, 255)
        v = jnp.clip(hsv[..., 2] + params["hsv_shift"][2], 0, 255)
        x = hsv_to_rgb_u8(jnp.stack([h, s, v], axis=-1))
        # PCA lighting: float add, numpy unsafe float->uint8 cast (trunc
        # toward zero + wrap) and the reference's rgb[2 - idx] reversal
        shift = params["pca_rgb"][::-1]            # channel idx reads 2-idx
        vf = x.astype(jnp.float32) + shift
        x = jnp.mod(jnp.trunc(vf).astype(jnp.int32), 256).astype(jnp.uint8)
        x = x.astype(jnp.float32) / 255.0
        return ((x - mean) / std).astype(dtype)

    return fn, (ch, cw)


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
