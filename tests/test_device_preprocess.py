"""On-device val preprocessing graph parity (round-3 verdict item 6).

The device graph must reproduce the host PIL pipeline exactly:
* ``pil_resize_bicubic`` is BIT-EXACT vs ``PIL.Image.resize`` (default
  BICUBIC) — same 8.22 fixed-point coefficients, int32 accumulation,
  clip8 rounding, horizontal-then-vertical pass order;
* the full eval graph (short-side resize -> ResizeCustom centre crop ->
  /255 -> ImageNet normalize) matches the dataset + val-transform host
  path pixel for pixel.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from class_query_vad_tpu.datasets.device_preprocess import (
    center_crop_box,
    make_eval_preprocess,
    pil_resize_bicubic,
    resized_dims,
)
from class_query_vad_tpu.datasets.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Normalize,
    ResizeCustom,
    ToArray,
)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((37, 53), (21, 33)),       # downscale, odd sizes
    ((64, 48), (256, 192)),     # upscale
    ((240, 320), (256, 341)),   # AVA-like short-side up
    ((360, 480), (256, 341)),   # AVA-like short-side down
    ((32, 32), (32, 32)),       # identity
    ((50, 70), (50, 35)),       # one axis only
])
def test_resize_bitexact_vs_pillow(in_hw, out_hw):
    rng = np.random.default_rng(hash(in_hw + out_hw) % 2**31)
    x = rng.integers(0, 256, size=in_hw + (3,), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(x).resize((out_hw[1], out_hw[0])))
    got = np.asarray(pil_resize_bicubic(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, ref)


def test_resize_batch_axes():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, size=(2, 4, 40, 60, 3), dtype=np.uint8)
    got = np.asarray(pil_resize_bicubic(jnp.asarray(x), (24, 36)))
    for b in range(2):
        for t in range(4):
            ref = np.asarray(Image.fromarray(x[b, t]).resize((36, 24)))
            np.testing.assert_array_equal(got[b, t], ref)


@pytest.mark.parametrize("native_hw", [(320, 400), (400, 320), (256, 341)])
def test_eval_graph_matches_host_path(native_hw):
    """Host path: per-frame PIL resize to the dataset's truncated dims
    (ava.py:70-77,139) -> ResizeCustom centre crop -> ToArray ->
    Normalize.  Device path: make_eval_preprocess on the raw frames."""
    img_size = 256
    T = 3
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(T,) + native_hw + (3,), dtype=np.uint8)

    # host
    nw, nh = resized_dims(img_size, native_hw[1], native_hw[0])
    imgs = [Image.fromarray(f).resize((nw, nh)) for f in frames]
    target = {"size": np.array([nh, nw])}
    imgs, target = ResizeCustom(img_size)(imgs, target)
    imgs, target = ToArray()(imgs, target)
    imgs, _ = Normalize()(imgs, target)
    host = np.stack(imgs)

    # device
    fn, out_hw = make_eval_preprocess(img_size, native_hw)
    dev = np.asarray(fn(jnp.asarray(frames)))
    assert dev.shape == (T,) + out_hw + (3,)
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-6)


def test_crop_math_matches_transforms():
    for (h, w) in [(256, 341), (341, 256), (256, 256), (256, 320)]:
        top, left, ch, cw = center_crop_box(256, w, h)
        imgs = [Image.new("RGB", (w, h))]
        _, target = ResizeCustom(256)(imgs, {"size": np.array([h, w])})
        assert (target["size"] == np.array([ch, cw])).all()


def test_normalize_constants():
    np.testing.assert_allclose(IMAGENET_MEAN, [0.485, 0.456, 0.406])
    np.testing.assert_allclose(IMAGENET_STD, [0.229, 0.224, 0.225])
