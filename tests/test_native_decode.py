"""Native decode core: bit-exactness vs Pillow (decode + BICUBIC resize).

The datasets resize with PIL's default BICUBIC at decode time
(ava_frame.py:194); the native C++ path must be indistinguishable.
"""

import os

import numpy as np
import pytest
from PIL import Image

from class_query_vad_tpu.datasets.native_decode import (
    available,
    decode_batch,
    decode_resize,
    resize,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native decode lib unavailable"
)


@pytest.mark.parametrize(
    "ih,iw,oh,ow",
    [(60, 80, 64, 85), (256, 340, 256, 320), (120, 90, 64, 48),
     (30, 40, 90, 120), (100, 100, 100, 100)],
)
def test_resize_bit_exact(rng, ih, iw, oh, ow):
    img = rng.integers(0, 255, (ih, iw, 3), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(np.asarray(img)).resize((ow, oh)))
    nat = resize(np.asarray(img), ow, oh)
    assert np.array_equal(pil, nat)


@pytest.mark.parametrize("ext", ["jpg", "png"])
def test_decode_resize_matches_pil(tmp_path, rng, ext):
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    p = str(tmp_path / f"img.{ext}")
    Image.fromarray(np.asarray(img)).save(p, quality=92)
    pil = np.asarray(Image.open(p).resize((85, 64)))
    nat = decode_resize(p, 85, 64)
    assert np.array_equal(pil, nat)


def test_decode_batch(tmp_path, rng):
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(np.asarray(img)).save(p, quality=95)
        paths.append(p)
    out = decode_batch(paths, 40, 32, n_threads=3)
    assert out.shape == (6, 32, 40, 3)
    for i, p in enumerate(paths):
        pil = np.asarray(Image.open(p).resize((40, 32)))
        assert np.array_equal(out[i], pil)


def test_decode_missing_file_fails():
    assert decode_resize("/nonexistent/file.jpg", 8, 8) is None
