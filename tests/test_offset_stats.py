"""Pins the offset-window measurement code (utils/offset_stats.py):
native-pixel conversion must reproduce the deform-encoder's quirked
normalizer semantics, and the capture helper must see one offsets tensor
per encoder layer."""

import jax
import jax.numpy as jnp
import numpy as np

from class_query_vad_tpu.models.deform_encoder import DeformableEncoder
from class_query_vad_tpu.utils.offset_stats import (
    collect_sampling_offsets,
    native_pixel_offsets,
    window_fractions,
)


def test_native_pixel_conversion_matches_quirk():
    """A raw offset o at level (t, h, w) lands o/normalizer away in
    normalized coords (normalizer stacked (T, W, H) against (x, y, t));
    native pixels = normalized delta * (W, H, T)."""
    shapes = [(8, 64, 80), (4, 16, 20)]
    nh, np_ = 2, 3
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(5, nh * len(shapes) * np_ * 3)).astype(np.float32)

    px = native_pixel_offsets(raw, shapes, nh, np_)
    off = raw.reshape(5, nh, len(shapes), np_, 3)
    for l, (t, h, w) in enumerate(shapes):
        want_x = off[..., l, :, 0] / t * w
        want_y = off[..., l, :, 1] / w * h
        want_t = off[..., l, :, 2] / h * t
        np.testing.assert_allclose(px[..., l, :, 0], want_x, rtol=1e-6)
        np.testing.assert_allclose(px[..., l, :, 1], want_y, rtol=1e-6)
        np.testing.assert_allclose(px[..., l, :, 2], want_t, rtol=1e-6)


def test_weighted_fractions():
    from class_query_vad_tpu.utils.offset_stats import softmax_weights

    shapes = [(2, 4, 4)]
    nh, np_ = 2, 2
    # two taps per (head, level): one in-window with high weight, one far
    # out with low weight
    pixels = np.zeros((1, nh, 1, np_, 3), np.float32)
    pixels[..., 1, :2] = 5.0            # tap 1: 5px out
    logits = np.zeros((1, nh * 1 * np_), np.float32)
    logits[:, 1::np_] = -4.0            # tap 1 logit low in every head
    w = softmax_weights(logits, nh, 1, np_)
    np.testing.assert_allclose(w.sum(axis=(-1, -2)), 1.0, rtol=1e-6)

    rows = window_fractions(pixels, shapes, weights=w)
    # unweighted: half the taps are out; weighted: only softmax(-4) mass
    assert abs(rows[0]["frac_within_1"] - 0.5) < 1e-6
    expected_w = 1.0 / (1.0 + np.exp(-4.0))
    np.testing.assert_allclose(rows[0]["wfrac_within_1"], expected_w,
                               rtol=1e-5)


def test_collect_offsets_one_per_layer():
    shapes = ((2, 4, 4), (2, 2, 2))
    d, nh, np_, layers = 32, 4, 2, 3
    s = sum(t * h * w for t, h, w in shapes)
    enc = DeformableEncoder(num_layers=layers, d_model=d, d_ffn=64,
                            n_levels=2, n_heads=nh, n_points=np_,
                            dropout=0.0)
    flat = jnp.asarray(np.random.default_rng(0).normal(size=(1, s, d)),
                       jnp.float32)
    vr = jnp.ones((1, 2, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), flat, shapes, vr,
                      jnp.zeros_like(flat), None)
    _, raws = collect_sampling_offsets(
        enc, params, flat, shapes, vr, jnp.zeros_like(flat), None)
    assert len(raws) == layers
    assert all(r.shape == (1, s, nh * 2 * np_ * 3) for r in raws)

    # zero kernel init -> offsets == bias, identical for every query
    r0 = raws[0]
    np.testing.assert_allclose(r0[0, 0], r0[0, -1], rtol=1e-6)

    pixels = native_pixel_offsets(r0, shapes, nh, np_)
    rows = window_fractions(pixels, shapes)
    assert len(rows) == 2
    assert all(0.0 <= r["frac_within_1"] <= 1.0 for r in rows)
    assert rows[0]["frac_within_1"] <= rows[0]["frac_within_2"]
