"""Exact -> fast encoder transplant (utils/transplant.py).

Semantic-equivalence oracle: on a SINGLE CUBE level (t == h == w) the
reference's (T, W, H)-vs-(x, y, t) offset-normalizer quirk cancels (pixel
offsets pass through unchanged), the query grid IS the value grid (the fast
path's dyadic alignment is the identity), and the fast blend's hat weights
equal trilinear interpolation for in-window samples — so a transplanted
fast encoder must reproduce the exact encoder's output to tanh-linearization
accuracy when all offsets are small.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from class_query_vad_tpu.models.deform_encoder import DeformableEncoder
from class_query_vad_tpu.models.fast_encoder import FastDeformableEncoder
from class_query_vad_tpu.utils.transplant import exact_to_fast_encoder

D, NH, NP, NL, LAYERS = 32, 2, 2, 1, 2
SHAPE = (4, 4, 4)


def _build_pair(rng):
    t, h, w = SHAPE
    s = t * h * w
    exact = DeformableEncoder(
        num_layers=LAYERS, d_model=D, d_ffn=64, n_levels=NL, n_heads=NH,
        n_points=NP, dropout=0.0,
    )
    fast = FastDeformableEncoder(
        num_layers=LAYERS, d_model=D, d_ffn=64, n_levels=NL, n_heads=NH,
        n_points=NP, radius=2, window="3d", dropout=0.0, use_pallas=False,
    )
    src = jnp.asarray(rng.normal(size=(1, s, D)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, s, D)) * 0.1, jnp.float32)
    vr = jnp.ones((1, NL, 3), jnp.float32)
    p_exact = exact.init(
        jax.random.PRNGKey(0), src, (SHAPE,), vr, pos, None, True
    )

    # randomize the (zero-init) sampling heads so the lane permutation is
    # actually exercised, and keep offsets small so every sample stays
    # in-window and the tanh linearization is exact to float tolerance
    p_exact = jax.device_get(p_exact)
    for i in range(LAYERS):
        sa = p_exact["params"][f"layers_{i}"]["self_attn"]
        sa["sampling_offsets"]["kernel"] = (
            rng.normal(size=sa["sampling_offsets"]["kernel"].shape) * 0.01
        ).astype(np.float32)
        sa["sampling_offsets"]["bias"] = (
            np.asarray(sa["sampling_offsets"]["bias"]) * 0.05
        ).astype(np.float32)
        sa["attention_weights"]["kernel"] = (
            rng.normal(size=sa["attention_weights"]["kernel"].shape) * 0.05
        ).astype(np.float32)
        sa["attention_weights"]["bias"] = (
            rng.normal(size=sa["attention_weights"]["bias"].shape) * 0.1
        ).astype(np.float32)
    return exact, fast, p_exact, src, pos


def test_transplant_tree_structure(rng):
    exact, fast, p_exact, src, pos = _build_pair(rng)
    t, h, w = SHAPE
    fast_init = fast.init(
        jax.random.PRNGKey(1),
        [src.reshape(1, t, h, w, D)], [pos.reshape(1, t, h, w, D)], None, True,
    )
    converted = exact_to_fast_encoder(
        p_exact["params"], n_heads=NH, n_levels=NL, n_points=NP, radius=2,
        window="3d",
    )
    want = jax.tree_util.tree_structure(jax.device_get(fast_init["params"]))
    got = jax.tree_util.tree_structure(converted)
    assert want == got
    for (kw, lw), (kg, lg) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(fast_init["params"])),
        jax.tree_util.tree_leaves_with_path(converted),
    ):
        assert np.shape(lw) == np.shape(lg), kw


def test_transplant_semantic_equivalence(rng):
    exact, fast, p_exact, src, pos = _build_pair(rng)
    t, h, w = SHAPE
    vr = jnp.ones((1, NL, 3), jnp.float32)
    out_exact = exact.apply(p_exact, src, (SHAPE,), vr, pos, None, True)

    converted = exact_to_fast_encoder(
        p_exact["params"], n_heads=NH, n_levels=NL, n_points=NP, radius=2,
        window="3d",
    )
    out_fast = fast.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        [src.reshape(1, t, h, w, D)], [pos.reshape(1, t, h, w, D)], None, True,
    )[0].reshape(1, t * h * w, D)
    np.testing.assert_allclose(
        np.asarray(out_exact), np.asarray(out_fast), atol=2e-3, rtol=1e-3
    )


def test_transplant_2d_window_drops_temporal(rng):
    """2d transplant keeps only the (x, y) offset components and still
    produces the right lane count."""
    _, _, p_exact, _, _ = _build_pair(rng)
    converted = exact_to_fast_encoder(
        p_exact["params"], n_heads=NH, n_levels=NL, n_points=NP, radius=1,
        window="2d",
    )
    sa = converted["layers_0"]["self_attn"]
    assert sa["sampling_offsets_kernel"].shape == (D, NL * 2 * NH * NP)
    assert sa["attention_weights_kernel"].shape == (D, NL * NH * NP)


def test_transplant_native_multilevel_equivalence(rng):
    """cross_level='native' extends the equivalence beyond the cube case:
    the fast encoder samples every level at the exact sampler's
    align_corners=False-mapped position, so a transplanted exact encoder
    (offset head rescaled per level by native_level_scales) reproduces the
    exact output on a MULTI-LEVEL non-cube pyramid wherever offsets stay
    in-window.  Temporal offsets are zeroed (the 2d window has no t taps;
    the reference grid lands exactly on the query's own frame)."""
    from class_query_vad_tpu.utils.transplant import native_level_scales

    shapes = ((2, 8, 8), (2, 4, 4))
    nl = len(shapes)
    s_total = sum(t * h * w for t, h, w in shapes)
    exact = DeformableEncoder(
        num_layers=LAYERS, d_model=D, d_ffn=64, n_levels=nl, n_heads=NH,
        n_points=NP, dropout=0.0,
    )
    fast = FastDeformableEncoder(
        num_layers=LAYERS, d_model=D, d_ffn=64, n_levels=nl, n_heads=NH,
        n_points=NP, radius=1, window="2d", cross_level="native",
        dropout=0.0, use_pallas=False,
    )
    src = jnp.asarray(rng.normal(size=(1, s_total, D)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, s_total, D)) * 0.1, jnp.float32)
    vr = jnp.ones((1, nl, 3), jnp.float32)
    p_exact = jax.device_get(
        exact.init(jax.random.PRNGKey(0), src, shapes, vr, pos, None, True)
    )
    for i in range(LAYERS):
        sa = p_exact["params"][f"layers_{i}"]["self_attn"]
        k = (rng.normal(size=sa["sampling_offsets"]["kernel"].shape)
             * 0.001).astype(np.float32)
        b = (rng.normal(size=sa["sampling_offsets"]["bias"].shape)
             * 0.005).astype(np.float32)
        # zero the t components (lane order (h, l, p, xyz))
        k.reshape(D, NH, nl, NP, 3)[..., 2] = 0.0
        b.reshape(NH, nl, NP, 3)[..., 2] = 0.0
        sa["sampling_offsets"]["kernel"] = k
        sa["sampling_offsets"]["bias"] = b
        sa["attention_weights"]["kernel"] = (
            rng.normal(size=sa["attention_weights"]["kernel"].shape) * 0.05
        ).astype(np.float32)
        sa["attention_weights"]["bias"] = (
            rng.normal(size=sa["attention_weights"]["bias"].shape) * 0.1
        ).astype(np.float32)

    out_exact = exact.apply(p_exact, src, shapes, vr, pos, None, True)

    converted = exact_to_fast_encoder(
        p_exact["params"], n_heads=NH, n_levels=nl, n_points=NP, radius=1,
        window="2d", level_scales=native_level_scales(shapes),
    )
    src_levels, pos_levels, start = [], [], 0
    for t, h, w in shapes:
        n = t * h * w
        src_levels.append(src[:, start : start + n].reshape(1, t, h, w, D))
        pos_levels.append(pos[:, start : start + n].reshape(1, t, h, w, D))
        start += n
    out_fast = fast.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        src_levels, pos_levels, None, True,
    )
    out_fast = jnp.concatenate(
        [o.reshape(1, -1, D) for o in out_fast], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(out_exact), np.asarray(out_fast), atol=2e-3, rtol=1e-3
    )


def test_transplant_native_3d_full_trilinear_equivalence(rng):
    """window='3d' + cross_level='native': the transplanted fast encoder
    reproduces the exact encoder's FULL trilinear sampling (spatial AND
    temporal offsets) on a multi-level non-cube pyramid in-window."""
    from class_query_vad_tpu.utils.transplant import native_level_scales

    shapes = ((3, 8, 8), (3, 4, 4))
    nl = len(shapes)
    s_total = sum(t * h * w for t, h, w in shapes)
    exact = DeformableEncoder(
        num_layers=LAYERS, d_model=D, d_ffn=64, n_levels=nl, n_heads=NH,
        n_points=NP, dropout=0.0,
    )
    fast = FastDeformableEncoder(
        num_layers=LAYERS, d_model=D, d_ffn=64, n_levels=nl, n_heads=NH,
        n_points=NP, radius=1, window="3d", cross_level="native",
        dropout=0.0, use_pallas=False,
    )
    src = jnp.asarray(rng.normal(size=(1, s_total, D)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, s_total, D)) * 0.1, jnp.float32)
    vr = jnp.ones((1, nl, 3), jnp.float32)
    p_exact = jax.device_get(
        exact.init(jax.random.PRNGKey(0), src, shapes, vr, pos, None, True)
    )
    for i in range(LAYERS):
        sa = p_exact["params"][f"layers_{i}"]["self_attn"]
        sa["sampling_offsets"]["kernel"] = (
            rng.normal(size=sa["sampling_offsets"]["kernel"].shape) * 0.001
        ).astype(np.float32)
        sa["sampling_offsets"]["bias"] = (
            rng.normal(size=sa["sampling_offsets"]["bias"].shape) * 0.005
        ).astype(np.float32)
        sa["attention_weights"]["kernel"] = (
            rng.normal(size=sa["attention_weights"]["kernel"].shape) * 0.05
        ).astype(np.float32)
        sa["attention_weights"]["bias"] = (
            rng.normal(size=sa["attention_weights"]["bias"].shape) * 0.1
        ).astype(np.float32)

    out_exact = exact.apply(p_exact, src, shapes, vr, pos, None, True)

    converted = exact_to_fast_encoder(
        p_exact["params"], n_heads=NH, n_levels=nl, n_points=NP, radius=1,
        window="3d", level_scales=native_level_scales(shapes),
    )
    src_levels, pos_levels, start = [], [], 0
    for t, h, w in shapes:
        n = t * h * w
        src_levels.append(src[:, start : start + n].reshape(1, t, h, w, D))
        pos_levels.append(pos[:, start : start + n].reshape(1, t, h, w, D))
        start += n
    out_fast = fast.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        src_levels, pos_levels, None, True,
    )
    out_fast = jnp.concatenate(
        [o.reshape(1, -1, D) for o in out_fast], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(out_exact), np.asarray(out_fast), atol=2e-3, rtol=1e-3
    )
