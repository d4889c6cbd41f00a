"""Centre-frame encoder slice (MODEL.FAST_EFF_SLICE) exactness.

In single-frame mode with the 2d window, the fast encoder never mixes
time, and the decoder consumes only the centre output frame of the common
grid — a temporal lerp of exactly two encoder frames
(transformer._center_slice_plan).  Running the encoder on just those
frames must reproduce the full-T computation exactly: same outputs, same
gradients (unused frames carry zero cotangent), same param tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.config import get_cfg_defaults
from class_query_vad_tpu.models import build_model


def _tiny_cfg(eff_slice: bool):
    cfg = get_cfg_defaults()
    c = cfg.CONFIG
    c.DATA.DATASET_NAME = "ava"
    c.DATA.NUM_CLASSES = 12
    c.DATA.TEMP_LEN = 8
    c.MODEL.TEMP_LEN = 8
    c.MODEL.SINGLE_FRAME = True
    c.MODEL.BACKBONE_NAME = "ViT"
    c.MODEL.ENCODER_TYPE = "fast_attention"
    c.MODEL.FAST_RADIUS = 1
    c.MODEL.FAST_WINDOW = "2d"
    c.MODEL.FAST_EFF_SLICE = eff_slice
    c.MODEL.ENC_LAYERS = 2
    c.MODEL.DEC_LAYERS = 1
    c.MODEL.DIM_FEEDFORWARD = 64
    c.MODEL.QUERY_NUM = 4
    c.ViT.DEPTH = 1
    c.ViT.USE_CHECKPOINT = False
    return cfg


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(2, 8, 64, 64, 3)), jnp.float32)
    mask = jnp.zeros((2, 64, 64), bool)
    m_full = build_model(_tiny_cfg(False))
    m_slice = build_model(_tiny_cfg(True))
    params = m_full.init(jax.random.PRNGKey(0), pixels, mask, True)
    return m_full, m_slice, params, pixels, mask


def test_param_tree_identical(world):
    m_full, m_slice, params, pixels, mask = world
    p2 = m_slice.init(jax.random.PRNGKey(0), pixels, mask, True)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape


def test_forward_exact(world):
    m_full, m_slice, params, pixels, mask = world
    out_f = m_full.apply(params, pixels, mask, True)
    out_s = m_slice.apply(params, pixels, mask, True)
    for k in ("pred_logits", "pred_boxes", "pred_logits_b"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_s[k]), rtol=0, atol=1e-6,
            err_msg=k,
        )


def test_grads_exact(world):
    m_full, m_slice, params, pixels, mask = world

    def loss(model):
        def f(p):
            out = model.apply(p, pixels, mask, True)
            return (jnp.sum(out["pred_logits"] ** 2)
                    + jnp.sum(out["pred_boxes"])
                    + jnp.sum(out["pred_logits_b"] ** 2))
        return f

    g_f = jax.grad(loss(m_full))(params)
    g_s = jax.grad(loss(m_slice))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_s = jax.tree_util.tree_leaves(g_s)
    # fp32 reduction-order noise only: the sliced graph sums matmul rows /
    # resize taps in a different order, and the squared loss amplifies the
    # 1e-6-exact forward to ~1e-3 absolute on O(1) grads (measured; the
    # largest RELATIVE diffs sit on denormal ~1e-23 leaves).  Anything
    # semantic (a dropped frame contribution) would be O(grad) itself.
    for (path, a), b in zip(flat_f, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def _exact_cfg(eff_slice: bool):
    cfg = _tiny_cfg(eff_slice)
    cfg.CONFIG.MODEL.ENCODER_TYPE = "attention"
    return cfg


def test_exact_encoder_last_layer_slice():
    """Round 5: the exact encoder's FINAL layer restricts its queries to
    the centre-lerp frames (its other output rows are never consumed by
    the single-frame decoder).  Layers 1..N-1 stay full.  Forward must
    match the unsliced model; param trees identical."""
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.normal(size=(1, 8, 64, 64, 3)), jnp.float32)
    mask = jnp.zeros((1, 64, 64), bool)
    m_full = build_model(_exact_cfg(False))
    m_slice = build_model(_exact_cfg(True))
    params = m_full.init(jax.random.PRNGKey(0), pixels, mask, True)
    p2 = m_slice.init(jax.random.PRNGKey(0), pixels, mask, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    out_f = m_full.apply(params, pixels, mask, True)
    out_s = m_slice.apply(params, pixels, mask, True)
    for k in ("pred_logits", "pred_boxes", "pred_logits_b"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_s[k]), rtol=0, atol=1e-5,
            err_msg=k,
        )


def test_plan_matches_grid_coords():
    """The static python plan must reproduce resize._grid_coords'
    temporal sampling math for the centre frame."""
    from class_query_vad_tpu.models.resize import _grid_coords, _lerp_weights
    from class_query_vad_tpu.models.transformer import DABTransformer

    for temp_len, t_l in [(16, 8), (8, 4), (32, 8), (9, 4)]:
        tr = DABTransformer(temp_len=temp_len, single_frame=True,
                            encoder_type="fast_attention", fast_window="2d")
        plan = tr._center_slice_plan(((t_l, 8, 8),) * 4)
        assert plan is not None
        (i0, i1), (w0, w1), transposed = plan
        assert not transposed
        f = temp_len // 2
        ts = _grid_coords(temp_len, t_l)[f : f + 1]
        e0, e1, ew0, ew1 = _lerp_weights(ts, t_l)
        assert (i0, i1) == (int(e0[0]), int(e1[0]))
        np.testing.assert_allclose([w0, w1],
                                   [float(ew0[0]), float(ew1[0])], atol=1e-6)


def test_plan_gating():
    from class_query_vad_tpu.models.transformer import DABTransformer

    shapes = ((8, 8, 8),) * 4
    # 3d window mixes time -> no slice
    assert DABTransformer(single_frame=True, encoder_type="fast_attention",
                          fast_window="3d")._center_slice_plan(shapes) is None
    # tube mode decodes every frame -> no slice
    assert DABTransformer(single_frame=False, encoder_type="fast_attention",
                          fast_window="2d")._center_slice_plan(shapes) is None
    # flag off -> no slice
    assert DABTransformer(single_frame=True, encoder_type="fast_attention",
                          fast_window="2d",
                          eff_slice=False)._center_slice_plan(shapes) is None
    # mixed temporal extents -> no slice
    mixed = ((8, 8, 8), (4, 4, 4), (8, 2, 2), (8, 1, 1))
    assert DABTransformer(single_frame=True, encoder_type="fast_attention",
                          fast_window="2d")._center_slice_plan(mixed) is None
    # T_l == temp_len -> direct frame slice with the transposed-2d quirk
    plan = DABTransformer(temp_len=8, single_frame=True,
                          encoder_type="fast_attention",
                          fast_window="2d")._center_slice_plan(shapes)
    assert plan == ((4,), (1.0,), True)
