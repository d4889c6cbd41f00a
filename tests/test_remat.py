"""Gradient checkpointing coverage (round-3 verdict item 8).

CONFIG.GRADIENT_CHECKPOINTING must now remat the DAB decoder's loc/cls
layer pairs and the SSM encoder layers (reference checkpoints both:
/root/reference/models/detr/dab_transformer.py:765-801, :468-478), on top
of the existing backbone/encoder coverage, and ViT.USE_CHECKPOINT drives
the ViT per-block remat (vit.py:44).  remat must not change values or
gradients — only the backward-pass memory/recompute trade.
"""

import jax
import jax.numpy as jnp
import numpy as np

from class_query_vad_tpu.config import get_cfg_defaults
from class_query_vad_tpu.models import build_model


def _tiny_cfg(remat: bool):
    cfg = get_cfg_defaults()
    c = cfg.CONFIG
    c.DATA.DATASET_NAME = "ava"
    c.DATA.NUM_CLASSES = 8
    c.DATA.TEMP_LEN = 4
    c.MODEL.TEMP_LEN = 4
    c.MODEL.SINGLE_FRAME = True
    c.MODEL.BACKBONE_NAME = "ViT"
    c.MODEL.ENCODER_TYPE = "fast_attention"
    c.MODEL.FAST_RADIUS = 1
    c.MODEL.FAST_WINDOW = "2d"
    c.MODEL.ENC_LAYERS = 1
    c.MODEL.DEC_LAYERS = 2
    c.MODEL.DIM_FEEDFORWARD = 32
    c.MODEL.QUERY_NUM = 3
    c.ViT.DEPTH = 1
    c.ViT.USE_CHECKPOINT = remat
    c.GRADIENT_CHECKPOINTING = remat
    return cfg


def test_full_model_remat_grads_match():
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    mask = jnp.zeros((1, 32, 32), bool)

    m_off = build_model(_tiny_cfg(False))
    m_on = build_model(_tiny_cfg(True))
    params = m_off.init(jax.random.PRNGKey(0), pixels, mask, True)
    p_on = m_on.init(jax.random.PRNGKey(0), pixels, mask, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p_on))

    def loss(model):
        def f(p):
            out = model.apply(p, pixels, mask, True)
            return (jnp.sum(out["pred_logits"] ** 2)
                    + jnp.sum(out["pred_boxes"])
                    + jnp.sum(out["pred_logits_b"] ** 2))
        return f

    v_off, g_off = jax.value_and_grad(loss(m_off))(params)
    v_on, g_on = jax.value_and_grad(loss(m_on))(params)
    np.testing.assert_allclose(float(v_off), float(v_on), rtol=1e-6)
    # remat recomputes the forward inside the backward with different
    # fusion/reduction order — fp32 noise only (measured max rel 4e-6)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_off),
                            jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_ssm_encoder_remat_grads_match():
    from class_query_vad_tpu.models.ssm_encoder import SSMEncoder

    rng = np.random.default_rng(1)
    t, h, w, d = 3, 4, 4, 32
    src = jnp.asarray(rng.normal(size=(1, t * h * w, d)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, t * h * w, d)), jnp.float32)

    enc_off = SSMEncoder(num_layers=2, d_model=d, d_ffn=16, kind="vssm",
                         remat=False)
    enc_on = SSMEncoder(num_layers=2, d_model=d, d_ffn=16, kind="vssm",
                        remat=True)
    params = enc_off.init(jax.random.PRNGKey(0), src, pos, (t, h, w), True)

    def loss(enc):
        def f(p):
            out, _ = enc.apply(p, src, pos, (t, h, w), True)
            return jnp.sum(out ** 2)
        return f

    v_off, g_off = jax.value_and_grad(loss(enc_off))(params)
    v_on, g_on = jax.value_and_grad(loss(enc_on))(params)
    np.testing.assert_allclose(float(v_off), float(v_on), rtol=1e-6)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_off),
                            jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
