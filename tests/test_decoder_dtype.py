"""DECODER_DTYPE=bfloat16 serving mode: same param tree as fp32, close
outputs (the reference serves the decoder under fp16 AMP —
/root/reference/evaluate.py --amp / utils/video_action_recognition.py;
the TPU equivalent is bf16 compute with fp32 box-refinement islands)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.config import get_cfg_custom
from class_query_vad_tpu.models import build_model


@pytest.fixture(scope="module")
def cfg_pair():
    base = get_cfg_custom("configuration/JHMDB_ViT-B_fast.yaml")

    def small(decoder_dtype):
        cfg = base.clone()
        cfg.defrost()
        cfg.CONFIG.DATA.TEMP_LEN = 4
        cfg.CONFIG.MODEL.TEMP_LEN = 4
        cfg.CONFIG.MODEL.ENC_LAYERS = 1
        cfg.CONFIG.MODEL.DEC_LAYERS = 2
        cfg.CONFIG.ViT.DEPTH = 1
        cfg.CONFIG.MODEL.DECODER_DTYPE = decoder_dtype
        cfg.freeze()
        return cfg

    return small("float32"), small("bfloat16")


def _forward(cfg, pixels, mask):
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), pixels, mask, True)
    return params, model.apply(params, pixels, mask, True)


def test_bf16_decoder_matches_fp32(cfg_pair):
    cfg32, cfg16 = cfg_pair
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(1, 4, 128, 128, 3)), jnp.float32)
    mask = jnp.zeros((1, 128, 128), bool)

    p32, out32 = _forward(cfg32, pixels, mask)
    p16, out16 = _forward(cfg16, pixels, mask)

    # identical param trees (params stay fp32 — checkpoints unaffected)
    flat32 = jax.tree_util.tree_leaves_with_path(p32)
    flat16 = jax.tree_util.tree_leaves_with_path(p16)
    assert [k for k, _ in flat32] == [k for k, _ in flat16]
    for (_, a), (_, b) in zip(flat32, flat16):
        assert a.shape == b.shape and a.dtype == b.dtype

    boxes32 = np.asarray(out32["pred_boxes"], np.float32)
    boxes16 = np.asarray(out16["pred_boxes"], np.float32)
    assert np.isfinite(boxes16).all()
    np.testing.assert_allclose(boxes16, boxes32, atol=0.05)

    lb32 = np.asarray(out32["pred_logits_b"], np.float32)
    lb16 = np.asarray(out16["pred_logits_b"], np.float32)
    assert np.isfinite(lb16).all()
    np.testing.assert_allclose(lb16, lb32, atol=0.05)

    # class logits are a feature-axis mean that cancels to ~0 at random
    # init (fp32 gives ~1e-8), so closeness is meaningless here — assert
    # only that bf16 keeps them at rounding-noise scale and finite
    lg16 = np.asarray(out16["pred_logits"], np.float32)
    assert np.isfinite(lg16).all()
    assert np.abs(lg16).max() < 0.5
