"""Every shipped configuration YAML must build a model that runs forward.

Depth/layer counts are shrunk for speed; architecture selection (backbone
family, encoder type, dataset mode, feature levels) comes from the YAML.
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from class_query_vad_tpu.config import get_cfg_custom
from class_query_vad_tpu.models import build_model

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "configuration")
YAMLS = sorted(os.path.basename(p) for p in glob.glob(f"{CONFIG_DIR}/*.yaml"))


@pytest.mark.parametrize("name", YAMLS)
def test_config_builds_and_runs(name):
    cfg = get_cfg_custom(os.path.join(CONFIG_DIR, name))
    cfg.CONFIG.DATA.TEMP_LEN = 4
    cfg.CONFIG.MODEL.TEMP_LEN = 4
    cfg.CONFIG.ViT.DEPTH = 1
    cfg.CONFIG.ViT.USE_CHECKPOINT = False
    cfg.CONFIG.MODEL.ENC_LAYERS = 1
    cfg.CONFIG.MODEL.DEC_LAYERS = 1
    cfg.CONFIG.GRADIENT_CHECKPOINTING = False

    model = build_model(cfg)
    B, T, H, W = 1, 4, 64, 96
    pixels = jnp.zeros((B, T, H, W, 3), jnp.float32)
    mask = jnp.zeros((B, H, W), bool)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), pixels, mask, True
    )
    out = jax.jit(model.apply, static_argnums=(3,))(params, pixels, mask, True)

    nq = cfg.CONFIG.MODEL.QUERY_NUM
    nc = cfg.CONFIG.DATA.NUM_CLASSES
    if cfg.CONFIG.DATA.DATASET_NAME == "ava" and cfg.CONFIG.MODEL.SINGLE_FRAME:
        assert out["pred_logits"].shape == (B, nq, nc)
    else:
        assert out["pred_logits"].shape[0] == B
        assert out["pred_logits"].shape[-2:] == (nq, nc)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
