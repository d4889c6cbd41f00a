"""Multi-device coverage: the sharded train step must run on the full
8-virtual-device CPU mesh (conftest provisions it) and produce the same
update as the identical batch on a single device.

This is the in-suite counterpart of __graft_entry__.dryrun_multichip and
the harness SURVEY.md §4 prescribes (the reference's DDP was only ever
validated on real clusters — /root/reference/pipelines/launch.py:23-59).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from class_query_vad_tpu.config import get_cfg_defaults
from class_query_vad_tpu.engine import create_train_state, make_train_step
from class_query_vad_tpu.losses import (
    build_criterion_and_postprocessor,
    build_matcher,
)
from class_query_vad_tpu.models import build_model
from class_query_vad_tpu.parallel import create_mesh, replicate, shard_batch


NC = 6


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_cfg_defaults()
    cfg.CONFIG.DATA.DATASET_NAME = "ava"
    cfg.CONFIG.DATA.NUM_CLASSES = NC
    cfg.CONFIG.DATA.TEMP_LEN = 4
    cfg.CONFIG.MODEL.TEMP_LEN = 4
    cfg.CONFIG.MODEL.SINGLE_FRAME = True
    cfg.CONFIG.MODEL.QUERY_NUM = 3
    cfg.CONFIG.MODEL.ENC_LAYERS = 1
    cfg.CONFIG.MODEL.DEC_LAYERS = 1
    cfg.CONFIG.MODEL.BACKBONE_NAME = "ViT"
    cfg.CONFIG.ViT.DEPTH = 1
    cfg.CONFIG.ViT.USE_CHECKPOINT = False
    cfg.CONFIG.TRAIN.GRAD_ACCUM = 1
    cfg.CONFIG.TRAIN.LR = 1e-3

    model = build_model(cfg)
    matcher = build_matcher(cfg)
    criterion, _, weight_dict = build_criterion_and_postprocessor(cfg, matcher)

    B, T, H, W, M = 8, 4, 32, 48, 4
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(rng.normal(size=(B, T, H, W, 3)), jnp.float32),
        "mask": jnp.zeros((B, H, W), bool),
        "boxes": jnp.asarray(
            np.clip(rng.uniform(0.2, 0.7, (B, M, 4)), 0.05, 0.95), jnp.float32
        ),
        "labels": jnp.asarray(
            (rng.uniform(size=(B, M, NC)) < 0.2).astype(np.float32)
        ),
        "n_boxes": jnp.full((B,), 2, jnp.int32),
    }
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, criterion, weight_dict, tx)
    return cfg, state, step, batch


def test_train_step_on_8_device_mesh(tiny_setup):
    cfg, state, step, batch = tiny_setup
    assert len(jax.devices()) >= 8, "conftest must provision 8 cpu devices"
    mesh = create_mesh(cfg)
    assert mesh.devices.size == 8 and mesh.axis_names == ("data",)
    with mesh:
        sharded = shard_batch(mesh, batch)
        # the batch axis is genuinely split over all 8 devices
        assert len(sharded["pixels"].sharding.device_set) == 8
        st = replicate(mesh, state)
        st, metrics = jax.jit(step)(st, sharded)
        jax.block_until_ready(metrics)
    vals = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(vals["total_loss"]), vals
    assert int(st.step) == int(state.step) + 1


def test_sharded_step_matches_single_device(tiny_setup):
    cfg, state, step, batch = tiny_setup
    mesh8 = create_mesh(cfg)
    mesh1 = create_mesh(cfg, devices=jax.devices()[:1])

    results = {}
    for name, mesh in (("d8", mesh8), ("d1", mesh1)):
        with mesh:
            st = replicate(mesh, state)
            st, metrics = jax.jit(step)(st, shard_batch(mesh, batch))
            results[name] = (jax.device_get(st.params),
                             {k: float(v) for k, v in metrics.items()})

    p8, m8 = results["d8"]
    p1, m1 = results["d1"]
    for k in m1:
        assert abs(m8[k] - m1[k]) < 1e-4 * max(1.0, abs(m1[k])), (k, m8[k], m1[k])
    flat8 = jax.tree_util.tree_leaves_with_path(p8)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    for path, v8 in flat8:
        v1 = flat1[path]
        # cross-device psum vs single-device sum: reduction-order noise only
        np.testing.assert_allclose(
            np.asarray(v8), np.asarray(v1), atol=3e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
