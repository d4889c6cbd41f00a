"""Tests for the long-tail parity utilities: tune_point freezing, dice loss,
masks_to_boxes, accuracy_sigmoid, video-AP error analysis, RNG checkpointing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dice_loss_matches_torch():
    import torch

    from class_query_vad_tpu.losses.criterion import dice_loss

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    t = (rng.uniform(size=(4, 7)) < 0.5).astype(np.float32)

    ti = torch.tensor(x).sigmoid().flatten(1)
    tt = torch.tensor(t)
    num = 2 * (ti * tt).sum(1)
    den = ti.sum(-1) + tt.sum(-1)
    want = ((1 - (num + 1) / (den + 1)).sum() / 3.0).item()

    got = float(dice_loss(jnp.asarray(x), jnp.asarray(t), 3.0))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masks_to_boxes():
    from class_query_vad_tpu.utils.box_ops import masks_to_boxes

    m = np.zeros((2, 8, 10), bool)
    m[0, 2:5, 3:7] = True
    m[1, 0:1, 9:10] = True
    got = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(got[0], [3, 2, 6, 4])
    np.testing.assert_allclose(got[1], [9, 0, 9, 0])


def test_accuracy_sigmoid():
    from class_query_vad_tpu.utils.misc import accuracy_sigmoid

    out = np.array([[0.9, 0.1, 0.8], [0.2, 0.7, 0.1]])
    tgt = np.array([[1, 0, 1], [1, 0, 0]])
    # row 0: top-2 = {0, 2} == labels -> hit; row 1: top-1 = {1} != {0}
    assert accuracy_sigmoid(out, tgt) == 50.0


def test_batched_giou_matches_unbatched():
    from class_query_vad_tpu.utils.box_ops import (
        batched_generalized_box_iou,
        generalized_box_iou,
    )

    rng = np.random.default_rng(1)
    lt = rng.uniform(0, 0.5, (2, 3, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.5, (2, 3, 2)).astype(np.float32)
    b1 = np.concatenate([lt, lt + wh], -1)
    lt2 = rng.uniform(0, 0.5, (2, 4, 2)).astype(np.float32)
    wh2 = rng.uniform(0.1, 0.5, (2, 4, 2)).astype(np.float32)
    b2 = np.concatenate([lt2, lt2 + wh2], -1)
    got = np.asarray(batched_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for b in range(2):
        want = np.asarray(generalized_box_iou(jnp.asarray(b1[b]), jnp.asarray(b2[b])))
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def _tube(t0, t1, box):
    return np.array([[t, *box] for t in range(t0, t1 + 1)], np.float32)


def test_video_ap_error_buckets():
    from class_query_vad_tpu.evaluates.video_map import video_ap_error

    gt = {"v": {0: [_tube(0, 9, (10, 10, 30, 30))],
                1: [_tube(0, 9, (60, 60, 90, 90))]}}
    labels = ["a", "b"]
    alldets = {
        0: [
            ("v", 0.9, _tube(0, 9, (10, 10, 30, 30))),   # TP
            ("v", 0.8, _tube(0, 9, (10, 10, 30, 30))),   # repeat
            ("v", 0.7, _tube(0, 9, (60, 60, 90, 90))),   # cls error
            ("v", 0.6, _tube(0, 9, (200, 200, 230, 230))),  # extra
        ],
        1: [],
    }
    res = video_ap_error(gt, labels, ["v"], alldets, thr=0.5)
    assert res["a"]["AP"] == pytest.approx(100.0, abs=1e-4)
    assert res["a"]["repeat"] > 0
    assert res["a"]["cls"] > 0
    assert res["a"]["extra"] > 0
    assert res["a"]["missed"] == pytest.approx(0.0, abs=1e-4)
    assert res["b"]["missed"] == pytest.approx(100.0)
    assert "mean" in res


def test_backbone_freeze_labels_vit():
    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.engine import backbone_freeze_labels

    cfg = get_cfg_defaults()
    cfg.CONFIG.MODEL.BACKBONE_NAME = "ViT"
    cfg.CONFIG.MODEL.TUNE_POINT = 1
    # tune_point freezing activates only with pretrained loading (the
    # reference freezes inside load_pretrain)
    cfg.CONFIG.MODEL.PRETRAINED = True
    params = {
        "params": {
            "backbone": {
                "body": {
                    "patch_embed": {"kernel": 0},
                    "blocks_0": {"attn": {"qkv": {"kernel": 0}},
                                 "norm1": {"scale": 0}},
                    "blocks_1": {"mlp_fc1": {"kernel": 0}},
                    "blocks_2": {"mlp_fc1": {"kernel": 0}},
                    "norm": {"scale": 0},
                },
                "lateral_convs_0": {"proj1": {"kernel": 0}},
            },
            "transformer": {"encoder": {"layers_0": {"norm1": {"scale": 0}}}},
        }
    }
    labels = backbone_freeze_labels(params, cfg)
    p = labels["params"]
    assert p["backbone"]["body"]["patch_embed"]["kernel"] == "frozen"
    assert p["backbone"]["body"]["blocks_0"]["attn"]["qkv"]["kernel"] == "frozen"
    assert p["backbone"]["body"]["blocks_1"]["mlp_fc1"]["kernel"] == "frozen"
    # block 2 > tune_point and not a norm -> trainable
    assert p["backbone"]["body"]["blocks_2"]["mlp_fc1"]["kernel"] == "trainable"
    # norms anywhere in the trunk are frozen (reference vit.py:122-123)
    assert p["backbone"]["body"]["norm"]["scale"] == "frozen"
    # FPN laterals and the transformer are never frozen
    assert p["backbone"]["lateral_convs_0"]["proj1"]["kernel"] == "trainable"
    assert p["transformer"]["encoder"]["layers_0"]["norm1"]["scale"] == "trainable"


def test_backbone_freeze_labels_csn():
    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.engine import backbone_freeze_labels

    cfg = get_cfg_defaults()
    cfg.CONFIG.MODEL.BACKBONE_NAME = "CSN-50"
    cfg.CONFIG.MODEL.TUNE_POINT = 4
    cfg.CONFIG.MODEL.PRETRAINED = True
    params = {
        "params": {
            "backbone": {
                "conv1": {"kernel": 0},
                "layer1_0": {"conv1": {"kernel": 0}},
                "layer2_0": {"conv1": {"kernel": 0}},
                "layer3_0": {"conv1": {"kernel": 0}},
                "layer4_0": {"conv1": {"kernel": 0}},
            }
        }
    }
    p = backbone_freeze_labels(params, cfg)["params"]["backbone"]
    # tune_point=4: stem frozen (>1), stage s frozen iff 4 > s+2 -> s in {0,1}
    assert p["conv1"]["kernel"] == "frozen"
    assert p["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert p["layer2_0"]["conv1"]["kernel"] == "frozen"
    assert p["layer3_0"]["conv1"]["kernel"] == "trainable"
    assert p["layer4_0"]["conv1"]["kernel"] == "trainable"


def test_frozen_params_do_not_update():
    import optax

    from class_query_vad_tpu.engine import make_optimizer

    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    labels = {"a": "frozen", "b": "trainable"}
    tx = make_optimizer(0.1, freeze_labels=labels)
    state = tx.init(params)
    grads = {"a": jnp.full(3, 0.5), "b": jnp.full(3, 0.5)}
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["a"]), 1.0)  # frozen: no step, no wd
    assert np.all(np.asarray(new["b"]) != 1.0)


def test_checkpoint_rng_roundtrip(tmp_path):
    import random

    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.engine.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg = get_cfg_defaults()
    cfg.CONFIG.LOG.BASE_PATH = str(tmp_path)
    cfg.CONFIG.LOG.EXP_NAME = "exp"
    state = {"w": jnp.arange(4.0)}
    random.seed(123)
    np.random.seed(123)
    path = save_checkpoint(cfg, state, epoch=0)
    want_py = random.random()
    want_np = np.random.rand()
    # perturb the streams, then restore
    random.seed(999)
    np.random.seed(999)
    restored, meta = load_checkpoint(path, target=state)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0))
    assert meta["epoch"] == 0
    assert random.random() == want_py
    assert np.random.rand() == want_np


def test_single_person_evaluator_size_buckets(tmp_path):
    from class_query_vad_tpu.evaluates.evaluators import (
        STDetectionEvaluaterSinglePerson,
    )

    gt = tmp_path / "GT_0.txt"
    det = tmp_path / "0.txt"
    gt.write_text("v_001 [0,0,10,10,40,40,1.0]\n")          # area 900
    det.write_text(
        "v_001 [10,10,40,40,0.3,0.2,0.9]\n"                  # area 900, hit
        "v_001 [100,100,400,400,0.1,0.1,0.8]\n"              # area 90000
    )
    ev = STDetectionEvaluaterSinglePerson(class_num=2)
    ev.load_GT_from_path([str(gt)])
    ev.load_detection_from_path([str(det)])
    mAP, _ = ev.evaluate()
    assert mAP[0] == pytest.approx(1.0)

    # small-only bucket excludes everything bigger than 50x50
    ev2 = STDetectionEvaluaterSinglePerson(
        class_num=2, threshold_size_max=2500.0
    )
    ev2.load_GT_from_path([str(gt)])
    ev2.load_detection_from_path([str(det)])
    mAP2, _ = ev2.evaluate()
    assert mAP2[0] == pytest.approx(1.0)   # big det filtered, hit remains


def test_get_prior_length():
    from class_query_vad_tpu.evaluates.evaluators import get_prior_length

    ds = {
        "train_videos": [["a", "b"]],
        "gttubes": {
            "a": {0: [np.zeros((5, 5))]},
            "b": {1: [np.zeros((9, 5)), np.zeros((3, 5))]},
        },
    }
    assert get_prior_length(ds) == {1: 5.0, 2: 6.0}
