"""Golden parity: our evaluators vs the reference evaluators on synthetic
prediction/GT txt files (the shared per-rank file protocol).

Both stacks parse the same files and must produce identical frame-mAP and
video-mAP values.
"""

import os

import numpy as np
import pytest

from class_query_vad_tpu.evaluates import (
    STDetectionEvaluaterAVA,
    STDetectionEvaluaterJHMDB,
    STDetectionEvaluaterUCF,
)

from reference_oracle import install_reference

install_reference()

from evaluates.evaluate_ava import STDetectionEvaluater as RefAVA  # noqa: E402
from evaluates.evaluate_jhmdb import STDetectionEvaluaterJHMDB as RefJHMDB  # noqa: E402
from evaluates.evaluate_ucf import STDetectionEvaluaterUCF as RefUCF  # noqa: E402


def _fmt(key, vals):
    return "{} {}\n".format(key, [float(v) for v in vals])


def _rand_box(rng, w=320, h=256):
    x1, y1 = rng.uniform(0, w * 0.6), rng.uniform(0, h * 0.6)
    return [x1, y1, x1 + rng.uniform(20, w * 0.4), y1 + rng.uniform(20, h * 0.4)]


@pytest.fixture
def ava_files(tmp_path, rng):
    nc = 80
    labelmap = tmp_path / "labelmap.pbtxt"
    lines = []
    for i in range(1, nc + 1):
        lines.append(f'item {{\n  name: "class_{i}"\n  id: {i}\n}}\n')
    labelmap.write_text("".join(lines))
    (tmp_path / "ava_val_excluded_timestamps_v2.2.csv").write_text("vidX,0904\n")

    gt_path = tmp_path / "GT_0.txt"
    det_path = tmp_path / "0.txt"
    with open(gt_path, "w") as g, open(det_path, "w") as d:
        for v in range(4):
            key = f"vid{v}_09{v:02d}"
            n_gt = rng.integers(1, 4)
            for i in range(n_gt):
                box = _rand_box(rng)
                labels = (rng.uniform(size=nc) < 0.06).astype(float)
                labels[rng.integers(0, nc)] = 1.0
                g.write(_fmt(key, [v, 0] + box + list(labels)))
            for q in range(15):
                box = _rand_box(rng)
                scores = rng.uniform(0, 1, nc)
                d.write(_fmt(key, box + list(scores) + [rng.uniform()]))
    return str(labelmap), [str(gt_path)], [str(det_path)]


def test_ava_evaluator_parity(ava_files):
    labelmap, gt, det = ava_files
    ref = RefAVA(labelmap, tiou_thresholds=[0.5], class_num=80)
    ref.load_GT_from_path(gt)
    ref.load_detection_from_path(det)
    ref_map, _ = ref.evaluate()

    ours = STDetectionEvaluaterAVA(labelmap, tiou_thresholds=[0.5], class_num=80)
    ours.load_GT_from_path(gt)
    ours.load_detection_from_path(det)
    our_map, _ = ours.evaluate()
    assert np.isclose(ref_map[0], our_map[0], atol=1e-9), (ref_map, our_map)


def _tube_files(tmp_path, rng, nc, n_actors, fmt):
    """Write UCF/JHMDB-style GT + det files.  fmt: 'ucf' or 'jhmdb'."""
    gt_path = tmp_path / "GT_0.txt"
    det_path = tmp_path / "0.txt"
    with open(gt_path, "w") as g, open(det_path, "w") as d:
        for v in range(3):
            vname = f"Run_v{v:04d}"
            label = int(rng.integers(0, nc))
            nframes = 6
            # GT: per frame, ntubes interleaved rows
            tubes = [
                {"box": _rand_box(rng), "drift": rng.uniform(-3, 3, 2)}
                for _ in range(n_actors)
            ]
            for f in range(1, nframes + 1):
                key = f"{vname}_{f:05d}"
                for a, tube in enumerate(tubes):
                    box = list(np.array(tube["box"]) + f * np.r_[tube["drift"], tube["drift"]])
                    onehot = [0.0] * (nc + 1)
                    pad = 0.0
                    if fmt == "ucf" and a == n_actors - 1 and f <= 2:
                        # padded rows for the last tube's first frames
                        box = [0.0, 0.0, 0.0, 0.0]
                        pad = 1.0
                        onehot[label] = 1.0
                    else:
                        onehot[label] = 1.0
                    if fmt == "ucf":
                        g.write(_fmt(key, [v, f] + box + onehot[:-1] + [pad]))
                    else:
                        g.write(_fmt(key, [v, f] + box + onehot))
                # detections: query_num boxes per frame
                for q in range(8):
                    box = _rand_box(rng)
                    scores = rng.uniform(0, 1, nc)
                    pb = rng.uniform()
                    d.write(_fmt(key, box + list(scores) + [pb]))
    return [str(gt_path)], [str(det_path)]


def test_jhmdb_evaluator_parity(tmp_path, rng):
    nc = 21
    gt, det = _tube_files(tmp_path, rng, nc, n_actors=1, fmt="jhmdb")
    ref = RefJHMDB(tiou_thresholds=[0.5], class_num=nc, query_num=8)
    ref.load_GT_from_path(gt)
    ref.load_detection_from_path(det)
    ref_map, _, ref_vmap, _ = ref.evaluate()

    ours = STDetectionEvaluaterJHMDB(tiou_thresholds=[0.5], class_num=nc, query_num=8)
    ours.load_GT_from_path(gt)
    ours.load_detection_from_path(det)
    our_map, _, our_vmap, _ = ours.evaluate()
    assert np.isclose(ref_map[0], our_map[0], atol=1e-9), (ref_map, our_map)
    assert np.isclose(ref_vmap[0], our_vmap[0], atol=1e-7), (ref_vmap, our_vmap)


def test_ucf_evaluator_parity(tmp_path, rng):
    nc = 24
    # fake dataset pickle for the reference's constructor
    import pickle

    with open(tmp_path / "UCF101v2-GT.pkl", "wb") as f:
        pickle.dump({"train_videos": [[]], "gttubes": {}}, f)
    gt, det = _tube_files(tmp_path, rng, nc, n_actors=2, fmt="ucf")
    ref = RefUCF(tiou_thresholds=[0.5], class_num=nc, query_num=8,
                 data_root=str(tmp_path))
    ref.load_GT_from_path(gt)
    ref.load_detection_from_path(det)
    ref_map, _, ref_vmap, _ = ref.evaluate()

    ours = STDetectionEvaluaterUCF(tiou_thresholds=[0.5], class_num=nc, query_num=8)
    ours.load_GT_from_path(gt)
    ours.load_detection_from_path(det)
    our_map, _, our_vmap, _ = ours.evaluate()
    assert np.isclose(ref_map[0], our_map[0], atol=1e-9), (ref_map, our_map)
    assert np.isclose(ref_vmap[0], our_vmap[0], atol=1e-7), (ref_vmap, our_vmap)
