"""End-to-end integration: evaluate.py and train.py CLIs on a synthetic
JHMDB world (smallest dataset — SURVEY.md §7.2's minimum slice), tiny model.

Runs the real subprocess CLI: dataset -> loader -> model -> postprocess ->
per-rank txt protocol -> evaluator -> JSON metrics line.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def jhmdb_world(tmp_path, rng):
    vids = [f"run/v_{i:04d}" for i in range(2)]
    nframes = {vids[0]: 10, vids[1]: 8}
    gttubes = {}
    for v in vids:
        n = nframes[v]
        rows = []
        for f in range(1, n + 1):
            x1, y1 = rng.uniform(2, 30, 2)
            rows.append([f, x1, y1, x1 + 25, y1 + 20])
        gttubes[v] = {int(rng.integers(0, 21)): [np.array(rows)]}
        d = tmp_path / v
        os.makedirs(d)
        for i in range(1, n + 1):
            arr = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
            Image.fromarray(np.asarray(arr)).save(d / f"{i:05d}.png")
    with open(tmp_path / "JHMDB-GT.pkl", "wb") as f:
        pickle.dump(
            {
                "labels": [str(i) for i in range(21)],
                "train_videos": [vids] * 3,
                "test_videos": [vids] * 3,
                "nframes": nframes,
                "resolution": {v: (60, 80) for v in vids},
                "gttubes": gttubes,
            },
            f,
        )

    yaml = tmp_path / "config.yaml"
    yaml.write_text(
        f"""
CONFIG:
  EVAL_ONLY: True
  DATA:
    DATASET_NAME: jhmdb
    ANNO_PATH: {tmp_path}
    DATA_PATH: {tmp_path}
    NUM_CLASSES: 21
    TEMP_LEN: 12
    IMG_SIZE: 64
    MAX_BOXES: 4
  MODEL:
    SINGLE_FRAME: False
    TEMP_LEN: 12
    QUERY_NUM: 5
    ENC_LAYERS: 1
    DEC_LAYERS: 1
    BACKBONE_NAME: ViT
  ViT:
    DEPTH: 1
    USE_CHECKPOINT: False
  TRAIN:
    BATCH_SIZE: 1
    NUM_EPOCHS: 1
    GRAD_ACCUM: 2
    EVAL_FREQ: 1
    LR: 0.0001
  VAL:
    BATCH_SIZE: 1
  LOG:
    BASE_PATH: {tmp_path}
    EXP_NAME: e2e
    RES_DIR: res
"""
    )
    return tmp_path, yaml


def _run(cmd, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)   # drop the axon sitecustomize
    return subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=500
    )


def test_evaluate_cli(jhmdb_world):
    tmp_path, yaml = jhmdb_world
    proc = _run([sys.executable, "evaluate.py", "--config-file", str(yaml),
                 "--num_workers", "2"])
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert "mAP" in metrics and "v_mAP" in metrics, metrics
    assert 0.0 <= metrics["mAP"] <= 1.0
    # per-rank txt protocol files exist and parse
    res = tmp_path / "res"
    assert (res / "0.txt").exists() and (res / "GT_0.txt").exists()


def test_dryrun_multichip_self_provisions():
    """The driver calls dryrun_multichip from a process whose jax may
    already be initialized (worst case: onto the axon TPU).  It must
    self-provision the virtual CPU mesh via re-exec and exit 0."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("XLA_FLAGS", None)   # driver gives no help; must self-provision
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.devices();"   # poison: backend already initialized
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )  # ALWAYS cold: the dryrun child deliberately skips the persistent
       # cache (warm AOT reloads of its 8-device CPU executables deadlock —
       # see __graft_entry__/PERF.md round 5), so every run pays the three
       # n=4 train/eval compiles (~15-25 min on this 1-core host; the old
       # 840 s budget SIGKILLed pass 2 mid-compile, round-4 Weak #5)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    assert "dryrun_multichip OK" in proc.stdout


def test_train_cli(jhmdb_world):
    tmp_path, yaml = jhmdb_world
    proc = _run([sys.executable, "train.py", "--config-file", str(yaml),
                 "--num_workers", "2"])
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "mean loss" in out, out[-2000:]
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert "mAP" in metrics
