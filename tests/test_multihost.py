"""Real multi-PROCESS distributed test (two jax processes, CPU backend).

The multi-device suite (test_multidevice.py) shards over 8 virtual devices
in ONE process; this test exercises the actual multi-host machinery the
TPU pods use — jax.distributed rendezvous (parallel.initialize_distributed,
replacing the reference's shared-file IP rendezvous, train.py:228-251), a
global mesh spanning both processes, an XLA psum across them, the
sync_hosts barrier, and process_allgather (the in-memory replacement for
the reference's per-rank txt exchange, utils/misc.py:90-130).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])

# each process hosts 2 virtual CPU devices -> 4 global devices
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from class_query_vad_tpu.parallel import (
    create_mesh, initialize_distributed, process_allgather, shard_batch,
    sync_hosts,
)
from jax.sharding import NamedSharding, PartitionSpec as P

pid = int(os.environ["PROC_ID"])
initialize_distributed(os.environ["COORD"], 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = create_mesh()
assert mesh.devices.size == 4

# global array sharded over the data axis: each process contributes its
# local half; psum must see all 4 shards
local = np.full((2, 8), float(pid + 1), np.float32)
global_shape = (4, 8)
arrs = [
    jax.device_put(local[i : i + 1], d)
    for i, d in enumerate(mesh.local_devices)
]
x = jax.make_array_from_single_device_arrays(
    global_shape, NamedSharding(mesh, P("data")), arrs
)

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(np.asarray(jax.device_get(total(x))))
# procs 0 and 1 contribute 2*8*1 and 2*8*2
assert abs(t - (16.0 + 32.0)) < 1e-6, t

sync_hosts("test_barrier")

gathered = process_allgather({"rank": np.asarray([pid], np.int32)})
assert sorted(np.asarray(gathered["rank"]).ravel().tolist()) == [0, 1], gathered

print(f"MULTIHOST_OK rank={pid} total={t}")
"""


EVAL_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
sys.path.insert(0, os.path.join(os.environ["REPO"], "tests"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from class_query_vad_tpu.engine import run_validation
from class_query_vad_tpu.losses.criterion import postprocess_ava
from class_query_vad_tpu.parallel import initialize_distributed, sync_hosts
import synthetic_eval as se

pid = int(os.environ["PROC_ID"])
initialize_distributed(os.environ["COORD"], 2, pid)
assert jax.process_count() == 2

cfg = se.make_eval_cfg(os.environ["RES_BASE"], "res")
batches = se.make_batches()[pid::2]   # contiguous round-robin shard

res = run_validation(
    cfg, model=None, params={}, postprocess=postprocess_ava,
    loader=batches, rank=pid, world_size=2,
    barrier=lambda: sync_hosts("eval_txt"),
    forward_fn=jax.jit(se.fake_forward),
)
if pid == 0:
    print(f"EVAL_MAP {res['mAP']!r}")
sync_hosts("eval_done")
print(f"EVALWORKER_OK rank={pid}")
"""


def test_two_process_txt_merge_matches_single_process(tmp_path):
    """The reference eval protocol with process_count > 1: each rank
    writes {rank}.txt / GT_{rank}.txt, barrier, rank 0 merges all ranks'
    files and computes mAP (video_action_recognition.py:231-261).  The
    2-process sharded mAP must equal the single-process run bit-for-bit
    (same detections + GT, just routed through two files)."""
    import jax

    from class_query_vad_tpu.engine import run_validation
    from class_query_vad_tpu.losses.criterion import postprocess_ava

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import synthetic_eval as se

    # single-process reference over the full dataset
    cfg1 = se.make_eval_cfg(tmp_path / "single", "res")
    ref = run_validation(
        cfg1, model=None, params={}, postprocess=postprocess_ava,
        loader=se.make_batches(), rank=0, world_size=1,
        forward_fn=jax.jit(se.fake_forward),
    )
    assert ref["mAP"] > 0.0

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "eval_worker.py"
    script.write_text(EVAL_WORKER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["REPO"] = REPO
    env["COORD"] = f"localhost:{port}"
    env["RES_BASE"] = str(tmp_path / "multi")
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        e = dict(env)
        e["PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-2000:], err[-3000:])
        assert "EVALWORKER_OK" in out, out[-2000:]
    map_line = [l for l in outs[0][0].splitlines() if l.startswith("EVAL_MAP ")]
    assert map_line, outs[0][0][-2000:]
    map2 = float(map_line[0].split(" ", 1)[1])
    assert abs(map2 - ref["mAP"]) < 1e-12, (map2, ref["mAP"])
    # both ranks' files exist and partition the detections
    for r in range(2):
        assert (tmp_path / "multi" / "res" / f"{r}.txt").stat().st_size > 0
        assert (tmp_path / "multi" / "res" / f"GT_{r}.txt").stat().st_size > 0


def test_two_process_mesh_psum_allgather(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["REPO"] = REPO
    env["COORD"] = f"localhost:{port}"
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        e = dict(env)
        e["PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-2000:], err[-3000:])
        assert "MULTIHOST_OK" in out, out[-2000:]
