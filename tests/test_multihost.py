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
