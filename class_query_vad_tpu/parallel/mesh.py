"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP layer
(/root/reference/pipelines/launch.py:23-59, utils/model_utils.py:108-137):
one ``jax.sharding.Mesh`` whose ``data`` axis spans all devices; batches are
sharded on ``data``, parameters are replicated, and the gradient psum is
inserted by XLA from the shardings — there is no explicit collective code.

Multi-host: ``initialize_distributed`` wraps jax.distributed.initialize
(the TCP/IP-file rendezvous of train.py:228-251 becomes the JAX
coordinator); per-host data sharding uses jax.process_index().
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init; a no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def sync_hosts(name: str = "sync"):
    """Cross-host barrier (reference: dist.barrier() at
    utils/video_action_recognition.py:244,277); no-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_allgather(tree):
    """Gather a host-local pytree from every process (in-memory alternative
    to the reference's per-rank txt exchange, utils/misc.py:90-130);
    identity for single-process runs."""
    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def create_mesh(cfg=None, devices=None, batch_size: Optional[int] = None) -> Mesh:
    """Mesh from CONFIG.TPU.MESH_SHAPE/MESH_AXES (-1 = all remaining).

    When ``batch_size`` is given, the data axis is capped at the largest
    device count that divides it (a global batch must shard evenly)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if cfg is not None:
        shape = list(cfg.CONFIG.TPU.MESH_SHAPE)
        axes = tuple(cfg.CONFIG.TPU.MESH_AXES)
    else:
        shape, axes = [-1], ("data",)
    n = devices.size
    if batch_size is not None and len(axes) == 1:
        while batch_size % n != 0:
            n -= 1
        devices = devices.reshape(-1)[:n]
    known = int(np.prod([s for s in shape if s != -1])) or 1
    shape = tuple(n // known if s == -1 else s for s in shape)
    return Mesh(devices.reshape(shape), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
