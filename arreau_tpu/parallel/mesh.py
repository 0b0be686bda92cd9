"""Device-mesh helpers for data-parallel training over a TPU slice.

This replaces the reference's entire distributed stack (Lightning DDP over
NCCL, ``--gpus N``, torchmetrics ``dist_reduce_fx`` — SURVEY.md §2.2/§5):
with ``jax.sharding`` the train step is jit-compiled once with the batch
sharded over the ``data`` mesh axis and params replicated; XLA inserts the
gradient/metric all-reduces over ICI automatically. The reference has no
TP/PP/SP/EP (1.1M-param GNN) — DP is the parallelism strategy to scale, and
the mesh carries an (unused, size-1) ``model`` axis for future growth.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data_axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (crystal) axis of every array in the batch."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
