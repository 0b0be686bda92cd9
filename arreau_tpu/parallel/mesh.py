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


def maybe_initialize_distributed() -> tuple[int, int]:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when launched
    as one process per host (coordinator address present in the environment),
    and return ``(process_index, process_count)`` for host-side data sharding.

    Single-process runs (one host, any number of local devices) are a no-op.
    The reference's analogue is Lightning spawning DDP workers over NCCL
    (/root/reference/main_diffusion.py:142-161); on TPU pods the runtime is
    one Python process per host and XLA drives ICI/DCN collectives.
    """
    import os

    if (
        "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
        or int(os.environ.get("JAX_PROCESS_COUNT", "1")) > 1
    ):
        kwargs = {}
        addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"
        )
        if addr:
            kwargs["coordinator_address"] = addr
        if "JAX_PROCESS_COUNT" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_PROCESS_COUNT"])
        if "JAX_PROCESS_INDEX" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_INDEX"])
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def make_mesh(devices=None, data_axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (crystal) axis of every array in the batch."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch with its leading axis sharded over the mesh.

    Multi-host: each process holds its disjoint 1/num_hosts slice of the
    global batch (BucketedLoader's stride split) and contributes it as the
    local shards of one global array."""
    sh = batch_sharding(mesh, data_axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
