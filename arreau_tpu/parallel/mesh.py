"""Device-mesh helpers for data-parallel training over a TPU slice.

This replaces the reference's entire distributed stack (Lightning DDP over
NCCL, ``--gpus N``, torchmetrics ``dist_reduce_fx`` — SURVEY.md §2.2/§5):
with ``jax.sharding`` the train step is jit-compiled once with the batch
sharded over the ``data`` mesh axis and params replicated; XLA inserts the
gradient/metric all-reduces over ICI automatically. The reference has no
TP/PP/SP/EP (1.1M-param GNN) — DP is the parallelism strategy its scale
calls for — but the framework additionally supports Megatron-style tensor
parallelism over a 2-D ``(data, model)`` mesh (``model_size > 1`` +
:func:`state_shardings`): the basis / ConvNext MLP pairs are column/row
split and GSPMD derives the activation psums, so wider-model configs can
exceed one chip's HBM without code changes.
"""

from __future__ import annotations

import contextlib

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


def make_mesh(
    devices=None,
    data_axis: str = "data",
    model_axis: str = "model",
    model_size: int = 1,
) -> Mesh:
    """1-D ``(data,)`` mesh by default; ``model_size > 1`` folds the device
    list into a 2-D ``(data, model)`` mesh for combined DP x TP. On a real
    slice, pass devices in ICI order so the (faster-varying) model axis rides
    the shortest links — tensor-parallel collectives are latency-bound."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if model_size > 1:
        if devices.size % model_size != 0:
            raise ValueError(
                f"{devices.size} devices not divisible by model_size={model_size}"
            )
        return Mesh(devices.reshape(-1, model_size), (data_axis, model_axis))
    return Mesh(devices, (data_axis,))


# --- Pallas kernels under the mesh -----------------------------------------
#
# GSPMD partitions regular XLA ops automatically, but a Pallas kernel is an
# opaque custom call — XLA has no partitioning rule for it, so inside a
# sharded jit the kernel would be either rejected or run replicated on
# gathered operands (exactly the failure a real multi-chip slice hits first;
# the reference analogue is DDP running its CUDA kernels per-rank,
# /root/reference/main_diffusion.py:142-161). The fix is manual sharding:
# each Pallas call site wraps itself in ``jax.shard_map`` over the data axis
# (the kernels' super-crystal grid axis is embarrassingly parallel), so every
# device runs the kernel on its local batch shard — the same thing DDP does.
#
# The mesh reaches the call sites through this trace-time context. It is NOT
# ambient process state: ``make_train_step``/``make_eval_step`` (and the DP
# sampler) bind it to the jitted callable they return, entering the context
# around every invocation — so a given compiled program always traces and
# re-traces under the same partitioning, and callables built without a mesh
# are never affected (cf. ADVICE r4 on trace-time environment reads: here
# the state is bound to the callable, not read from os.environ).

_KERNEL_PARTITIONING: list = []


@contextlib.contextmanager
def kernel_partitioning(mesh: Mesh, data_axis: str = "data"):
    """Trace-time context: Pallas kernel call sites shard_map themselves over
    ``mesh``'s ``data_axis`` while active. Bind it around calls to a jitted
    function compiled for ``mesh`` (see make_train_step / cli.generate)."""
    _KERNEL_PARTITIONING.append((mesh, data_axis))
    try:
        yield
    finally:
        _KERNEL_PARTITIONING.pop()


def current_kernel_partitioning():
    """(mesh, data_axis) when a >1-way kernel partitioning context is active,
    else (None, None)."""
    if _KERNEL_PARTITIONING:
        mesh, axis = _KERNEL_PARTITIONING[-1]
        if axis in mesh.axis_names and mesh.shape[axis] > 1:
            return mesh, axis
    return None, None


def kernel_partitioning_signature():
    """Hashable token identifying the active kernel partitioning — include it
    in any host-side jit-cache key whose traced program contains Pallas
    kernels (e.g. DiffusionModel's sampler cache)."""
    mesh, axis = current_kernel_partitioning()
    if mesh is None:
        return None
    return (axis, mesh.shape[axis], tuple(d.id for d in mesh.devices.flat))


def shard_map_kernel(fn, mesh: Mesh, data_axis: str, arg_batched: tuple, out_batched):
    """Wrap a Pallas-kernel-calling ``fn`` in shard_map over ``data_axis``.

    ``arg_batched``/``out_batched``: bools (pytrees for out) — True = leading
    axis is the super-crystal axis, sharded over data; False = replicated.
    All other mesh axes are manual-mapped as replicated, so the kernel body
    never runs under GSPMD auto-partitioning (TP-split operands are gathered
    at the shard_map boundary; their cotangents are psummed by the
    transpose rule)."""
    spec_b, spec_r = P(data_axis), P()
    in_specs = tuple(spec_b if b else spec_r for b in arg_batched)
    out_specs = jax.tree.map(lambda b: spec_b if b else spec_r, out_batched)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (crystal) axis of every array in the batch."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- tensor parallelism (Megatron-style column/row MLP split) --------------
#
# The model's FLOPs live in two MLP families: the kernel-basis networks
# (BasisMLP: dense_in -> GELU -> dense_out, SURVEY C13) and the ConvNext
# widen/narrow pair (linear_1/linear_2). Sharding the first layer's output
# dim and the second layer's contraction dim over a ``model`` mesh axis keeps
# the inner activation sharded (no communication between the two matmuls) and
# costs exactly one psum per pair, which GSPMD inserts automatically from the
# param shardings below — no hand-written collectives. Optimizer moments and
# EMA shadows inherit the same specs, so per-device optimizer memory also
# drops by the model-axis size (ZeRO-style, for free).

_COL_SPLIT = frozenset({"dense_in", "linear_1"})  # shard output features
_ROW_SPLIT = frozenset({"dense_out", "linear_2"})  # shard contraction dim


def _path_names(path) -> list[str]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
    return names


def param_partition_spec(path, leaf, model_axis: str = "model") -> P:
    """PartitionSpec for one (possibly optimizer-moment / EMA) param leaf,
    keyed on the trailing ``<module>/<param>`` names so the same rule covers
    ``params``, ``ema_params`` and adam's ``mu``/``nu`` trees."""
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", 0)
    if len(names) >= 2:
        module, param = names[-2], names[-1]
        if module in _COL_SPLIT:
            if param == "kernel" and ndim == 2:
                return P(None, model_axis)
            if param == "bias" and ndim == 1:
                return P(model_axis)
        elif module in _ROW_SPLIT:
            if param == "kernel" and ndim == 2:
                return P(model_axis, None)
            # row-split bias adds after the psum -> replicated
    return P()


def state_shardings(state, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for a TrainState: TP specs when the mesh has a
    model axis, fully replicated otherwise."""
    if model_axis not in mesh.axis_names:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: rep, state)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_partition_spec(path, leaf, model_axis)
        ),
        state,
    )


def shard_state(state, mesh: Mesh, model_axis: str = "model"):
    """Device-put a host TrainState onto the mesh with TP param shardings."""
    return jax.device_put(state, state_shardings(state, mesh, model_axis))


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
