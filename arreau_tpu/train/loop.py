"""Jit-compiled train/eval steps with data-parallel sharding.

The reference's training orchestration is a Lightning Trainer
(/root/reference/main_diffusion.py:293-310); here a train step is one pure
function (noise -> PBC graph rebuild -> backbone -> losses -> grads -> Adam ->
EMA) compiled into a single XLA program, and the driver loop is a plain
Python ``for`` over host batches. Multi-chip: batches arrive sharded over the
mesh's ``data`` axis, params are replicated, and XLA turns the gradient
reduction into ``all-reduce`` over ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from arreau_tpu.parallel.mesh import (
    batch_sharding,
    kernel_partitioning,
    replicated_sharding,
)
from arreau_tpu.train.state import TrainState, apply_gradients


def _bind_kernel_partitioning(jitted, mesh):
    """Bind the Pallas kernel-partitioning context to a jitted callable built
    for ``mesh``: entered around every invocation, so tracing (first call)
    and any retrace happen under the same partitioning (see
    parallel.mesh.kernel_partitioning)."""
    if mesh is None:
        return jitted

    def call(*args, **kwargs):
        with kernel_partitioning(mesh):
            return jitted(*args, **kwargs)

    return call


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    state_sharding=None,
):
    """Build the jitted train step.

    ``loss_fn(params, key, batch) -> (loss, metrics)``.
    With a mesh, the batch is expected sharded on its leading axis and the
    state replicated (or, with ``state_sharding`` — a NamedSharding pytree
    from :func:`parallel.mesh.state_shardings` — tensor-parallel over the
    mesh's model axis); jit's sharding propagation inserts the grad psum and
    the TP activation collectives.
    """

    def step(state: TrainState, key, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch
        )
        new_state = apply_gradients(state, grads, tx)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        rep = replicated_sharding(mesh)
        st = state_sharding if state_sharding is not None else rep
        data = batch_sharding(mesh)
        kwargs["in_shardings"] = (st, rep, data)
        kwargs["out_shardings"] = (st, rep)
    return _bind_kernel_partitioning(jax.jit(step, **kwargs), mesh)


def make_eval_step(
    loss_fn: Callable, mesh=None, use_ema: bool = False, state_sharding=None
):
    def step(state: TrainState, key, batch):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        _, metrics = loss_fn(params, key, batch)
        return metrics

    kwargs = {}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        st = state_sharding if state_sharding is not None else rep
        data = batch_sharding(mesh)
        kwargs["in_shardings"] = (st, rep, data)
        kwargs["out_shardings"] = rep
    return _bind_kernel_partitioning(jax.jit(step, **kwargs), mesh)
