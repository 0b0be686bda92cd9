"""Optimizer assembly: Adam with minGPT-style decay/no-decay split, cosine
warmup schedule, and global-norm gradient clipping.

Capability parity:
  * decay split — reference lightning_wrappers/diffusion.py:152-218 (Dense
    kernels decay; biases, LayerNorm scales, layer_scale, fourier weights
    don't). Here the split is structural: only rank >= 2 ``kernel`` leaves
    decay.
  * CosineWarmupScheduler — reference lightning_wrappers/scheduler.py:5-19:
    ``lr = base * 0.5 (1 + cos(pi * epoch / max_epochs))`` scaled linearly
    during warmup. We evaluate it per *step* with fractional epochs, which is
    a strictly smoother version of the same curve.
  * gradient clip 0.5 — reference main_diffusion.py:297 (Trainer arg).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def cosine_warmup_schedule(
    base_lr: float, warmup_epochs: float, max_epochs: float, steps_per_epoch: int
) -> optax.Schedule:
    def schedule(step):
        epoch = step / steps_per_epoch
        factor = 0.5 * (1 + jnp.cos(jnp.pi * epoch / max_epochs))
        warm = jnp.where(
            epoch <= warmup_epochs,
            (epoch + 1e-6) / (warmup_epochs + 1e-6),
            1.0,
        )
        return base_lr * factor * warm

    return schedule


def _decay_mask(params) -> dict:
    import jax

    def mask_leaf(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_kernel = any(n == "kernel" for n in names)
        return is_kernel and leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_optimizer(
    learning_rate,
    weight_decay: float = 1e-10,
    grad_clip: Optional[float] = 0.5,
) -> optax.GradientTransformation:
    """Adam + decoupled weight decay on Dense kernels + global-norm clip."""
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(
        optax.adamw(
            learning_rate=learning_rate,
            weight_decay=weight_decay,
            mask=_decay_mask,
        )
    )
    return optax.chain(*txs)
