"""Metrics accumulation and epoch timing.

Replaces torchmetrics (``DiffusionLossMetric`` with ``dist_reduce_fx="sum"``,
/root/reference/diffusion/diffusion_loss.py:52-64) and the ``EpochTimer``
callback (/root/reference/lightning_wrappers/callbacks.py:393-453). Device
reduction needs no special machinery here: the jitted step already returns
fully-reduced scalars (XLA psums across the mesh), so host accumulation is a
plain running mean.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict

import numpy as np


class MeanMetrics:
    """Running weighted mean of scalar metric dicts.

    ``weight`` may be a scalar (applied to every key) or a dict mapping metric
    name -> weight (missing keys default to 1). Per-key weighting makes epoch
    means exact when batches carry different numbers of real crystals/atoms
    (size buckets, padded final chunks): pass each metric's own denominator
    (e.g. valid-atom count for per-atom means, real-crystal count for
    per-crystal means) and the accumulated value is the true dataset mean,
    independent of batch layout.
    """

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._weights: Dict[str, float] = defaultdict(float)

    def update(self, metrics: dict, weight=1) -> None:
        for k, v in metrics.items():
            w = float(weight.get(k, 1)) if isinstance(weight, dict) else float(weight)
            self._sums[k] += float(v) * w
            self._weights[k] += w

    def compute(self) -> dict:
        return {
            k: v / self._weights[k] for k, v in self._sums.items() if self._weights[k] > 0
        }

    def reset(self) -> None:
        self._sums.clear()
        self._weights.clear()


# Which denominator each diffusion metric is a mean over. Metrics not listed
# (e.g. grad_norm) default to plain batch-weighted means.
_PER_ATOM_KEYS = ("loss_coord", "loss_type")
_PER_CRYSTAL_KEYS = ("loss_lattice", "loss_angle", "loss")


def weighted_update(acc: MeanMetrics, metrics: dict) -> None:
    """Exact epoch means for the diffusion metrics: per-atom means weighted by
    the batch's valid-atom count, per-crystal means by its real (unpadded)
    crystal count. The counts ride in the metrics dict (loss() emits them)."""
    m = dict(metrics)
    n_atoms = float(m.pop("num_atoms", 1.0))
    n_crystals = float(m.pop("num_crystals", 1.0))
    weights = {k: n_atoms for k in _PER_ATOM_KEYS}
    weights.update({k: n_crystals for k in _PER_CRYSTAL_KEYS})
    acc.update(m, weights)


def exact_loss(m: dict, angle_weight: float = 1.0) -> dict:
    """Recompose the composite loss from exactly-weighted components: the
    batch-level composite mixes per-atom and per-crystal denominators, so its
    direct mean depends on batch layout; the component sum does not.

    ``angle_weight`` must match the training ``angle_loss_weight`` so the
    recomposed loss (which also drives best-checkpoint ranking) is the same
    objective the optimizer sees. The coord/type/lattice weights are the
    reference-pinned 1/1/1 and are not configurable at the CLI."""
    if all(k in m for k in ("loss_coord", "loss_type", "loss_lattice")):
        m = dict(m)
        m["loss"] = (
            m["loss_coord"] + m["loss_type"] + m["loss_lattice"]
            + angle_weight * m.get("loss_angle", 0.0)
        )
    return m


class EpochTimer:
    """Wall-time per epoch; skips epoch 0 (compile) like the reference."""

    def __init__(self):
        self.times: list[float] = []
        self._start = None
        self._epoch = 0

    def epoch_start(self) -> None:
        self._start = time.perf_counter()

    def epoch_end(self) -> float:
        dt = time.perf_counter() - self._start
        if self._epoch > 0:
            self.times.append(dt)
        self._epoch += 1
        return dt

    def summary(self) -> str:
        if not self.times:
            return "no timed epochs"
        return (
            f"epoch time mean {np.mean(self.times):.2f}s "
            f"± {np.std(self.times):.2f}s over {len(self.times)} epochs"
        )


class JsonlLogger:
    """Append-only local metrics log: one JSON object per line.

    Always-on, dependency-free replacement for the reference's wandb/Lightning
    loggers (main_diffusion.py WandbLogger) — a run's full metric history is
    recoverable from <checkpoint_dir>/metrics.jsonl without any service.
    Appends (preemption resume continues the same file) and writes on process
    0 only in multi-host runs. ``path=None`` disables it (no-op logger)."""

    def __init__(self, path):
        import jax

        self.path = path if (path and jax.process_index() == 0) else None
        if self.path:
            import os

            os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)

    def log(self, record: dict) -> None:
        if not self.path:
            return
        import json

        with open(self.path, "a") as f:
            f.write(json.dumps({k: _jsonable(v) for k, v in record.items()}) + "\n")


def _jsonable(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v
