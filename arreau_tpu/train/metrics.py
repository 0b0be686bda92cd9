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
    """Running mean of scalar metric dicts (weighted by batch count)."""

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._count = 0

    def update(self, metrics: dict, weight: int = 1) -> None:
        for k, v in metrics.items():
            self._sums[k] += float(v) * weight
        self._count += weight

    def compute(self) -> dict:
        if self._count == 0:
            return {}
        return {k: v / self._count for k, v in self._sums.items()}

    def reset(self) -> None:
        self._sums.clear()
        self._count = 0


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
