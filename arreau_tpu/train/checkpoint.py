"""Orbax checkpointing: params + opt state + EMA + step + task metadata.

Replaces the reference's Lightning ``ModelCheckpoint`` + ``save_hyperparameters``
+ EMA sidecar logic (main_diffusion.py:268-276,
lightning_wrappers/callbacks.py:134-171): checkpoints are self-describing
(config dict + z-table ride along) so generation needs no CLI args, best/last
tracking is done by the caller via ``save(tag=...)``.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from arreau_tpu.train.state import TrainState


def _meta_path(directory: str) -> str:
    return os.path.join(directory, "meta.json")


class CheckpointManager:
    """Thin wrapper over orbax StandardCheckpointer with best/last tags."""

    def __init__(self, directory: str, meta: Optional[dict] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        if meta is not None:
            with open(_meta_path(self.directory), "w") as f:
                json.dump(meta, f, indent=2, default=str)

    def path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, state: TrainState, tag: str = "last") -> None:
        target = self.path(tag)
        self._ckptr.save(target, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, template: TrainState, tag: str = "last") -> TrainState:
        return self._ckptr.restore(self.path(tag), template)

    def restore_raw(self, tag: str = "last"):
        """Restore without a template (raw pytree-of-arrays as saved).

        Useful for inference, where only ``params``/``ema_params`` are needed
        and the optimizer-state structure may not match the current
        optimizer."""
        return self._ckptr.restore(self.path(tag))

    def load_meta(self) -> dict:
        with open(_meta_path(self.directory)) as f:
            return json.load(f)

    def has(self, tag: str = "last") -> bool:
        return os.path.exists(self.path(tag))

    # ---- ranked (top-k) retention, reference ModelCheckpoint save_top_k=3
    # (/root/reference/main_diffusion.py:268-276). The scoreboard sidecar also
    # persists the best score across preemption resumes, so a resumed run
    # never overwrites 'best' with a worse checkpoint.

    def _scores_path(self) -> str:
        return os.path.join(self.directory, "scores.json")

    def load_scores(self) -> dict:
        if os.path.exists(self._scores_path()):
            with open(self._scores_path()) as f:
                return json.load(f)
        return {"ranked": []}  # list of [score, tag], ascending

    def best_score(self) -> float:
        ranked = self.load_scores()["ranked"]
        return float(ranked[0][0]) if ranked else float("inf")

    def save_ranked(self, state: TrainState, score: float, step: int, keep: int = 3) -> bool:
        """Keep the ``keep`` lowest-score checkpoints (tags ``best-<step>``)
        plus a ``best`` alias for the current minimum. Returns whether this
        checkpoint entered the top-k."""
        import shutil

        board = self.load_scores()
        ranked = [(float(s), t) for s, t in board["ranked"]]
        if len(ranked) >= keep and score >= ranked[-1][0]:
            return False
        tag = f"best-{step}"
        self.save(state, tag)
        ranked.append((float(score), tag))
        ranked.sort(key=lambda st: st[0])
        for _, old_tag in ranked[keep:]:
            shutil.rmtree(self.path(old_tag), ignore_errors=True)
        ranked = ranked[:keep]
        if ranked[0][1] == tag:
            self.save(state, "best")
        board["ranked"] = [[s, t] for s, t in ranked]
        with open(self._scores_path(), "w") as f:
            json.dump(board, f, indent=2)
        return True


def diffusion_meta(config, z_table, length_stats: Optional[dict] = None) -> dict:
    """Self-describing metadata for diffusion checkpoints (config + z-table,
    like the reference's ``z_table_zs`` buffer + ``save_hyperparameters``).

    ``length_stats`` ({min, max, mean, std} of training lattice lengths)
    rides along so generation can apply the clip_denoised stabilizer without
    access to the training data."""
    meta = {"config": asdict(config), "z_table_zs": list(map(int, z_table.zs))}
    if length_stats is not None:
        meta["length_stats"] = {k: float(v) for k, v in length_stats.items()}
    return meta
