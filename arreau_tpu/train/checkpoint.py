"""Orbax checkpointing: params + opt state + EMA + step + task metadata.

Replaces the reference's Lightning ``ModelCheckpoint`` + ``save_hyperparameters``
+ EMA sidecar logic (main_diffusion.py:268-276,
lightning_wrappers/callbacks.py:134-171): checkpoints are self-describing
(config dict + z-table ride along) so generation needs no CLI args, best/last
tracking is done by the caller via ``save(tag=...)``.

Multi-host semantics (Lightning analog: rank-zero ModelCheckpoint): the
orbax array save/restore calls are COLLECTIVE — every process must make them
with the same tags — while all host-side sidecar IO (``meta.json``,
``scores.json``, top-k eviction rmtree) happens on process 0 only. Ranked
decisions are made on process 0 from the scoreboard and broadcast so every
process issues the identical collective sequence even when per-host metric
copies drift in the last bits. Assumes a shared checkpoint filesystem
(GCS/NFS), the standard multi-host setup orbax itself requires.
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


def _is_primary() -> bool:
    return jax.process_index() == 0


def _ckpt_mesh():
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()).reshape(-1), ("ckpt",))


def _to_global(tree):
    """Multi-host: lift fully-replicated HOST-LOCAL arrays (the DP-replicated
    TrainState as produced by single-program code) to global jax.Arrays so
    orbax can serialize them collectively. No-op in single-process runs and
    for arrays that already carry a global sharding."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    mesh = _ckpt_mesh()

    def conv(x):
        if isinstance(x, jax.Array) and x.sharding.is_fully_addressable:
            return multihost_utils.host_local_array_to_global_array(
                x, mesh, PartitionSpec()
            )
        return x

    return jax.tree.map(conv, tree)


def _to_host_local(tree):
    """Inverse of :func:`_to_global` after a multi-host restore."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    mesh = _ckpt_mesh()

    def conv(x):
        if isinstance(x, jax.Array) and not x.sharding.is_fully_addressable:
            return multihost_utils.global_array_to_host_local_array(
                x, mesh, PartitionSpec()
            )
        return x

    return jax.tree.map(conv, tree)


def _broadcast_decision(values: "list[float]") -> "list[float]":
    """Broadcast a small list of floats from process 0 to all processes, so
    ranked-save decisions are made once and every process issues the same
    collective save sequence. No-op in single-process runs."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    arr = multihost_utils.broadcast_one_to_all(np.asarray(values, np.float64))
    return [float(v) for v in np.asarray(arr)]


class CheckpointManager:
    """Thin wrapper over orbax StandardCheckpointer with best/last tags."""

    def __init__(self, directory: str, meta: Optional[dict] = None):
        self.directory = os.path.abspath(directory)
        if _is_primary():
            os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        if meta is not None and _is_primary():
            with open(_meta_path(self.directory), "w") as f:
                json.dump(meta, f, indent=2, default=str)

    def path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, state: TrainState, tag: str = "last", block: bool = True) -> None:
        """Save ``state`` under ``tag``.

        ``block=False`` returns as soon as orbax has snapshotted the arrays to
        host memory and overlaps the disk write with subsequent training
        (orbax's AsyncCheckpointer; the reference's Lightning saves are always
        blocking). At most one save is in flight: a new save first waits for
        the previous one, and :meth:`wait`/:meth:`restore`/:meth:`has` are
        in-flight-safe."""
        target = self.path(tag)
        self._ckptr.wait_until_finished()  # one in-flight save max
        self._ckptr.save(target, _to_global(state), force=True)
        if block:
            self._ckptr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has committed to disk."""
        self._ckptr.wait_until_finished()

    def restore(self, template: TrainState, tag: str = "last") -> TrainState:
        self._ckptr.wait_until_finished()
        restored = self._ckptr.restore(self.path(tag), _to_global(template))
        return _to_host_local(restored)

    def restore_raw(self, tag: str = "last"):
        """Restore without a template (raw pytree-of-arrays as saved).

        Useful for inference, where only ``params``/``ema_params`` are needed
        and the optimizer-state structure may not match the current
        optimizer. Topology-portable: a checkpoint saved on an N-device mesh
        (orbax records the save-time shardings) restores on any device set —
        when the recorded devices don't exist here, arrays are read back as
        host numpy instead (the template-less restore would otherwise raise
        ``ValueError: available devices are different``; e.g. train on a pod,
        generate on one chip)."""
        self._ckptr.wait_until_finished()
        try:
            return self._ckptr.restore(self.path(tag))
        except ValueError:
            ckptr = ocp.PyTreeCheckpointer()
            meta = ckptr.metadata(self.path(tag)).item_metadata
            restore_args = jax.tree.map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta
            )
            return ckptr.restore(self.path(tag), restore_args=restore_args)

    def load_meta(self) -> dict:
        with open(_meta_path(self.directory)) as f:
            return json.load(f)

    def has(self, tag: str = "last") -> bool:
        self._ckptr.wait_until_finished()
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
        checkpoint entered the top-k.

        Multi-host: the enter/is-best decision is made on process 0 (sole
        reader of ``scores.json``) and broadcast, so every process issues the
        identical collective orbax saves; sidecar writes and old-tag eviction
        stay on process 0."""
        import shutil

        if _is_primary():
            board = self.load_scores()
            ranked = [(float(s), t) for s, t in board["ranked"]]
            enter = not (len(ranked) >= keep and score >= ranked[-1][0])
            new_ranked = ranked
            is_best = False
            if enter:
                new_ranked = sorted(
                    ranked + [(float(score), f"best-{step}")], key=lambda st: st[0]
                )
                is_best = new_ranked[0][1] == f"best-{step}"
            decision = [float(enter), float(is_best)]
        else:
            board = None
            new_ranked = None
            decision = [0.0, 0.0]
        enter_f, is_best_f = _broadcast_decision(decision)
        if not enter_f:
            return False
        tag = f"best-{step}"
        self.save(state, tag)
        if is_best_f:
            self.save(state, "best")
        if _is_primary():
            for _, old_tag in new_ranked[keep:]:
                shutil.rmtree(self.path(old_tag), ignore_errors=True)
            board["ranked"] = [[s, t] for s, t in new_ranked[:keep]]
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
