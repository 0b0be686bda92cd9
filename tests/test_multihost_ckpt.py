"""Multi-host checkpoint correctness: two real jax.distributed CPU processes
share one checkpoint directory. Process-0-only sidecar IO (meta.json,
scores.json, eviction) + collective orbax saves with broadcast ranked
decisions must produce one consistent checkpoint tree (the scenario that
corrupted naive per-process writes). Reference analog: Lightning rank-zero
ModelCheckpoint (/root/reference/main_diffusion.py:268-276)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_checkpointing(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    worker = os.path.join(os.path.dirname(__file__), "multihost_ckpt_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", "2", str(pid), ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK pid={pid}" in out
    # exactly one consistent sidecar set on disk
    assert os.path.exists(os.path.join(ckpt_dir, "meta.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "scores.json"))
