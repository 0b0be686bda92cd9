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


@pytest.mark.slow
def test_restore_raw_across_topologies(tmp_path):
    """A checkpoint saved on the 8-device mesh must restore template-less on
    a 1-device host (train on a pod -> generate on one chip). Orbax records
    save-time device shardings; restore_raw falls back to host-numpy reads
    when those devices don't exist."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.train.checkpoint import CheckpointManager

    assert len(jax.devices()) == 8  # save under the full test mesh
    ckpt_dir = str(tmp_path / "ckpt")
    state = {"params": {"w": jnp.arange(12.0).reshape(3, 4)}, "step": jnp.int32(7)}
    ckpt = CheckpointManager(ckpt_dir, meta={"config": {}})
    ckpt.save(state, "last")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device in the child
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    code = (
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # beat the axon plugin
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from arreau_tpu.train.checkpoint import CheckpointManager\n"
        f"raw = CheckpointManager({ckpt_dir!r}).restore_raw('last')\n"
        "w = np.asarray(raw['params']['w'])\n"
        "np.testing.assert_array_equal(w, np.arange(12.0).reshape(3, 4))\n"
        "assert int(np.asarray(raw['step'])) == 7\n"
        "print('CHILD_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "CHILD_OK" in out.stdout
