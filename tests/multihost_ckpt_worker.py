"""Worker for the 2-process multi-host checkpoint test (see
test_multihost_ckpt.py). Each process joins a jax.distributed CPU cluster,
builds a replicated TrainState over the 2-device global mesh, and exercises
CheckpointManager: meta write, save_ranked (enter + non-enter + new-best),
last save, restore round-trip.

Usage: python multihost_ckpt_worker.py <coordinator> <num_procs> <pid> <dir>
"""

import sys

coordinator, num_procs, pid, ckpt_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=pid
)
assert jax.process_count() == num_procs, jax.process_count()

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arreau_tpu.train.checkpoint import CheckpointManager
from arreau_tpu.train.state import create_train_state

mesh = Mesh(np.array(jax.devices()), ("dp",))
replicated = NamedSharding(mesh, P())

params = {
    "w": jax.device_put(jnp.arange(8, dtype=jnp.float32), replicated),
    "b": jax.device_put(jnp.ones((3,), jnp.float32) * (1 + 1), replicated),
}
tx = optax.adam(1e-3)
state = create_train_state(params, tx, ema_decay=0.99)

ckpt = CheckpointManager(ckpt_dir, meta={"config": {"hidden": 4}, "z_table_zs": [1, 2001]})

# 1) first ranked save enters and becomes best
assert ckpt.save_ranked(state, score=1.0, step=1, keep=2) is True
# 2) worse score with a full board of 1 -> still enters (keep=2)
state2 = state._replace(step=state.step + 1)
assert ckpt.save_ranked(state2, score=2.0, step=2, keep=2) is True
# 3) even worse score with full board -> rejected on every process
state3 = state2._replace(step=state2.step + 1)
assert ckpt.save_ranked(state3, score=3.0, step=3, keep=2) is False
# 4) new best -> enters, updates 'best', evicts the worst tag
state4 = state3._replace(step=state3.step + 1)
assert ckpt.save_ranked(state4, score=0.5, step=4, keep=2) is True

ckpt.save(state4, "last")

restored = ckpt.restore(state4, "last")
np.testing.assert_allclose(
    np.asarray(restored.params["w"]), np.asarray(params["w"])
)
assert int(restored.step) == int(state4.step)

# scoreboard is consistent and written exactly once (process 0)
if jax.process_index() == 0:
    board = ckpt.load_scores()
    tags = [t for _, t in board["ranked"]]
    assert tags == ["best-4", "best-1"], tags
    assert ckpt.best_score() == 0.5
    assert ckpt.has("best") and ckpt.has("last")
    import os

    assert not os.path.exists(ckpt.path("best-2")), "worst tag not evicted"

print(f"OK pid={pid}")
