"""Capture a jax.profiler trace of the canonical train step (B=256, A=16)."""
import time
import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel
from arreau_tpu.train.loop import make_train_step
from arreau_tpu.train.optim import make_optimizer
from arreau_tpu.train.state import create_train_state

zt = synthetic_z_table()
cfg = DiffusionConfig(num_atomic_states=len(zt), compute_dtype="bfloat16")
model = DiffusionModel(cfg)
rng = np.random.default_rng(0)
host = make_synthetic_batch(rng, zt, 256, 16)
batch = CrystalBatch(*(jnp.asarray(a) for a in host))
params = model.init(jax.random.PRNGKey(0), batch)
tx = make_optimizer(3e-4)
state = create_train_state(params, tx, ema_decay=None)
step = make_train_step(model.loss, tx, donate=True)

key = jax.random.PRNGKey(1)
for _ in range(5):
    key, sub = jax.random.split(key)
    state, metrics = step(state, sub, batch)
jax.block_until_ready(metrics["loss"])

with jax.profiler.trace("/root/repo/out/r3/trace"):
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])

t0 = time.perf_counter()
for _ in range(30):
    key, sub = jax.random.split(key)
    state, metrics = step(state, sub, batch)
jax.block_until_ready(metrics["loss"])
print(f"step: {(time.perf_counter()-t0)/30*1000:.2f} ms")

txt = step.lower(state, jax.random.PRNGKey(1), batch).compile().as_text()
with open("out/r3/train_step_hlo.txt", "w") as f:
    f.write(txt)
print("hlo:", len(txt), "bytes")
