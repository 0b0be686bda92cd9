"""Step-time sweep over XLA TPU scheduling flags.

The phase table attributes ~2.2 ms/step to exposed async-copy waits
(f32 LayerNorm-stat blocks staged through scoped VMEM S(1), 16 MB scoped
window in the compiled HLO's backend_config). Sweep the scoped-vmem limit
(deeper prefetch pipelines) and retiming knobs to see if the waits hide.

Usage: python out/r3/exp_vmem_flags.py [label flags...]
  e.g. python out/r3/exp_vmem_flags.py vmem64 --xla_tpu_scoped_vmem_limit_kib=65536
Run each variant in a FRESH process (XLA_FLAGS is read at backend init).
"""
import os
import sys
import time

label = sys.argv[1] if len(sys.argv) > 1 else "default"
extra = " ".join(sys.argv[2:])
if extra:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + extra).strip()

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
cfg = DiffusionConfig(
    num_atomic_states=len(zt), compute_dtype="bfloat16",
    stacked_readout=os.environ.get("ARREAU_STACKED_READOUT", "1") != "0",
)
model = DiffusionModel(cfg)
rng = np.random.default_rng(0)
host = make_synthetic_batch(rng, zt, 256, 16)
batch = CrystalBatch(*(jnp.asarray(a) for a in host))
params = model.init(jax.random.PRNGKey(0), batch)
tx = make_optimizer(3e-4)
state = create_train_state(params, tx, ema_decay=None)
step = make_train_step(model.loss, tx, donate=True)

key = jax.random.PRNGKey(1)
for _ in range(8):
    key, sub = jax.random.split(key)
    state, metrics = step(state, sub, batch)
jax.block_until_ready(metrics["loss"])

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])
    best = min(best, (time.perf_counter() - t0) / 30 * 1000)
print(f"{label}: {best:.2f} ms/step  (XLA_FLAGS={os.environ.get('XLA_FLAGS','')!r})")
