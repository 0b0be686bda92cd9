"""Experiment: iterative top-K (already in tree) + basis_bias False vs True."""
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
rng = np.random.default_rng(0)
host = make_synthetic_batch(rng, zt, 256, 16)
batch = CrystalBatch(*(jnp.asarray(a) for a in host))
key = jax.random.PRNGKey(1)


def bench_cfg(name, **kw):
    cfg = DiffusionConfig(num_atomic_states=len(zt), compute_dtype="bfloat16", **kw)
    model = DiffusionModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(3e-4)
    state = create_train_state(params, tx, ema_decay=0.999)
    step = make_train_step(model.loss, tx, donate=False)
    out = step(state, key, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 40
    for _ in range(n):
        out = step(state, key, batch)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {ms:.2f} ms/step ({1000/ms:.2f} steps/s)", flush=True)


bench_cfg("bias=True (new topk)")
bench_cfg("bias=False (new topk)", basis_bias=False)
