"""Bisect the train step: time jitted subgraphs at the canonical shape."""
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
from arreau_tpu.ops.lattice import frac_to_cart
from arreau_tpu.ops.pbc import pbc_neighbor_list

zt = synthetic_z_table()
cfg = DiffusionConfig(num_atomic_states=len(zt), compute_dtype="bfloat16")
model = DiffusionModel(cfg)
rng = np.random.default_rng(0)
host = make_synthetic_batch(rng, zt, 256, 16)
batch = CrystalBatch(*(jnp.asarray(a) for a in host))
params = model.init(jax.random.PRNGKey(0), batch)
tx = make_optimizer(3e-4)
state = create_train_state(params, tx, ema_decay=None)

def timeit(name, fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out

# 1. graph build fwd
cart = frac_to_cart(batch.frac_x, batch.lattice)
nl_fn = jax.jit(lambda c, l, m: pbc_neighbor_list(c, l, m, 5.0, 8))
timeit("graph_build_fwd", nl_fn, cart, batch.lattice, batch.atom_mask)

# 2. loss fwd only
key = jax.random.PRNGKey(1)
loss_fwd = jax.jit(lambda p, k, b: model.loss(p, k, b)[0])
timeit("loss_fwd", loss_fwd, params, key, batch)

# 3. value_and_grad
vg = jax.jit(lambda p, k, b: jax.value_and_grad(lambda q: model.loss(q, k, b)[0])(p))
timeit("loss_fwd_bwd", vg, params, key, batch)

# 4. full train step
step = make_train_step(model.loss, tx, donate=False)
timeit("train_step", step, state, key, batch)
