"""Finer bisect of the canonical train step (round-2 continuation):
graph build / basis MLPs / backbone fwd / loss fwd / fwd+bwd / optimizer.
"""
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
from arreau_tpu.train.state import apply_gradients, create_train_state
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
key = jax.random.PRNGKey(1)


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

# 2. basis MLP fwd alone at canonical rows (both MLPs run on [B',O,E,6]-ish)
from arreau_tpu.models.blocks import BasisMLP
Bp, O, E = 16, 16, 8 * 16 * 16
attr = jnp.asarray(rng.normal(size=(Bp, O, E, 6)), jnp.bfloat16)
bm = BasisMLP(200, 256, 3, dtype=jnp.bfloat16)
bp = bm.init(jax.random.PRNGKey(2), attr)
bfwd = jax.jit(lambda p, a: bm.apply(p, a))
timeit("basis_mlp_fwd", bfwd, bp, attr)
bvg = jax.jit(lambda p, a: jax.value_and_grad(lambda q: (bm.apply(q, a) ** 2).sum())(p))
timeit("basis_mlp_fwd_bwd", bvg, bp, attr)

# 3. loss fwd only
loss_fwd = jax.jit(lambda p, k, b: model.loss(p, k, b)[0])
timeit("loss_fwd", loss_fwd, params, key, batch)

# 4. value_and_grad
vg = jax.jit(lambda p, k, b: jax.value_and_grad(lambda q: model.loss(q, k, b)[0])(p))
(_, grads) = timeit("loss_fwd_bwd", vg, params, key, batch)

# 5. optimizer+EMA alone
state_ema = create_train_state(params, tx, ema_decay=0.999)
opt_fn = jax.jit(lambda s, g: apply_gradients(s, g, tx))
timeit("optimizer_ema", opt_fn, state_ema, grads)

# 6. full train step
step = make_train_step(model.loss, tx, donate=False)
timeit("train_step", step, state, key, batch)
