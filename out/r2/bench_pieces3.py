"""Bisect #3: isolate backbone fwd/bwd from the diffusion-loss wrapper."""
import time
import numpy as np
from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel

zt = synthetic_z_table()
cfg = DiffusionConfig(num_atomic_states=len(zt), compute_dtype="bfloat16")
model = DiffusionModel(cfg)
rng = np.random.default_rng(0)
host = make_synthetic_batch(rng, zt, 256, 16)
batch = CrystalBatch(*(jnp.asarray(a) for a in host))
params = model.init(jax.random.PRNGKey(0), batch)
key = jax.random.PRNGKey(1)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms", flush=True)
    return out


B, A = batch.frac_x.shape[:2]
t = jnp.full((B,), 500, jnp.int32)
onehot = jax.nn.one_hot(batch.atom_types, len(zt), dtype=jnp.float32)
from arreau_tpu.ops.lattice import matrix_to_params
lengths, angles = matrix_to_params(batch.lattice)
mask = batch.atom_mask

# 1. input assembly (incl. PBC graph build), no params
bi = jax.jit(lambda f, o: model._build_inputs(f, o, t, batch.num_atoms, lengths, angles, mask))
inputs = timeit("build_inputs_fwd", bi, batch.frac_x, onehot)

# 2. backbone forward
fwd = jax.jit(lambda p, inp: model.model.apply(p, inp).node_vec.sum())
timeit("backbone_fwd", fwd, params, inputs)

# 3. backbone fwd+bwd (params only)
def bb_loss(p, inp):
    out = model.model.apply(p, inp)
    return (
        out.node_vec.astype(jnp.float32).sum()
        + out.node_scalar.astype(jnp.float32).sum()
        + out.global_scalar.astype(jnp.float32).sum()
    )

vg = jax.jit(lambda p, inp: jax.value_and_grad(bb_loss)(p, inp))
timeit("backbone_fwd_bwd", vg, params, inputs)

# 4. full predict_scores fwd+bwd (adds noising-state input assembly under grad)
def ps_loss(p):
    eps, logits, l0 = model.predict_scores(
        p, batch.frac_x, onehot, t, batch.num_atoms, lengths, angles, mask
    )
    return (
        eps.astype(jnp.float32).sum()
        + logits.astype(jnp.float32).sum()
        + l0.astype(jnp.float32).sum()
    )

vg2 = jax.jit(jax.value_and_grad(ps_loss))
timeit("predict_scores_fwd_bwd", vg2, params)

# 5. full loss fwd+bwd (adds noising + 3 loss terms)
vg3 = jax.jit(lambda p, k: jax.value_and_grad(lambda q: model.loss(q, k, batch)[0])(p))
timeit("loss_fwd_bwd", vg3, params, key)
