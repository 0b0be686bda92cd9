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
vg = jax.jit(lambda p, k, b: jax.value_and_grad(lambda q: model.loss(q, k, b)[0])(p))
out = vg(params, key, batch); jax.block_until_ready(out)
jax.profiler.start_trace("/root/repo/out/r2/profile_trace2")
for _ in range(5):
    out = vg(params, key, batch)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace done")
