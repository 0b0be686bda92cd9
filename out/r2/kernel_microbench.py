"""Micro-bench: one conv layer fwd+bwd across kernel variants on TPU."""
import time, json
import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from arreau_tpu.ops.pallas_conv import (
    fused_fiber_conv, fused_spatial_conv, make_gather_matrix, reference_fiber_conv,
)

B, A, K, O, D, C = 256, 16, 8, 16, 256, 200
TILE = 16
rng = np.random.default_rng(0)
basis = jnp.asarray(rng.normal(size=(B, A, K, O, D)) * 0.2, jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(D, C)) * 0.05, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(B, A, O, C)), jnp.bfloat16)
src = jnp.asarray(rng.integers(0, A, size=(B, A, K)), jnp.int32)
mask = jnp.asarray(rng.random((B, A, K)) > 0.3)
fk = jnp.asarray(rng.normal(size=(O, O, C)) * 0.2, jnp.bfloat16)

Bp = B // TILE
basis_om = basis.reshape(Bp, TILE, A, K, O, D).transpose(0, 4, 3, 1, 2, 5).reshape(Bp, O, K*TILE*A, D)
x_om = x.reshape(Bp, TILE, A, O, C).transpose(0, 3, 1, 2, 4).reshape(Bp, O, TILE*A, C)
sel = make_gather_matrix(src, mask, dtype=jnp.bfloat16, crystals_per_tile=TILE)

def v_fused(basis_om, w, x_om, fk):
    return (fused_fiber_conv(basis_om, w, x_om, sel, fk) ** 2).sum()

win = jnp.ones((Bp, K*TILE*A, 1), jnp.float32)

def v_split(basis_om, w, x_om, fk):
    x_sp = fused_spatial_conv(basis_om, w, x_om, sel, win)  # [B', O, TA, C]
    y = jnp.einsum("botc,opc->bptc", x_sp, fk.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return (y ** 2).sum()

def v_xla(basis_om, w, x_om, fk):
    # same layouts for fairness: do the gather/reduce in XLA from the om layout
    Bp_, O_, E_, D_ = basis_om.shape
    TA_ = x_om.shape[2]
    kern = jnp.einsum("boed,dc->boec", basis_om, w).astype(jnp.float32)
    xj = jnp.einsum("bet,botc->boec", sel.astype(jnp.float32), x_om.astype(jnp.float32))
    msg = (kern * xj).reshape(Bp_, O_, K, TA_, C)
    x_sp = msg.sum(axis=2)
    y = jnp.einsum("botc,opc->bptc", x_sp, fk.astype(jnp.float32))
    return (y ** 2).sum()

results = {}
for name, fn in [("fused", v_fused), ("split", v_split), ("xla", v_xla)]:
    vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2, 3)))
    out = vg(basis_om, w, x_om, fk); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = vg(basis_om, w, x_om, fk)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 30 * 1000
    # fwd only
    f = jax.jit(fn)
    o2 = f(basis_om, w, x_om, fk); jax.block_until_ready(o2)
    t0 = time.perf_counter()
    for _ in range(30):
        o2 = f(basis_om, w, x_om, fk)
    jax.block_until_ready(o2)
    ms_f = (time.perf_counter() - t0) / 30 * 1000
    results[name] = {"fwd_bwd_ms": round(ms, 3), "fwd_ms": round(ms_f, 3)}
    print(name, results[name], flush=True)

with open("out/r2/kernel_microbench.json", "w") as fjson:
    json.dump(results, fjson, indent=2)
