"""On-TPU parity artifact for the fused fiber-conv kernel (VERDICT r1 #8):
fwd + grad vs the XLA oracle at the canonical shape, compiled natively."""
import json
import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from arreau_tpu.ops.pallas_conv import (
    fused_fiber_conv, make_gather_matrix, reference_fiber_conv,
)

assert jax.default_backend() == "tpu", jax.default_backend()

B, A, K, O, D, C = 256, 16, 8, 16, 256, 200  # canonical config
TILE = 16
rng = np.random.default_rng(0)
basis = jnp.asarray(rng.normal(size=(B, A, K, O, D)) * 0.3, jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(D, C)) * 0.06, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(B, A, O, C)), jnp.bfloat16)
src = jnp.asarray(rng.integers(0, A, size=(B, A, K)), jnp.int32)
mask = jnp.asarray(rng.random((B, A, K)) > 0.3)
fk = jnp.asarray(rng.normal(size=(O, O, C)) * 0.2, jnp.bfloat16)

Bp = B // TILE
basis_om = basis.reshape(Bp, TILE, A, K, O, D).transpose(0, 4, 3, 1, 2, 5).reshape(Bp, O, K*TILE*A, D)
x_om = x.reshape(Bp, TILE, A, O, C).transpose(0, 3, 1, 2, 4).reshape(Bp, O, TILE*A, C)
sel = make_gather_matrix(src, mask, dtype=jnp.bfloat16, crystals_per_tile=TILE)

def loss_p(basis_om, w, x_om, fk):
    return (fused_fiber_conv(basis_om, w, x_om, sel, fk).astype(jnp.float32) ** 2).sum()

def loss_r(basis, w, x, fk):
    return (reference_fiber_conv(basis, w, x, src, mask, fk) ** 2).sum()

yp = jax.jit(lambda *a: fused_fiber_conv(*a))(basis_om, w, x_om, sel, fk)
yp = np.asarray(yp).reshape(Bp, O, TILE, A, C).transpose(0, 2, 3, 1, 4).reshape(B, A, O, C)
yr = np.asarray(jax.jit(reference_fiber_conv)(basis, w, x, src, mask, fk))
fwd_rel = float(np.abs(yp - yr).max() / (np.abs(yr).max() + 1e-9))

gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(basis_om, w, x_om, fk)
gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(basis, w, x, fk)
# map the fused grads back to standard layout for comparison
gb = np.asarray(gp[0].astype(jnp.float32)).reshape(Bp, O, K, TILE, A, D).transpose(0, 3, 4, 2, 1, 5).reshape(B, A, K, O, D)
gx = np.asarray(gp[2].astype(jnp.float32)).reshape(Bp, O, TILE, A, C).transpose(0, 2, 3, 1, 4).reshape(B, A, O, C)
rels = {
    "fwd": fwd_rel,
    "dbasis": float(np.abs(gb - np.asarray(gr[0], np.float32)).max() / (np.abs(np.asarray(gr[0], np.float32)).max() + 1e-9)),
    "dw": float(np.abs(np.asarray(gp[1], np.float32) - np.asarray(gr[1], np.float32)).max() / (np.abs(np.asarray(gr[1], np.float32)).max() + 1e-9)),
    "dx": float(np.abs(gx - np.asarray(gr[2], np.float32)).max() / (np.abs(np.asarray(gr[2], np.float32)).max() + 1e-9)),
    "dfk": float(np.abs(np.asarray(gp[3], np.float32) - np.asarray(gr[3], np.float32)).max() / (np.abs(np.asarray(gr[3], np.float32)).max() + 1e-9)),
}
print(json.dumps({"pallas_tpu_parity_max_rel": rels, "shape": [B, A, K, O, D, C], "tile": TILE, "dtype": "bfloat16"}))
with open("/root/repo/out/r2/pallas_tpu_parity.json", "w") as f:
    json.dump(rels, f, indent=2)
# bf16 tolerance: both paths accumulate in f32 but round operands to bf16
assert all(v < 0.05 for v in rels.values()), rels
print("PALLAS TPU PARITY OK")
