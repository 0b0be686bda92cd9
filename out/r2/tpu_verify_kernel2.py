"""On-TPU parity artifact #2: the production SPLIT spatial kernel
(fused_spatial_conv, in-kernel window) fwd + grads vs the XLA oracle at the
canonical shape — regenerated after the dead-window-cotangent change."""
import json
import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from arreau_tpu.ops.pallas_conv import fused_spatial_conv, make_gather_matrix

assert jax.default_backend() == "tpu", jax.default_backend()

B, A, K, O, D, C = 256, 16, 8, 16, 256, 200
TILE = 16
rng = np.random.default_rng(0)
basis = jnp.asarray(rng.normal(size=(B, A, K, O, D)) * 0.3, jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(D, C)) * 0.06, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(B, A, O, C)), jnp.bfloat16)
src = jnp.asarray(rng.integers(0, A, size=(B, A, K)), jnp.int32)
mask = jnp.asarray(rng.random((B, A, K)) > 0.3)
win = jnp.asarray(rng.random((B, A, K)), jnp.float32)

Bp = B // TILE
E = K * TILE * A
basis_om = basis.reshape(Bp, TILE, A, K, O, D).transpose(0, 4, 3, 1, 2, 5).reshape(Bp, O, E, D)
x_om = x.reshape(Bp, TILE, A, O, C).transpose(0, 3, 1, 2, 4).reshape(Bp, O, TILE * A, C)
sel = make_gather_matrix(src, mask, dtype=jnp.bfloat16, crystals_per_tile=TILE)
win_km = win.reshape(Bp, TILE, A, K).transpose(0, 3, 1, 2).reshape(Bp, E, 1)


def oracle(basis_om, w, x_om, sel, win_km):
    kern = jnp.einsum("boed,dc->boec", basis_om, w).astype(jnp.float32)
    kern = kern * win_km[:, None, :, :]
    xj = jnp.einsum("bet,botc->boec", sel.astype(jnp.float32), x_om.astype(jnp.float32))
    msg = (kern * xj).reshape(Bp, O, K, TILE * A, C)
    return msg.sum(axis=2)


def loss_fused(basis_om, w, x_om, sel, win_km):
    return (fused_spatial_conv(basis_om, w, x_om, sel, win_km, window_grad=False) ** 2).sum()


def loss_oracle(basis_om, w, x_om, sel, win_km):
    return (oracle(basis_om, w, x_om, sel, win_km) ** 2).sum()


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b).max() + 1e-9)))


y_f = jax.jit(lambda b_, w_, x_, s_, wn: fused_spatial_conv(b_, w_, x_, s_, wn, window_grad=False))(
    basis_om, w, x_om, sel, win_km
)
y_o = jax.jit(oracle)(basis_om, w, x_om, sel, win_km)
report = {"fwd_max_rel": rel(y_f, y_o)}

gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(basis_om, w, x_om, sel, win_km)
go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))(basis_om, w, x_om, sel, win_km)
for name, a, b in zip(("dbasis", "dw", "dx"), gf, go):
    report[f"{name}_max_rel"] = rel(a, b)

# window cotangent (want_dwin path) still exact when requested
def loss_fused_win(b_, w_, x_, s_, wn):
    return (fused_spatial_conv(b_, w_, x_, s_, wn, window_grad=True) ** 2).sum()

gw_f = jax.jit(jax.grad(loss_fused_win, argnums=4))(basis_om, w, x_om, sel, win_km)
gw_o = jax.jit(jax.grad(loss_oracle, argnums=4))(basis_om, w, x_om, sel, win_km)
report["dwin_max_rel"] = rel(gw_f, gw_o)

print(json.dumps(report, indent=2))
with open("out/r2/pallas_tpu_parity2.json", "w") as f:
    json.dump(report, f, indent=2)
