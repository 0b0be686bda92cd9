"""Basis-bwd kernel round 2: GELU restructuring variants.

Round-4 anatomy (out/r4/queue3.log): v0 4.84 ms, no-GELU 2.63 ms — the two
jax.vjp(gelu) closures cost 2.2 ms of VPU work serialized against the MXU.
Candidates:

  v4_manual — hand-written single-tanh gelu fwd+derivative per site; the
              h2 site computes ONLY the derivative (the vjp closure also
              computes the forward gelu, which the kernel discards).
  v5_dsaved — ceiling probe for the "save gelu'(pre) from the forward"
              design: derivatives arrive as extra bf16 kernel inputs
              (d1 [E,H], d2 [E,D]); measures the bwd-side win INCLUDING the
              extra block reads (the fwd-side cost of producing them is a
              few fused VPU ops on tensors it already touches).

Usage: python out/r4/exp_basis_bwd2.py [v0_current v4_manual v5_dsaved]
"""
import sys
import time

import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arreau_tpu.ops.pallas_conv import _COMPILER_PARAMS, _dot_tn
from arreau_tpu.ops.pallas_basis import _poly_block_t, poly_selection_matrices

Bp, O, E, d = 32, 16, 1024, 6
H, D, degree, n_g = 200, 256, 3, 5
cdt = jnp.bfloat16

rng = np.random.default_rng(0)
attrT = jnp.asarray(rng.normal(size=(Bp, O, d, E)) * 0.3, cdt)
sels = poly_selection_matrices(d, degree)
F = sels[0].shape[1]
w1 = jnp.asarray(rng.normal(size=(F, H)) * 0.05, cdt)
b1 = jnp.asarray(rng.normal(size=(H,)) * 0.05, cdt)
w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, cdt)
b2 = jnp.asarray(rng.normal(size=(D,)) * 0.05, cdt)
gs = [jnp.asarray(rng.normal(size=(Bp, O, E, D)), cdt) for _ in range(n_g)]
d1_saved = jnp.asarray(rng.normal(size=(Bp, O, E, H)), cdt)
d2_saved = jnp.asarray(rng.normal(size=(Bp, O, E, D)), cdt)

C0 = 0.7978845608028654  # sqrt(2/pi)
C1 = 0.044715


def gelu_fwd_and_deriv(x):
    """One tanh: gelu(x) and gelu'(x) (tanh approximation, = jax.nn.gelu)."""
    u = C0 * (x + C1 * x * x * x)
    t = jnp.tanh(u)
    y = 0.5 * x * (1.0 + t)
    dy = 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * C0 * (1.0 + 3.0 * C1 * x * x)
    return y, dy


def gelu_deriv(x):
    u = C0 * (x + C1 * x * x * x)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * C0 * (1.0 + 3.0 * C1 * x * x)


def make_bwd(mode):
    n_extra = 2 if mode == "dsaved" else 0

    def kernel(sa_ref, sb_ref, sc_ref, attrT_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, *refs):
        g_refs = refs[:n_g]
        extra = refs[n_g:n_g + n_extra]
        dw1_ref, db1_ref, dw2_ref, db2_ref = refs[n_g + n_extra:]
        o = pl.program_id(1)
        f32 = jnp.float32

        @pl.when(o == 0)
        def _():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        poly = _poly_block_t(attrT_ref[0, 0], sa_ref, sb_ref, sc_ref)
        h1_pre = (jnp.dot(poly, w1_ref[:], preferred_element_type=f32)
                  + b1_ref[0].astype(f32)).astype(cdt)
        if mode == "vjp":
            h1, gelu1_vjp = jax.vjp(jax.nn.gelu, h1_pre)
            h2_pre = (jnp.dot(h1, w2_ref[:], preferred_element_type=f32)
                      + b2_ref[0].astype(f32)).astype(cdt)
            _, gelu2_vjp = jax.vjp(jax.nn.gelu, h2_pre)
        elif mode == "manual":
            h1, dg1 = gelu_fwd_and_deriv(h1_pre)
            h2_pre = (jnp.dot(h1, w2_ref[:], preferred_element_type=f32)
                      + b2_ref[0].astype(f32)).astype(cdt)
            dg2 = gelu_deriv(h2_pre)
        else:  # dsaved
            d1b, d2b = extra
            dg1 = d1b[0, 0]
            h1, _ = gelu_fwd_and_deriv(h1_pre)  # still need h1 for dw2/h2
            dg2 = d2b[0, 0]

        g = g_refs[0][0, 0].astype(f32)
        for gr in g_refs[1:]:
            g = g + gr[0, 0].astype(f32)
        if mode == "vjp":
            (dpre2,) = gelu2_vjp(g.astype(cdt))
        else:
            dpre2 = (g * dg2.astype(f32)).astype(cdt)
        dw2_ref[0] += _dot_tn(h1, dpre2)
        db2_ref[0, 0] += jnp.sum(dpre2.astype(f32), axis=0)
        dh1 = jax.lax.dot_general(
            dpre2, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32
        ).astype(cdt)
        if mode == "vjp":
            (dpre1,) = gelu1_vjp(dh1)
        else:
            dpre1 = (dh1.astype(f32) * dg1.astype(f32)).astype(cdt)
        dw1_ref[0] += _dot_tn(poly, dpre1)
        db1_ref[0, 0] += jnp.sum(dpre1.astype(f32), axis=0)

    g_spec = pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0),
                          memory_space=pltpu.VMEM)
    d1_spec = pl.BlockSpec((1, 1, E, H), lambda b, o: (b, o, 0, 0),
                           memory_space=pltpu.VMEM)

    def run(attrT, gs):
        sa, sb, sc = (jnp.asarray(s, cdt) for s in sels)
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec((1, 1, d, E), lambda b, o: (b, o, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [g_spec] * n_g
        args = [sa, sb, sc, attrT, w1.reshape(F, H), b1.reshape(1, -1),
                w2, b2.reshape(1, -1), *gs]
        if n_extra:
            in_specs += [d1_spec, g_spec]
            args += [d1_saved, d2_saved]
        return pl.pallas_call(
            kernel,
            grid=(Bp, O),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, F, H), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, H), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, D), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, F, H), jnp.float32),
                jax.ShapeDtypeStruct((Bp, 1, H), jnp.float32),
                jax.ShapeDtypeStruct((Bp, H, D), jnp.float32),
                jax.ShapeDtypeStruct((Bp, 1, D), jnp.float32),
            ],
            compiler_params=_COMPILER_PARAMS,
        )(*args)

    return run


def chain(run, n):
    @jax.jit
    def f(attrT, gs):
        def body(carry, _):
            outs = run(carry, gs)
            s = outs[0].sum().astype(cdt)
            return carry + 1e-30 * s, s
        final, ss = jax.lax.scan(body, attrT, None, length=n)
        return ss.sum()
    return f


def measure(name, run):
    # short chains: the remote-compile service rejects large program uploads
    # (HTTP 413) — 5/25 keeps the payload under its limit
    f10, f60 = chain(run, 5), chain(run, 25)
    jax.device_get(f10(attrT, gs))
    jax.device_get(f60(attrT, gs))
    t0 = time.perf_counter(); jax.device_get(f10(attrT, gs)); t10 = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.device_get(f60(attrT, gs)); t60 = time.perf_counter() - t0
    ms = (t60 - t10) / 20 * 1e3
    print(f"{name}: {ms:.3f} ms/call  (t10={t10*1e3:.1f}ms t60={t60*1e3:.1f}ms)", flush=True)
    return ms


MODES = {"v0_current": "vjp", "v4_manual": "manual", "v5_dsaved": "dsaved"}
which = sys.argv[1:] or list(MODES)
# numerical sanity of the manual formulas vs jax (host-side, tiny)
x = jnp.linspace(-4, 4, 101, dtype=jnp.float32)
y, dy = gelu_fwd_and_deriv(x)
np.testing.assert_allclose(np.asarray(y), np.asarray(jax.nn.gelu(x)), rtol=2e-6, atol=2e-6)
np.testing.assert_allclose(
    np.asarray(dy), np.asarray(jax.vmap(jax.grad(jax.nn.gelu))(x)), rtol=2e-5, atol=2e-5
)
print("manual gelu formulas match jax.nn.gelu + grad", flush=True)
for name in which:
    measure(f"{name:11s}", make_bwd(MODES[name]))
