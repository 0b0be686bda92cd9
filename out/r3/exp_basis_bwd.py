"""Microbench: basis-MLP fused backward kernel — where do 4.8 ms go?

Variants at the canonical shape (Bp=32 O=16 E=1024 d=6 F=258 H=200 D=256,
5 bf16 cotangents):
  v0_current   — production _multi_bwd
  v1_nogelu    — GELUs replaced by identity (measures the VPU share that
                 Mosaic serializes against the MXU matmuls)
  v2_nosel     — polynomial recompute dropped (poly := broadcast of attr
                 rows; wrong numerics, measures the selection-matmul share)
Timing: lax.scan chain with a data dependence between iterations, one
device_get sync; difference of two chain lengths (tunnel-safe).
"""
import time
from functools import partial

import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arreau_tpu.ops.pallas_conv import _COMPILER_PARAMS, _dot_tn
from arreau_tpu.ops.pallas_basis import (
    _poly_block_t,
    poly_selection_matrices,
)

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


def make_bwd(act, with_sel):
    def kernel(sa_ref, sb_ref, sc_ref, attrT_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, *refs):
        g_refs = refs[:n_g]
        dw1_ref, db1_ref, dw2_ref, db2_ref = refs[n_g:]
        o = pl.program_id(1)
        f32 = jnp.float32

        @pl.when(o == 0)
        def _():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        if with_sel:
            poly = _poly_block_t(attrT_ref[0, 0], sa_ref, sb_ref, sc_ref)
        else:
            # wrong numerics: one selection matmul instead of three
            a = attrT_ref[0, 0]
            s = sa_ref[:]
            poly = (jax.lax.dot_general(
                a, s[:d], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + s[d]).astype(a.dtype)
        h1_pre = (jnp.dot(poly, w1_ref[:], preferred_element_type=f32)
                  + b1_ref[0].astype(f32)).astype(cdt)
        h1, gelu1_vjp = jax.vjp(act, h1_pre)
        h2_pre = (jnp.dot(h1, w2_ref[:], preferred_element_type=f32)
                  + b2_ref[0].astype(f32)).astype(cdt)
        _, gelu2_vjp = jax.vjp(act, h2_pre)

        g = g_refs[0][0, 0].astype(f32)
        for gr in g_refs[1:]:
            g = g + gr[0, 0].astype(f32)
        (dpre2,) = gelu2_vjp(g.astype(cdt))
        dw2_ref[0] += _dot_tn(h1, dpre2)
        db2_ref[0, 0] += jnp.sum(dpre2.astype(f32), axis=0)
        dh1 = jax.lax.dot_general(
            dpre2, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32
        ).astype(cdt)
        (dpre1,) = gelu1_vjp(dh1)
        dw1_ref[0] += _dot_tn(poly, dpre1)
        db1_ref[0, 0] += jnp.sum(dpre1.astype(f32), axis=0)

    g_spec = pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0),
                          memory_space=pltpu.VMEM)

    def run(attrT, gs):
        sa, sb, sc = (jnp.asarray(s, cdt) for s in sels)
        return pl.pallas_call(
            kernel,
            grid=(Bp, O),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d, E), lambda b, o: (b, o, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ] + [g_spec] * n_g,
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
        )(sa, sb, sc, attrT, w1.reshape(F, H), b1.reshape(1, -1),
          w2, b2.reshape(1, -1), *gs)

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
    f10, f60 = chain(run, 10), chain(run, 60)
    jax.device_get(f10(attrT, gs))  # compile + warm
    jax.device_get(f60(attrT, gs))
    t0 = time.perf_counter(); jax.device_get(f10(attrT, gs)); t10 = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.device_get(f60(attrT, gs)); t60 = time.perf_counter() - t0
    ms = (t60 - t10) / 50 * 1e3
    print(f"{name}: {ms:.3f} ms/call  (t10={t10*1e3:.1f}ms t60={t60*1e3:.1f}ms)")
    return ms


import sys

gelu = jax.nn.gelu
ident = lambda x: x
VARIANTS = {
    "v0_current": (gelu, True),
    "v1_nogelu": (ident, True),
    "v2_onesel": (gelu, False),
    "v3_neither": (ident, False),
}
which = sys.argv[1:] or list(VARIANTS)
for name in which:
    act, ws = VARIANTS[name]
    measure(f"{name:11s}", make_bwd(act, ws))
