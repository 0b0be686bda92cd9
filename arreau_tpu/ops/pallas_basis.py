"""Fused Pallas TPU kernel for the basis MLP (polynomial features -> Dense ->
GELU -> Dense -> GELU) in the conv-kernel layout.

The edge-basis tensor ``[B', O, E, D]`` is the largest intermediate of the
backbone (~268 MB at the canonical shape). The XLA lowering of the basis MLP
materializes the degree-3 polynomial expansion (~275 MB), a layout copy of
it, both Dense outputs, and — in the backward pass — a slow loop fusion for
the GELU backward chain; profiled together at ~6 ms/step out of 36.

This kernel computes the whole chain per ``(b', o)`` grid cell with only the
TINY attribute block ``[E, d+1]`` read from HBM and only the final basis
block written (backward: only the two weight-gradient partials written):

  * **Polynomial features as matmuls**: the tensor-power features
    ``[x, x (x) x, x (x) x (x) x]`` (models/blocks.py:polynomial_features) are
    monomials ``x_a * x_b * x_c``.  With a ones-channel appended to the
    attributes, three constant one-hot selection matrices ``S_A, S_B, S_C``
    of shape ``[d+1, F]`` give ``poly = (attr1 @ S_A) * (attr1 @ S_B) *
    (attr1 @ S_C)`` — two MXU-trivial matmuls and two lane-wide elementwise
    multiplies, in exactly the reference feature order.
  * Forward: ``basis = gelu(gelu(poly @ W1) @ W2)`` accumulated in f32.
  * Backward: recomputes the forward per block and emits per-``b'`` partials
    of ``dW1``/``dW2`` (accumulated across the inner ``o`` axis, summed
    outside). **No attribute cotangent is produced**: attributes are
    functions of data (positions/lattice) only, never of parameters, so
    their gradient is dead in every training path here (the custom VJP
    returns zeros for it).

**Measured result (v5e, canonical shape): ~3 ms/step SLOWER than the XLA
chain** — the ``[E, d+1] @ [d+1, F]`` selection matmuls pad their tiny
contraction dimension to 128 on the MXU (18x wasted passes), and the
in-kernel bf16 GELU tanh chains on the VPU cost more than XLA's fused
matmul epilogues. Kept as an opt-in (``BasisMLP(fused=True)``) with full
parity tests, documenting the negative result; the flax path remains the
production implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arreau_tpu.ops.pallas_conv import _COMPILER_PARAMS, _interpret, _dot_tn


def poly_selection_matrices(d: int, degree: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-hot ``[d+1, F]`` factor-selection matrices reproducing the exact
    column order of ``polynomial_features`` (blocks.py): degree-1 block, then
    the flattened outer-product blocks. Index ``d`` is the ones-channel."""
    if degree < 1 or degree > 3:
        raise ValueError(f"fused basis MLP supports degree 1..3, got {degree}")
    cols = []
    for f in range(d):
        cols.append((f, d, d))
    if degree >= 2:
        for a in range(d):
            for b in range(d):
                cols.append((a, b, d))
    if degree >= 3:
        for a in range(d):
            for b in range(d):
                for c in range(d):
                    cols.append((a, b, c))
    F = len(cols)
    sel = np.zeros((3, d + 1, F), np.float32)
    for f, abc in enumerate(cols):
        for i, a in enumerate(abc):
            sel[i, a, f] = 1.0
    return sel[0], sel[1], sel[2]


def _poly_block(attr1, sa_ref, sb_ref, sc_ref):
    """[E, d+1] -> [E, F] polynomial features via selection matmuls."""
    f32 = jnp.float32
    A = jnp.dot(attr1, sa_ref[:], preferred_element_type=f32)
    B = jnp.dot(attr1, sb_ref[:], preferred_element_type=f32)
    C = jnp.dot(attr1, sc_ref[:], preferred_element_type=f32)
    return (A * B * C).astype(attr1.dtype)


def _poly_block_t(attrT, sa_ref, sb_ref, sc_ref):
    """[d, E] (lane-major attrs) -> [E, F] polynomial features.

    The ones-channel never materializes: for the ``[d+1, F]`` one-hot
    selection matrix ``S``, ``attr1 @ S == attrT^T @ S[:d] + S[d]`` (the
    bottom row is 1 exactly on columns whose factor is the constant). The
    transposed contraction (dim 0 of both operands) is the MXU-native
    stationary-operand form — no in-kernel relayout of the attr block."""
    f32 = jnp.float32
    d = attrT.shape[0]
    dn = (((0,), (0,)), ((), ()))

    def term(s_ref):
        s = s_ref[:]
        return jax.lax.dot_general(
            attrT, s[:d], dn, preferred_element_type=f32
        ) + s[d]

    A, B, C = term(sa_ref), term(sb_ref), term(sc_ref)
    return (A * B * C).astype(attrT.dtype)


def _fwd_kernel(sa_ref, sb_ref, sc_ref, attr_ref, w1_ref, w2_ref, out_ref):
    # GELUs run in the compute dtype (bf16): the f32 tanh chain on the VPU
    # costs ~2x and the flax path computes them in bf16 anyway
    f32 = jnp.float32
    cdt = w1_ref.dtype
    poly = _poly_block(attr_ref[0, 0], sa_ref, sb_ref, sc_ref)
    h = jax.nn.gelu(jnp.dot(poly, w1_ref[:], preferred_element_type=f32).astype(cdt))
    basis = jax.nn.gelu(jnp.dot(h, w2_ref[:], preferred_element_type=f32).astype(cdt))
    out_ref[0, 0] = basis.astype(out_ref.dtype)


def _bwd_kernel(sa_ref, sb_ref, sc_ref, attr_ref, w1_ref, w2_ref, g_ref,
                dw1_ref, dw2_ref):
    o = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(o == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    cdt = w1_ref.dtype
    poly = _poly_block(attr_ref[0, 0], sa_ref, sb_ref, sc_ref)
    h_pre = jnp.dot(poly, w1_ref[:], preferred_element_type=f32).astype(cdt)
    h, gelu1_vjp = jax.vjp(jax.nn.gelu, h_pre)
    b_pre = jnp.dot(h, w2_ref[:], preferred_element_type=f32).astype(cdt)
    _, gelu2_vjp = jax.vjp(jax.nn.gelu, b_pre)

    g = g_ref[0, 0].astype(cdt)
    (db_pre,) = gelu2_vjp(g)
    dw2_ref[0] += _dot_tn(h, db_pre)
    dh = jax.lax.dot_general(
        db_pre, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(cdt)  # [E, H] = db_pre @ W2^T
    (dh_pre,) = gelu1_vjp(dh)
    dw1_ref[0] += _dot_tn(poly, dh_pre)


def _fwd(attr1, w1, w2, sels, out_dtype):
    Bp, O, E, d1 = attr1.shape
    F, H = w1.shape
    D = w2.shape[1]
    sa, sb, sc = (jnp.asarray(s, attr1.dtype) for s in sels)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, d1), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, O, E, D), out_dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sa, sb, sc, attr1, w1, w2)


def _bwd(attr1, w1, w2, sels, g):
    Bp, O, E, d1 = attr1.shape
    F, H = w1.shape
    D = w2.shape[1]
    sa, sb, sc = (jnp.asarray(s, attr1.dtype) for s in sels)
    dw1p, dw2p = pl.pallas_call(
        _bwd_kernel,
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, d1), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, F, H), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, F, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H, D), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sa, sb, sc, attr1, w1, w2, g)
    return dw1p.sum(axis=0).astype(w1.dtype), dw2p.sum(axis=0).astype(w2.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_basis_mlp(attr, w1, w2, degree, out_dtype):
    """``gelu(gelu(poly_features(attr, degree) @ w1) @ w2)`` fused in VMEM.

    attr: ``[B', O, E, d]`` invariant attributes (kernel layout).
    w1: ``[F, H]``; w2: ``[H, D]`` (bias-free basis MLP weights, already in
    compute dtype). Returns ``[B', O, E, D]`` in ``out_dtype``.

    The attribute cotangent is NOT computed (zeros): attributes derive from
    data only. Do not use under gradients wrt positions/lattice.
    """
    d = attr.shape[-1]
    sels = poly_selection_matrices(d, degree)
    ones = jnp.ones((*attr.shape[:-1], 1), attr.dtype)
    attr1 = jnp.concatenate([attr, ones], axis=-1)
    return _fwd(attr1, w1, w2, sels, out_dtype)


def _vjp_fwd(attr, w1, w2, degree, out_dtype):
    return fused_basis_mlp(attr, w1, w2, degree, out_dtype), (attr, w1, w2)


def _vjp_bwd(degree, out_dtype, res, g):
    attr, w1, w2 = res
    d = attr.shape[-1]
    sels = poly_selection_matrices(d, degree)
    ones = jnp.ones((*attr.shape[:-1], 1), attr.dtype)
    attr1 = jnp.concatenate([attr, ones], axis=-1)
    dw1, dw2 = _bwd(attr1, w1, w2, sels, g.astype(jnp.float32))
    return jnp.zeros_like(attr), dw1, dw2


fused_basis_mlp.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Multi-consumer basis MLP with a fused Pallas BACKWARD (round-3 production
# path). The forward stays the plain XLA chain (bit-identical numerics to the
# flax BasisMLP); the custom VJP hands the N conv layers' dbasis cotangents
# DIRECTLY to one Pallas kernel that fuses, per (b', o) block:
#
#   g = sum_i g_i                  (the 5-way add that XLA materializes as a
#                                   ~1.9 GB bandwidth-bound loop fusion)
#   gelu-backward of both layers   (VPU, VMEM-resident)
#   dW2 += h1^T @ dpre2, db2 += colsum(dpre2)
#   dh1  = dpre2 @ W2^T
#   dW1 += poly^T @ dpre1, db1 += colsum(dpre1)
#
# No attribute/poly cotangent is produced: attributes derive from positions/
# lattice only, which no training path differentiates. Profiled motivation:
# out/r3 phase table — basis_mlp_bwd was 5.23 ms/step, 2.78 ms of which was
# the dbasis-sum + GELU-backward loop fusion running at ~84% of HBM
# speed-of-light; this kernel reads each cotangent exactly once.
# ---------------------------------------------------------------------------


_GELU_C0 = 0.7978845608028654  # sqrt(2/pi)
_GELU_C1 = 0.044715


def _gelu_fwd_and_deriv(x):
    """One-tanh gelu(x) AND gelu'(x) (tanh approximation == jax.nn.gelu).

    ``jax.vjp(jax.nn.gelu, x)`` builds two traced passes whose Mosaic
    lowering re-evaluates the tanh chain; measured on-chip the two vjp
    closures cost 2.2 ms/step of VPU work serialized against the MXU
    (out/r4/queue3.log v1_nogelu). Sharing a single tanh between value and
    derivative cut the kernel 5.10 -> 4.23 ms (out/r4/exp_basis_bwd2.log).
    """
    u = _GELU_C0 * (x + _GELU_C1 * x * x * x)
    t = jnp.tanh(u)
    y = 0.5 * x * (1.0 + t)
    dy = 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * _GELU_C0 * (
        1.0 + 3.0 * _GELU_C1 * x * x
    )
    return y, dy


def _gelu_deriv(x):
    """gelu'(x) alone — for sites whose forward value is not needed."""
    u = _GELU_C0 * (x + _GELU_C1 * x * x * x)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * _GELU_C0 * (
        1.0 + 3.0 * _GELU_C1 * x * x
    )


def _multi_bwd_kernel(n_g, sa_ref, sb_ref, sc_ref, attrT_ref, w1_ref, b1_ref,
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

    cdt = w1_ref.dtype
    # Recompute the polynomial features in-kernel from the TINY attr block
    # (selection matmuls pad their 7-contraction on the MXU, ~0.6 ms/step,
    # but an XLA-side recompute materializes the 270 MB poly tensor instead,
    # ~1.7 ms/step — measured, out/r3).
    poly = _poly_block_t(attrT_ref[0, 0], sa_ref, sb_ref, sc_ref)
    # recompute forward (pre-activations) exactly as the flax chain: dot in
    # the compute dtype with f32 accumulation, bias add, then bf16 GELU.
    # GELU value+derivative share one tanh (see _gelu_fwd_and_deriv); the
    # h2 site needs only the derivative (its forward value is dead here).
    h1_pre = (jnp.dot(poly, w1_ref[:], preferred_element_type=f32)
              + b1_ref[0].astype(f32)).astype(cdt)
    h1, dg1 = _gelu_fwd_and_deriv(h1_pre)
    h2_pre = (jnp.dot(h1, w2_ref[:], preferred_element_type=f32)
              + b2_ref[0].astype(f32)).astype(cdt)
    dg2 = _gelu_deriv(h2_pre)

    g = g_refs[0][0, 0].astype(f32)
    for gr in g_refs[1:]:
        g = g + gr[0, 0].astype(f32)
    dpre2 = (g * dg2.astype(f32)).astype(cdt)
    dw2_ref[0] += _dot_tn(h1, dpre2)
    db2_ref[0, 0] += jnp.sum(dpre2.astype(f32), axis=0)
    dh1 = jax.lax.dot_general(
        dpre2, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # dpre2 @ W2^T, f32
    dpre1 = (dh1 * dg1.astype(f32)).astype(cdt)
    dw1_ref[0] += _dot_tn(poly, dpre1)
    db1_ref[0, 0] += jnp.sum(dpre1.astype(f32), axis=0)


def _multi_bwd(attrT, w1, b1, w2, b2, sels, gs):
    Bp, O, d, E = attrT.shape
    F, H = w1.shape
    D = w2.shape[1]
    n_g = len(gs)
    sa, sb, sc = (jnp.asarray(s, attrT.dtype) for s in sels)
    g_spec = pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM)
    dw1p, db1p, dw2p, db2p = pl.pallas_call(
        partial(_multi_bwd_kernel, n_g),
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, E), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
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
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sa, sb, sc, attrT, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), *gs)
    return (
        dw1p.sum(axis=0).astype(w1.dtype),
        db1p.sum(axis=0)[0].astype(b1.dtype),
        dw2p.sum(axis=0).astype(w2.dtype),
        db2p.sum(axis=0)[0].astype(b2.dtype),
    )


def _poly_features(attr, degree):
    from arreau_tpu.models.blocks import polynomial_features

    return polynomial_features(attr, degree)


# ---------------------------------------------------------------------------
# Fused poly + dense_in + GELU forward (round-3 production path). Profiled
# motivation (out/r3 phase table): the XLA forward materializes the 270 MB
# [B', O, E, F=258] polynomial tensor (outer-product muls + pad/maximum
# concat) and then layout-copies its degree-3 block for a batch-in-lanes dot
# emitter — ~2.2 ms/step of HBM traffic to produce h1. This kernel builds the
# poly block per (b', o) tile from the TINY attr block via the same selection
# matmuls the fused backward uses, so the only HBM traffic is attr in
# (~7 MB) and h1 out (~210 MB). The second (dense_out) matmul stays in XLA —
# it already runs at the HBM roofline and its output layout feeds the conv
# kernels copy-free.
# ---------------------------------------------------------------------------


def _h1_fwd_kernel(sa_ref, sb_ref, sc_ref, attrT_ref, w1_ref, b1_ref, h1_ref):
    # Emits the PRE-GELU activation: in-kernel the VPU gelu serializes
    # against the MXU matmuls (Mosaic runs program phases back-to-back),
    # while outside XLA fuses it into the dense_out dot's operand read for
    # free. Measured: gelu-in-kernel 1.83 ms/step, pre-activation 1.42
    # (the floor is the contraction-7 selection matmuls padding the MXU).
    f32 = jnp.float32
    cdt = w1_ref.dtype
    poly = _poly_block_t(attrT_ref[0, 0], sa_ref, sb_ref, sc_ref)
    h1_pre = (jnp.dot(poly, w1_ref[:], preferred_element_type=f32)
              + b1_ref[0].astype(f32)).astype(cdt)
    h1_ref[0, 0] = h1_pre.astype(h1_ref.dtype)


def _h1_fwd(attrT, w1, b1, sels):
    Bp, O, d, E = attrT.shape
    H = w1.shape[1]
    sa, sb, sc = (jnp.asarray(s, attrT.dtype) for s in sels)
    return pl.pallas_call(
        _h1_fwd_kernel,
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, E), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, E, H), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, O, E, H), w1.dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sa, sb, sc, attrT, w1, b1.reshape(1, -1))


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _basis_mlp_multi_p(attrT, w1, b1, w2, b2, degree, n_out):
    """Basis MLP ``gelu(gelu(poly(attr) @ W1 + b1) @ W2 + b2)`` returned as
    ``n_out`` aliased copies (one per consuming conv layer), with a fused
    Pallas backward that takes the ``n_out`` cotangents directly.

    attrT: ``[B', O, d, E]`` kernel-layout invariant attributes in the
    compute dtype, **lane-major** — the edge axis E lives in the lane
    (last) dimension. With d in lanes the TPU tiled layout pads d (6 or 7)
    to 128, bloating the tensor ~20x in HBM (134 MB at the canonical shape
    instead of 7 MB) and costing a visible pad/concat pass per step; the
    transposed layout stores (and DMAs) only the real bytes. w1 ``[F, H]``,
    b1 ``[H]``, w2 ``[H, D]``, b2 ``[D]`` in the compute dtype. The
    backward recomputes the polynomial features per tile and hands them
    plus the ``n_out`` cotangents to one Pallas kernel. Pass zeros for an
    absent bias. The attr cotangent is NOT computed — do not differentiate
    through positions/lattice.

    At training scale (``E >= _H1_KERNEL_MIN_E`` rows per grid cell) the
    first layer (poly features + dense_in + GELU) runs as a Pallas kernel
    (:func:`_h1_fwd`) that never materializes the [.., F] polynomial tensor
    in HBM; its pre-activation accumulates in f32 (one bf16 rounding instead
    of the XLA chain's per-op roundings — matches the fused backward's
    recompute exactly). The ones-channel of the polynomial expansion is
    folded into the selection matmuls (``attrT^T @ S[:d] + S[d]``), so no
    concat pass exists in either direction. The second layer stays in XLA:
    its dot already runs at the HBM roofline and its output layout feeds
    the conv kernels copy-free. Below the threshold (sampler-scale batches)
    the kernel's contraction-7 selection matmuls don't amortize — measured
    2.4x SLOWER at B=100 A=8 (E=640) — so the plain XLA chain is used."""
    h1 = _h1(attrT, w1, b1, degree)
    basis = jax.nn.gelu((jnp.dot(h1, w2) + b2).astype(w2.dtype))
    return (basis,) * n_out


# E (rows per grid cell) below which the XLA chain beats the _h1_fwd kernel
# (measured on v5e: canonical train E=1024 kernel 1.4 ms vs XLA 2.2 ms;
# sampler 100x8 E=640 kernel 2.4x slower end-to-end).
_H1_KERNEL_MIN_E = 1024


def _h1(attrT, w1, b1, degree, force_kernel=False):
    """First basis-MLP layer ``gelu(poly(attr) @ W1 + b1)`` from lane-major
    ``attrT [B', O, d, E]``: Pallas kernel at training scale, XLA chain
    below the measured amortization threshold."""
    if force_kernel or attrT.shape[-1] >= _H1_KERNEL_MIN_E:
        sels = poly_selection_matrices(attrT.shape[-2], degree)
        return jax.nn.gelu(_h1_fwd(attrT, w1, b1, sels))
    poly = _poly_features(attrT.swapaxes(-1, -2), degree)
    return jax.nn.gelu((jnp.dot(poly, w1) + b1).astype(w1.dtype))


def _multi_vjp_fwd(attrT, w1, b1, w2, b2, degree, n_out):
    return _basis_mlp_multi_p(attrT, w1, b1, w2, b2, degree, n_out), (attrT, w1, b1, w2, b2)


def _multi_vjp_bwd(degree, n_out, res, gs):
    attrT, w1, b1, w2, b2 = res
    sels = poly_selection_matrices(attrT.shape[-2], degree)
    dw1, db1, dw2, db2 = _multi_bwd(attrT, w1, b1, w2, b2, sels, list(gs))
    return jnp.zeros_like(attrT), dw1, db1, dw2, db2


_basis_mlp_multi_p.defvjp(_multi_vjp_fwd, _multi_vjp_bwd)


def basis_mlp_multi(attrT, w1, b1, w2, b2, degree, n_out):
    """Public entry for :func:`_basis_mlp_multi_p` (see its docstring). Under
    an active ``kernel_partitioning`` mesh (parallel.mesh) the call
    shard_maps over the leading super-crystal axis: each device runs the
    Pallas kernels on its local batch shard, replicated weights are gathered
    at the boundary and their cotangents psummed by the shard_map transpose
    — the partitioning a real multi-chip slice needs, since XLA has no
    SPMD rule for opaque custom calls."""
    from arreau_tpu.ops.pallas_conv import _maybe_shard_map

    def call(a, w1_, b1_, w2_, b2_):
        # positional closure: jax.custom_vjp functions reject keyword args
        return _basis_mlp_multi_p(a, w1_, b1_, w2_, b2_, degree, n_out)

    f = _maybe_shard_map(
        call, (True, False, False, False, False), (True,) * n_out
    )
    return f(attrT, w1, b1, w2, b2)
