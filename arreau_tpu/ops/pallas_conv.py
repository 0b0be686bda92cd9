"""Fused Pallas TPU kernel for the fiber-bundle convolution (spatial conv +
spherical fiber mixing in one VMEM-resident pass).

The hot op of the backbone (SURVEY.md §3: HOT LOOP #2) is, per layer:

    x_sp[a, o, c] = sum_k mask[a,k] * (basis[a,k,o,:] @ W)_c * x[src[a,k], o, c]
    y[a, p, c]    = bias_c + sum_o x_sp[a, o, c] * Kf[o, p, c] / O

XLA's lowering materializes the per-edge kernel ``basis @ W``, the gathered
``x_j`` and the intermediate ``x_sp`` as HBM tensors, and lowers the fiber
einsum as tiny [.,16]x[16,16] matmuls that waste the MXU. This kernel fuses
the edge-kernel matmul, the sender gather, the K-reduction AND the fiber
mixing: nothing edge- or orientation-intermediate ever touches HBM.

TPU-native design (see /opt/skills/guides/pallas_guide.md; VMEM ~16 MB):

  * **Crystal tiling**: T crystals fold into one "super-crystal" of TA = T*A
    atoms (block-diagonal gather), sized so TA ~ 256 — per-program matmuls
    are then [K*TA, D] @ [D, C] (e.g. [2048, 256] @ [256, 200]), which feeds
    the MXU properly at every bucket size. At the A=256 bucket T=1 and the
    same kernel applies — large crystals fit because blocks are per-(b', o).
  * **Grid (B', O), o innermost**: the output block (one super-crystal's
    [P, TA, C]) stays resident in VMEM while the o axis accumulates the
    fiber-mixed contributions into it (zeroed at o == 0).
  * **k-major edge rows** (row e = k*TA + ta): the K-reduction over neighbor
    slots is K contiguous [TA, C] row-block adds — no lane-crossing reshape,
    no reduction matmul.
  * **One-hot-matmul gather**: ``sel[b', e, ta] = mask * (src == ta)`` turns
    the data-dependent neighbor gather into MXU work (exact in bf16).
  * Backward recomputes the forward intermediates per (b', o) instead of
    storing them; dW and dKf are emitted as small per-b' partials summed
    outside the kernel (avoids cross-o revisit-eviction hazards).

Public entry: :func:`fused_fiber_conv` (custom VJP). The plain-XLA oracle
with standard layouts is :func:`reference_fiber_conv`.

Reference behavior being replaced: FiberBundleConv's propagate + fiber einsum
(/root/reference/ponita/nn/conv.py:71-146) built on torch_scatter CUDA ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def pick_tile(batch: int, atoms: int, target: int = 256) -> int:
    """Largest divisor T of ``batch`` with T * atoms <= target (min 1)."""
    best = 1
    for t in range(1, batch + 1):
        if batch % t == 0 and t * atoms <= target:
            best = t
    return best


def make_gather_matrix(
    src: jax.Array, mask: jax.Array, dtype=jnp.bfloat16, crystals_per_tile: int = 1
) -> jax.Array:
    """Masked one-hot gather matrix in k-major row order.

    Folds T = ``crystals_per_tile`` crystals into a block-diagonal gather over
    TA = T*A atoms. Row e = k*TA + (t*A + a); column = sender atom index in
    the super-crystal. Returns ``[B/T, K*TA, TA]``.
    """
    B, A, K = src.shape
    T = crystals_per_tile
    assert B % T == 0, (B, T)
    offset = (jnp.arange(T, dtype=src.dtype) * A)[None, :, None, None]
    src = src.reshape(B // T, T, A, K) + offset  # [B', T, A, K]
    src = src.transpose(0, 3, 1, 2).reshape(B // T, K * T * A)  # k-major rows
    mask = mask.reshape(B // T, T, A, K).transpose(0, 3, 1, 2).reshape(B // T, K * T * A)
    sel = jax.nn.one_hot(src, T * A, dtype=dtype) * mask[..., None].astype(dtype)
    return sel


def _fwd_kernel(K, sel_ref, basis_ref, w_ref, x_ref, fk_ref, y_ref):
    o = pl.program_id(1)
    TA, C = x_ref.shape[2], x_ref.shape[3]
    P = fk_ref.shape[1]
    f32 = jnp.float32

    @pl.when(o == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    x_o = x_ref[0, 0]  # [TA, C]
    # f32 operands need HIGHEST to avoid bf16 rounding on the MXU; bf16
    # operands reject it (the one-hot gather is exact in bf16 anyway).
    hi = HI if sel_ref.dtype == f32 else None
    # process the K neighbor slots as row blocks: only [TA, C] temporaries are
    # ever live (whole-E temps blew the 16 MB scoped-VMEM budget at TA=256)
    x_sp = jnp.zeros((TA, C), f32)
    for k in range(K):
        sl = slice(k * TA, (k + 1) * TA)
        kern_k = jnp.dot(basis_ref[0, 0, sl, :], w_ref[:], preferred_element_type=f32)
        xj_k = jnp.dot(sel_ref[0, sl, :], x_o, preferred_element_type=f32, precision=hi)
        x_sp = x_sp + kern_k * xj_k
    for p in range(P):
        y_ref[0, p] += x_sp * fk_ref[o, p][None, :].astype(f32)


def _bwd_kernel(K, sel_ref, basis_ref, w_ref, x_ref, fk_ref, g_ref,
                dbasis_ref, dwp_ref, dx_ref, dfk_ref):
    o = pl.program_id(1)
    TA, C = x_ref.shape[2], x_ref.shape[3]
    D = basis_ref.shape[3]
    P = fk_ref.shape[1]
    f32 = jnp.float32

    @pl.when(o == 0)
    def _():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)

    w = w_ref[:]
    x_o = x_ref[0, 0]  # [TA, C]
    bdt = basis_ref.dtype

    # pass 1: recompute x_sp for this orientation, K row-blocks at a time
    # (only [TA, C] temporaries live — whole-E temps blew the 16 MB scoped
    # VMEM budget at TA=256)
    x_sp = jnp.zeros((TA, C), f32)
    for k in range(K):
        sl = slice(k * TA, (k + 1) * TA)
        kern_k = jnp.dot(basis_ref[0, 0, sl, :], w, preferred_element_type=f32)
        xj_k = jnp.dot(sel_ref[0, sl, :], x_o, preferred_element_type=f32)
        x_sp = x_sp + kern_k * xj_k

    # dL/d(x_sp) for this o, and dL/d(fiber kernel) partial for this (b', o)
    g_o = jnp.zeros((TA, C), f32)
    for p in range(P):
        g_p = g_ref[0, p]  # [TA, C] f32
        g_o = g_o + g_p * fk_ref[o, p][None, :].astype(f32)
        dfk_ref[0, 0, p] = jnp.sum(x_sp * g_p, axis=0)

    # pass 2: chain into the spatial conv, recomputing kern_k/xj_k per block;
    # 1-pass bf16 matmuls with f32 accumulation (see _bwd_spatial_kernel)
    g_b = g_o.astype(bdt)
    w_t = jax.lax.transpose(w, (1, 0))  # [C, D], tiny
    dw_acc = jnp.zeros((D, C), f32)
    dx = jnp.zeros((TA, C), f32)
    for k in range(K):
        sl = slice(k * TA, (k + 1) * TA)
        basis_k = basis_ref[0, 0, sl, :]
        sel_k = sel_ref[0, sl, :]
        kern_k = jnp.dot(basis_k, w, preferred_element_type=f32)
        xj_k = jnp.dot(sel_k, x_o, preferred_element_type=f32)
        gx_k = (g_o * xj_k).astype(bdt)  # [TA, C]
        dbasis_ref[0, 0, sl, :] = jnp.dot(
            gx_k, w_t, preferred_element_type=f32
        ).astype(dbasis_ref.dtype)
        dw_acc = dw_acc + _dot_tn(basis_k, gx_k)
        dxc_k = kern_k.astype(bdt) * g_b  # [TA, C]
        dx = dx + _dot_tn(sel_k, dxc_k)
    dwp_ref[:] += dw_acc[None]
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)


def _interpret() -> bool:
    # interpreter mode off-TPU (CPU tests / dry runs)
    return jax.default_backend() != "tpu"


# The b' (super-crystal) grid axis is embarrassingly parallel; the o axis is
# sequential (y/dW accumulate across it). The double-buffered block set at
# TA=256 exceeds Mosaic's conservative 16 MB scoped-VMEM default, so raise
# the limit toward the v5e's physical 128 MiB.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _fwd(basis_om, w, x_om, sel, fiber_kernel):
    Bp, O, E, D = basis_om.shape
    TA, C = x_om.shape[2], x_om.shape[3]
    P = fiber_kernel.shape[1]
    K = E // TA
    return pl.pallas_call(
        partial(_fwd_kernel, K),
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, P, TA, C), lambda b, o: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, P, TA, C), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sel, basis_om, w, x_om, fiber_kernel)


def _bwd(basis_om, w, x_om, sel, fiber_kernel, g):
    Bp, O, E, D = basis_om.shape
    TA, C = x_om.shape[2], x_om.shape[3]
    P = fiber_kernel.shape[1]
    K = E // TA
    dbasis, dwp, dx, dfkp = pl.pallas_call(
        partial(_bwd_kernel, K),
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, TA, C), lambda b, o: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            # dW partial per super-crystal, accumulated over the (inner) o axis
            pl.BlockSpec((1, D, C), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, O, E, D), basis_om.dtype),
            jax.ShapeDtypeStruct((Bp, D, C), jnp.float32),
            jax.ShapeDtypeStruct((Bp, O, TA, C), x_om.dtype),
            jax.ShapeDtypeStruct((Bp, O, P, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sel, basis_om, w, x_om, fiber_kernel, g.astype(jnp.float32))
    dw = dwp.sum(axis=0).astype(w.dtype)
    dfk = dfkp.sum(axis=0).astype(fiber_kernel.dtype)
    return dbasis, dw, dx, dfk


@jax.custom_vjp
def _fused_fiber_conv_p(basis_om, w, x_om, sel, fiber_kernel):
    return _fwd(basis_om, w, x_om, sel, fiber_kernel)


def _vjp_fwd(basis_om, w, x_om, sel, fiber_kernel):
    return _fwd(basis_om, w, x_om, sel, fiber_kernel), (basis_om, w, x_om, sel, fiber_kernel)


def _vjp_bwd(res, g):
    basis_om, w, x_om, sel, fiber_kernel = res
    dbasis, dw, dx, dfk = _bwd(basis_om, w, x_om, sel, fiber_kernel, g)
    return dbasis, dw, dx, None, dfk


_fused_fiber_conv_p.defvjp(_vjp_fwd, _vjp_bwd)


def _maybe_shard_map(fn, arg_batched, out_batched):
    """Wrap a kernel-calling fn in shard_map over the ambient data axis (see
    parallel.mesh.kernel_partitioning); identity when no mesh is bound."""
    from arreau_tpu.parallel.mesh import (
        current_kernel_partitioning,
        shard_map_kernel,
    )

    mesh, axis = current_kernel_partitioning()
    if mesh is None:
        return fn
    return shard_map_kernel(fn, mesh, axis, arg_batched, out_batched)


def fused_fiber_conv(basis_om, w, x_om, sel, fiber_kernel):
    """Fused spatial + fiber convolution over super-crystal tiles.

    Args:
      basis_om: [B', O, E, D] windowed kernel basis, k-major rows
        (E = K*TA, row e = k*TA + ta).
      w: [D, C] spatial kernel weight.
      x_om: [B', O, TA, C] node features, orientation-major.
      sel: [B', E, TA] masked block-diagonal one-hot gather
        (:func:`make_gather_matrix`).
      fiber_kernel: [O, P, C] spherical mixing kernel (pre-scaled by 1/O).

    Under an active ``kernel_partitioning`` mesh the call shard_maps over the
    super-crystal axis (each device runs the kernel on its local shard; the
    replicated w / fiber_kernel cotangents are psummed by the transpose).

    Returns float32 [B', P, TA, C]:
      y[b,p,t,c] = sum_o Kf[o,p,c] * sum_k (basis[b,o,kTA+t] @ w)_c
                                          * (sel[b] @ x[b,o])[kTA+t, c]
    """
    f = _maybe_shard_map(
        _fused_fiber_conv_p, (True, False, True, True, False), True
    )
    return f(basis_om, w, x_om, sel, fiber_kernel)


def _fwd_spatial_kernel(K, sel_ref, basis_ref, w_ref, win_ref, x_ref, y_ref):
    # The window (smooth radial cutoff, per edge) is folded in here: applied
    # outside, it is a full elementwise pass over the [B', O, E, D] basis that
    # cannot fuse across the custom-call boundary (~536 MB round trip per
    # direction); in-kernel it is an [E, 1] broadcast on the edge kernel.
    #
    # Whole-E matmuls (one [E, D] @ [D, C] instead of K [TA, D] slices): at
    # the production tile TA=128 the [E, C] f32 temporaries are <1 MB, and
    # the 8x-longer matmuls pipeline the MXU measurably better than the
    # K-loop of short ones (the K-reduction becomes a [K, TA, C] sublane
    # reshape-sum in VMEM).
    TA, C = x_ref.shape[2], x_ref.shape[3]
    E = basis_ref.shape[2]
    f32 = jnp.float32
    x_o = x_ref[0, 0]
    kern = jnp.dot(basis_ref[0, 0], w_ref[:], preferred_element_type=f32)
    kern = kern * win_ref[0]  # [E, 1] lane broadcast
    xj = jnp.dot(sel_ref[0], x_o, preferred_element_type=f32)
    msg = (kern * xj).reshape(K, TA, C)
    # accumulate in f32, store in the output dtype (bf16 in production: the
    # consuming fiber einsum runs in bf16 anyway, so storing bf16 here is
    # numerically identical and kills a separate 52 MB/layer convert pass)
    y_ref[0, 0] = msg.sum(axis=0).astype(y_ref.dtype)


def _dot_tn(a, b):
    """a^T @ b via dot_general contracting dims (no materialized transpose —
    Mosaic relayouts are expensive; the MXU reads either operand order)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bwd_spatial_kernel(K, want_dwin, sel_ref, basis_ref, w_ref, win_ref,
                        x_ref, g_ref, dbasis_ref, dwp_ref, dx_ref,
                        dwin_ref=None):
    # All backward matmuls run 1-pass bf16 with f32 accumulation: HIGHEST on
    # f32 operands lowers to a 6-pass MXU decomposition (profiled at 5.5
    # ms/layer, 7x the forward); dx/dbasis are cast to bf16 on output anyway
    # and bf16 gradients are the standard training numerics.
    #
    # ``want_dwin=False`` skips the window cotangent entirely: the window is
    # a function of positions only, and no training path differentiates
    # through positions (grads are wrt params), so its [E, 1] reduce per
    # (b', o) block is dead work.
    o = pl.program_id(1)
    TA, C = x_ref.shape[2], x_ref.shape[3]
    D = basis_ref.shape[3]
    f32 = jnp.float32
    bdt = basis_ref.dtype

    @pl.when(o == 0)
    def _():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        if want_dwin:
            dwin_ref[:] = jnp.zeros_like(dwin_ref)

    w = w_ref[:]
    x_o = x_ref[0, 0]
    E = basis_ref.shape[2]
    g_o = g_ref[0, 0].astype(f32)  # [TA, C]
    w_t = jax.lax.transpose(w, (1, 0))  # [C, D], tiny
    # whole-E matmuls (see _fwd_spatial_kernel); the receiver cotangent g_o
    # tiles over the K neighbor slots as k-major rows
    basis = basis_ref[0, 0]  # [E, D]
    sel = sel_ref[0]  # [E, TA]
    win = win_ref[0]  # [E, 1]
    kern = jnp.dot(basis, w, preferred_element_type=f32)
    xj = jnp.dot(sel, x_o, preferred_element_type=f32)
    g_e = jax.lax.broadcast_in_dim(g_o, (K, TA, C), (1, 2)).reshape(E, C)
    gx = g_e * xj  # [E, C]
    if want_dwin:
        dwin_ref[0] += jnp.sum(kern * gx, axis=1, keepdims=True)
    gxw = (gx * win).astype(bdt)
    dbasis_ref[0, 0] = jnp.dot(
        gxw, w_t, preferred_element_type=f32
    ).astype(dbasis_ref.dtype)
    dwp_ref[:] += _dot_tn(basis, gxw)[None]
    dxc = ((kern * win) * g_e).astype(bdt)
    dx_ref[0, 0] = _dot_tn(sel, dxc).astype(dx_ref.dtype)


# Orientations per forward-kernel program (experiment knob, default 1 = the
# measured production configuration). The r5 anatomy (out/r5/exp_conv_fwd.py)
# measured the forward at its per-block DMA-latency floor; OB>1 halves/
# quarters the block count on the same bytes. On-chip A/Bs within one
# session showed ~0.5-1 ms/step in favor of OB=4, but cross-session tunnel
# variance exceeded the effect — kept opt-in until a stable-session bench
# A/B settles it (read once at import; see ADVICE r4 on trace-time env).
import os as _os

_FWD_OBLK = int(_os.environ.get("ARREAU_CONV_FWD_OBLK", "1"))


def _fwd_spatial_oblk_kernel(K, OB, sel_ref, basis_ref, w_ref, win_ref, x_ref, y_ref):
    # production body (see _fwd_spatial_kernel) over OB orientations per
    # program: fewer, larger blocks amortize per-block DMA latency
    TA, C = x_ref.shape[2], x_ref.shape[3]
    f32 = jnp.float32
    win = win_ref[0]
    for oi in range(OB):
        kern = jnp.dot(basis_ref[0, oi], w_ref[:], preferred_element_type=f32)
        kern = kern * win
        xj = jnp.dot(sel_ref[0], x_ref[0, oi], preferred_element_type=f32)
        msg = (kern * xj).reshape(K, TA, C)
        y_ref[0, oi] = msg.sum(axis=0).astype(y_ref.dtype)


def _fwd_spatial(basis_om, w, x_om, sel, win, out_dtype=jnp.float32):
    Bp, O, E, D = basis_om.shape
    TA, C = x_om.shape[2], x_om.shape[3]
    K = E // TA
    OB = _FWD_OBLK if (_FWD_OBLK > 1 and O % _FWD_OBLK == 0) else 1
    if OB > 1:
        return pl.pallas_call(
            partial(_fwd_spatial_oblk_kernel, K, OB),
            grid=(Bp, O // OB),
            in_specs=[
                pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OB, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E, 1), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OB, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, OB, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Bp, O, TA, C), out_dtype),
            interpret=_interpret(),
            compiler_params=None if _interpret() else _COMPILER_PARAMS,
        )(sel, basis_om, w, win, x_om)
    return pl.pallas_call(
        partial(_fwd_spatial_kernel, K),
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, 1), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, O, TA, C), out_dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
    )(sel, basis_om, w, win, x_om)


def _bwd_spatial(basis_om, w, x_om, sel, win, g, want_dwin=True):
    Bp, O, E, D = basis_om.shape
    TA, C = x_om.shape[2], x_om.shape[3]
    K = E // TA
    out_specs = [
        pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, C), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, O, E, D), basis_om.dtype),
        jax.ShapeDtypeStruct((Bp, D, C), jnp.float32),
        jax.ShapeDtypeStruct((Bp, O, TA, C), x_om.dtype),
    ]
    if want_dwin:
        # dwin accumulates across the (inner) o axis like dwp
        out_specs.append(
            pl.BlockSpec((1, E, 1), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Bp, E, 1), jnp.float32))
    outs = pl.pallas_call(
        partial(_bwd_spatial_kernel, K, want_dwin),
        grid=(Bp, O),
        in_specs=[
            pl.BlockSpec((1, E, TA), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E, D), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, 1), lambda b, o: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA, C), lambda b, o: (b, o, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _COMPILER_PARAMS,
        # g is consumed in its natural dtype (bf16 when the forward emits
        # bf16) and upcast per-tile in the kernel — no HBM convert pass
    )(sel, basis_om, w, win, x_om, g)
    if want_dwin:
        dbasis, dwp, dx, dwin = outs
        dwin = dwin.astype(win.dtype)
    else:
        dbasis, dwp, dx = outs
        dwin = None
    return dbasis, dwp.sum(axis=0).astype(w.dtype), dx, dwin


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_spatial_conv_p(window_grad, out_dtype, basis_om, w, x_om, sel, win):
    return _fwd_spatial(basis_om, w, x_om, sel, win, out_dtype)


def _vjp_spatial_fwd(window_grad, out_dtype, basis_om, w, x_om, sel, win):
    return (
        _fwd_spatial(basis_om, w, x_om, sel, win, out_dtype),
        (basis_om, w, x_om, sel, win),
    )


def _vjp_spatial_bwd(window_grad, out_dtype, res, g):
    basis_om, w, x_om, sel, win = res
    dbasis, dw, dx, dwin = _bwd_spatial(
        basis_om, w, x_om, sel, win, g, want_dwin=window_grad
    )
    if dwin is None:
        # symbolic zero: positions-only quantity, declared non-differentiated
        dwin = jnp.zeros_like(win)
    return dbasis, dw, dx, None, dwin


_fused_spatial_conv_p.defvjp(_vjp_spatial_fwd, _vjp_spatial_bwd)


def fused_spatial_conv(
    basis_om, w, x_om, sel, win, window_grad=True, out_dtype=jnp.float32
):
    """Spatial conv only (kernel matmul + window + gather + K-reduce); the
    fiber mixing is left to XLA. Same layouts as :func:`fused_fiber_conv`
    plus the per-edge window ``win [B', E, 1]`` (float32).

    ``window_grad=False`` skips the window cotangent in the backward kernel
    (returns zeros for it): valid whenever nothing differentiates through
    positions — true of every training path here, where gradients are wrt
    params only.

    ``out_dtype`` is the store dtype of the f32-accumulated output (default
    float32). The bf16 compute path passes bfloat16: its consumer (the fiber
    einsum) casts to bf16 regardless, so the values are bit-identical while
    the separate convert pass and half the output HBM traffic disappear —
    and the backward kernel then receives its cotangent in bf16 too (upcast
    per-tile in VMEM). Returns ``out_dtype`` [B', O, TA, C].

    Under an active ``kernel_partitioning`` mesh the call shard_maps over the
    super-crystal axis — the code path a multi-chip slice runs."""
    f = _maybe_shard_map(
        partial(_fused_spatial_conv_p, window_grad, jnp.dtype(out_dtype)),
        (True, False, True, True, True),
        True,
    )
    return f(basis_om, w, x_om, sel, win)


def reference_fiber_conv(basis, w, x, src, mask, fiber_kernel):
    """Plain-XLA oracle with standard layouts.

    basis: [B, A, K, O, D]; x: [B, A, O, C]; src/mask: [B, A, K];
    fiber_kernel: [O, P, C] (pre-scaled). Returns [B, A, P, C] float32.
    """
    kern = jnp.einsum("bakod,dc->bakoc", basis, w).astype(jnp.float32)
    B, A, K = src.shape
    idx = src.reshape(B, A * K)[:, :, None, None]
    x_j = jnp.take_along_axis(x, idx, axis=1).reshape(B, A, K, *x.shape[2:])
    msg = kern * x_j.astype(jnp.float32)
    x_sp = jnp.where(mask[..., None, None], msg, 0.0).sum(axis=2)  # [B, A, O, C]
    return jnp.einsum(
        "baoc,opc->bapc", x_sp, fiber_kernel.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
