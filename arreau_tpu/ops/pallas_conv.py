"""Fused Pallas TPU kernel for the spatial fiber-bundle convolution.

The hot op of the backbone (SURVEY.md §3: HOT LOOP #2) is, per layer:

    y[a, o, c] = sum_k mask[a,k] * (basis[a,k,o,:] @ W)_c * x[src[a,k], o, c]

XLA's lowering materializes the per-edge kernel ``basis @ W`` and the
gathered ``x_j`` as [B, A, K, O, C] HBM tensors (~200-400 MB each at the
canonical config). This kernel fuses the edge-kernel matmul, the sender
gather, the mask and the K-reduction into one VMEM-resident pass per
crystal: nothing edge-shaped ever touches HBM.

TPU-native design choices (shaped by Mosaic's layout rules — no
lane-crossing reshapes, block last-two-dims must tile (8, 128) or span the
array):
  * grid = one program per crystal; all intermediates live in VMEM;
  * the kernel basis arrives **orientation-major** ``[B, O, A*K, D]`` (the
    caller produces it in this layout; the attr tensor it derives from is
    small, so the transpose is cheap) — each orientation slice is a clean
    2D matmul operand;
  * the neighbor gather is a **one-hot matmul**: the caller passes
    ``sel[b, a*K+k, j] = mask[b,a,k] * (src[b,a,k] == j)`` (a tiny
    [B, A*K, A] tensor), and the per-receiver K-reduction is a constant
    iota-built matrix — data-dependent indexing becomes MXU work;
  * a static unrolled loop over the O orientations keeps every operand 2D;
  * custom VJP with the same structure; dW accumulates across the grid in a
    revisited output block.

Public entry: :func:`fused_spatial_conv` (same math as
:func:`reference_spatial_conv`, the plain-XLA oracle/fallback, which takes
the standard ``[B, A, K, O, D]`` basis layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_gather_matrix(
    src: jax.Array, mask: jax.Array, dtype=jnp.bfloat16, crystals_per_tile: int = 1
) -> jax.Array:
    """One-hot gather matrix with the edge mask folded in.

    With ``crystals_per_tile = T``, T crystals are folded into one grid
    program (block-diagonal gather over T*A atoms): larger matmul M dims use
    the MXU far better than per-crystal [A*K, ...] operands. Returns
    ``[B/T, T*A*K, T*A]``.
    """
    B, A, K = src.shape
    T = crystals_per_tile
    if T > 1:
        assert B % T == 0, (B, T)
        offset = (jnp.arange(T, dtype=src.dtype) * A)[None, :, None, None]
        src = src.reshape(B // T, T, A, K) + offset
        src = src.reshape(B // T, T * A, K)
        mask = mask.reshape(B // T, T * A, K)
        A = T * A
        B = B // T
    sel = jax.nn.one_hot(src, A, dtype=dtype) * mask[..., None].astype(dtype)
    return sel.reshape(B, A * K, A)


def _red_matrix(A: int, K: int, dtype):
    """Constant K-reduction matrix [A, A*K]: R[a, e] = (e // K == a)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (A, A * K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (A, A * K), 1)
    return (cols // K == rows).astype(dtype)


def _fwd_kernel(O, srcsel_ref, basis_ref, w_ref, x_ref, y_ref):
    _, _, AK, D = basis_ref.shape
    A, C = x_ref.shape[1], x_ref.shape[3]
    f32 = jnp.float32
    sel = srcsel_ref[0]  # [AK, A]
    # f32 operands need HIGHEST to avoid bf16 rounding on the MXU; bf16
    # operands reject it (and the one-hot gather is exact in bf16 anyway)
    hi = jax.lax.Precision.HIGHEST if sel.dtype == f32 else None
    red = _red_matrix(A, AK // A, sel.dtype)  # [A, AK]
    for o in range(O):
        kern = jnp.dot(basis_ref[0, o], w_ref[:], preferred_element_type=f32)  # [AK, C]
        x_o = x_ref[0, :, o, :]  # [A, C]
        # one-hot gather/reduce matmuls must be exact (HIGHEST avoids the
        # default bf16 rounding of f32 operands on the MXU)
        x_j = jnp.dot(sel, x_o, preferred_element_type=f32, precision=hi)  # [AK, C]
        msg = kern * x_j
        y_ref[0, :, o, :] = jnp.dot(
            red.astype(f32), msg, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(y_ref.dtype)


def _bwd_kernel(O, srcsel_ref, basis_ref, w_ref, x_ref, g_ref,
                dbasis_ref, dw_ref, dx_ref):
    _, _, AK, D = basis_ref.shape
    A, C = x_ref.shape[1], x_ref.shape[3]
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    sel = srcsel_ref[0]  # [AK, A]
    hi = jax.lax.Precision.HIGHEST if sel.dtype == f32 else None
    hi32 = jax.lax.Precision.HIGHEST
    sel_t32 = sel.astype(f32).T
    red_t = _red_matrix(A, AK // A, f32).T  # [AK, A]
    for o in range(O):
        basis_o = basis_ref[0, o]  # [AK, D]
        kern = jnp.dot(basis_o, w_ref[:], preferred_element_type=f32)  # [AK, C]
        x_o = x_ref[0, :, o, :]
        x_j = jnp.dot(sel, x_o, preferred_element_type=f32, precision=hi)  # [AK, C]
        g_o = g_ref[0, :, o, :].astype(f32)  # [A, C]
        g_rows = jnp.dot(red_t, g_o, preferred_element_type=f32, precision=hi32)  # [AK, C]

        gx = g_rows * x_j  # [AK, C] (mask folded into sel -> x_j)
        dbasis_ref[0, o] = jnp.dot(
            gx, w_ref[:].astype(f32).T, preferred_element_type=f32
        ).astype(dbasis_ref.dtype)
        dw_ref[:] += jnp.dot(basis_o.astype(f32).T, gx, preferred_element_type=f32)
        dxc = kern * g_rows
        dx_ref[0, :, o, :] = jnp.dot(
            sel_t32, dxc, preferred_element_type=f32, precision=hi32
        ).astype(dx_ref.dtype)


def _interpret() -> bool:
    # interpreter mode off-TPU (CPU tests / dry runs)
    return jax.default_backend() != "tpu"


def _fwd(basis_om, w, x, sel):
    B, O, AK, D = basis_om.shape
    A, C = x.shape[1], x.shape[3]
    return pl.pallas_call(
        partial(_fwd_kernel, O),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, AK, A), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O, AK, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, O, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A, O, C), jnp.float32),
        interpret=_interpret(),
    )(sel, basis_om, w, x)


def _bwd(basis_om, w, x, sel, g):
    B, O, AK, D = basis_om.shape
    A, C = x.shape[1], x.shape[3]
    dbasis, dw, dx = pl.pallas_call(
        partial(_bwd_kernel, O),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, AK, A), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O, AK, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, O, AK, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            # dW accumulates across the whole grid in one revisited block
            pl.BlockSpec((D, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, O, AK, D), basis_om.dtype),
            jax.ShapeDtypeStruct((D, C), jnp.float32),
            jax.ShapeDtypeStruct((B, A, O, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(sel, basis_om, w, x, g)
    return dbasis, dw.astype(w.dtype), dx.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_spatial_conv(basis_om, w, x, sel):
    """Fused spatial conv with orientation-major basis.

    Args:
      basis_om: [B, O, A*K, D] windowed kernel basis (row e = a*K + k).
      w: [D, C] spatial kernel weight.
      x: [B, A, O, C] node features.
      sel: [B, A*K, A] masked one-hot gather matrix (make_gather_matrix).

    Returns float32 [B, A, O, C]:
      y[b,a,o,c] = sum_k (basis_om[b,o,aK+k] @ w)_c * (sel[b] @ x[b,:,o,c])
    """
    return _fwd(basis_om, w, x, sel)


def _vjp_fwd(basis_om, w, x, sel):
    return _fwd(basis_om, w, x, sel), (basis_om, w, x, sel)


def _vjp_bwd(res, g):
    basis_om, w, x, sel = res
    dbasis, dw, dx = _bwd(basis_om, w, x, sel, g.astype(jnp.float32))
    return dbasis, dw, dx, None


fused_spatial_conv.defvjp(_vjp_fwd, _vjp_bwd)


def reference_spatial_conv(basis, w, x, src, mask):
    """Plain-XLA implementation with the standard [B, A, K, O, D] basis
    layout (numerical oracle and non-TPU fallback)."""
    kern = jnp.einsum("bakod,dc->bakoc", basis, w).astype(jnp.float32)
    B, A, K = src.shape
    idx = src.reshape(B, A * K)[:, :, None, None]
    x_j = jnp.take_along_axis(x, idx, axis=1).reshape(B, A, K, *x.shape[2:])
    msg = kern * x_j.astype(jnp.float32)
    return jnp.where(mask[..., None, None], msg, 0.0).sum(axis=2)


def fused_spatial_conv_standard_layout(basis, w, x, src, mask):
    """Convenience wrapper taking the standard basis layout (transposes to
    orientation-major and builds the gather matrix)."""
    B, A, K, O, D = basis.shape
    basis_om = basis.transpose(0, 3, 1, 2, 4).reshape(B, O, A * K, D)
    sel = make_gather_matrix(src, mask, dtype=basis.dtype)
    return fused_spatial_conv(basis_om, w, x, sel)
