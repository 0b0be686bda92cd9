"""Fused Pallas TPU kernel for the spatial fiber-bundle convolution.

The hot op of the backbone (SURVEY.md §3: HOT LOOP #2) is, per layer:

    y[n, o, c] = sum_k mask[n,k] * (basis[n,k,o,:] @ W)_c * x[src[n,k], o, c]

XLA's lowering materializes the per-edge kernel ``basis @ W`` and the
gathered ``x_j`` as [B, A, K, O, C] HBM tensors. This kernel fuses the
edge-kernel matmul (MXU), the sender gather (VMEM dynamic indexing -- the
neighbor list is crystal-local, and one crystal's features fit comfortably
in VMEM), the mask, and the K-reduction into one pass per crystal: nothing
edge-shaped ever touches HBM.

Grid: one program per crystal tile. A custom VJP provides the backward pass
with the same structure (d_basis via MXU, dx via in-VMEM scatter, dW
accumulated across the grid in a revisited output block).

Shapes (static): basis [B, A, K, O, D], w [D, C], x [B, A, O, C],
src [B, A, K] int32 (crystal-local), mask [B, A, K] bool -> y [B, A, O, C].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(src_ref, mask_ref, basis_ref, w_ref, x_ref, y_ref, kern_ref):
    # block shapes: basis [1, A, K, O, D]; x [1, A, O, C]; y [1, A, O, C]
    A, K, O, D = basis_ref.shape[1], basis_ref.shape[2], basis_ref.shape[3], basis_ref.shape[4]
    C = x_ref.shape[-1]
    # edge kernels for the whole crystal in one MXU matmul, staged in VMEM
    # scratch so the inner loop can index them dynamically (refs support
    # dynamic indexing; values do not on TPU).
    b = pl.program_id(0)
    basis = basis_ref[0].reshape(A * K * O, D)
    kern_ref[:] = jnp.dot(basis, w_ref[:], preferred_element_type=jnp.float32).reshape(
        A, K, O, C
    )

    def body(a, _):
        acc = jnp.zeros((O, C), jnp.float32)

        def edge(k, acc):
            j = src_ref[b, a, k]
            m = (mask_ref[b, a, k] > 0).astype(jnp.float32)
            xj = x_ref[0, j].astype(jnp.float32)  # [O, C]
            return acc + kern_ref[a, k] * xj * m

        acc = jax.lax.fori_loop(0, K, edge, acc)
        y_ref[0, a] = acc.astype(y_ref.dtype)
        return _

    jax.lax.fori_loop(0, A, body, None)


def _fwd(basis, w, x, src, mask):
    B, A, K, O, D = basis.shape
    C = x.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # src, mask as scalar-prefetch operands
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, A, K, O, D), lambda b, *_: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, O, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((A, K, O, C), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, A, O, C), jnp.float32),
        grid_spec=grid_spec,
    )(src.astype(jnp.int32), mask.astype(jnp.int32), basis, w, x)


def _bwd_kernel(src_ref, mask_ref, basis_ref, w_ref, x_ref, g_ref,
                dbasis_ref, dw_ref, dx_ref, kern_ref, gx_ref):
    A, K, O, D = basis_ref.shape[1], basis_ref.shape[2], basis_ref.shape[3], basis_ref.shape[4]
    C = x_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    b = pl.program_id(0)
    # recompute edge kernels (cheaper than saving them), staged in scratch
    basis = basis_ref[0].reshape(A * K * O, D)
    kern_ref[:] = jnp.dot(basis, w_ref[:], preferred_element_type=jnp.float32).reshape(
        A, K, O, C
    )

    dx_ref[0] = jnp.zeros_like(dx_ref[0])

    # Stage gx[a, k] = g[a] * x[src[a,k]] * mask in scratch, and scatter dx.
    def body(a, _):
        g = g_ref[0, a].astype(jnp.float32)  # [O, C]

        def edge(k, _):
            j = src_ref[b, a, k]
            m = (mask_ref[b, a, k] > 0).astype(jnp.float32)
            xj = x_ref[0, j].astype(jnp.float32)  # [O, C]
            gx_ref[a, k] = g * xj * m
            # dx[j] += kern[a, k] * g * m  (in-VMEM scatter)
            dx_ref[0, j] += (kern_ref[a, k] * g * m).astype(dx_ref.dtype)
            return _

        jax.lax.fori_loop(0, K, edge, None)
        return _

    jax.lax.fori_loop(0, A, body, None)

    # Two big MXU matmuls finish the job:
    gxs = gx_ref[:].reshape(A * K * O, C)
    # d_basis = gx @ W^T : [AKO, C] @ [C, D]
    dbasis_ref[0] = jnp.dot(
        gxs, w_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32
    ).reshape(A, K, O, D).astype(dbasis_ref.dtype)
    # dW += basis^T @ gx : [D, AKO] @ [AKO, C]
    dw_ref[:] += jnp.dot(
        basis.astype(jnp.float32).T, gxs, preferred_element_type=jnp.float32
    )


def _bwd(basis, w, x, src, mask, g):
    B, A, K, O, D = basis.shape
    C = x.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, A, K, O, D), lambda b, *_: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, A, K, O, D), lambda b, *_: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            # dW accumulates across the whole grid in one revisited block
            pl.BlockSpec((D, C), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, O, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((A, K, O, C), jnp.float32),
            pltpu.VMEM((A, K, O, C), jnp.float32),
        ],
    )
    dbasis, dw, dx = pl.pallas_call(
        _bwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, A, K, O, D), basis.dtype),
            jax.ShapeDtypeStruct((D, C), jnp.float32),
            jax.ShapeDtypeStruct((B, A, O, C), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(src.astype(jnp.int32), mask.astype(jnp.int32), basis, w, x, g)
    return dbasis, dw.astype(w.dtype), dx.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_spatial_conv(basis, w, x, src, mask):
    """y[b,a,o,c] = sum_k mask * (basis[b,a,k,o,:] @ w)_c * x[b, src[b,a,k], o, c].

    Returns float32 [B, A, O, C]."""
    return _fwd(basis, w, x, src, mask)


def _vjp_fwd(basis, w, x, src, mask):
    return _fwd(basis, w, x, src, mask), (basis, w, x, src, mask)


def _vjp_bwd(res, g):
    basis, w, x, src, mask = res
    dbasis, dw, dx = _bwd(basis, w, x, src, mask, g.astype(jnp.float32))
    return dbasis, dw, dx, None, None


fused_spatial_conv.defvjp(_vjp_fwd, _vjp_bwd)


def reference_spatial_conv(basis, w, x, src, mask):
    """Plain-XLA implementation (numerical oracle and non-TPU fallback)."""
    kern = jnp.einsum("bakod,dc->bakoc", basis, w).astype(jnp.float32)
    B, A, K = src.shape
    idx = src.reshape(B, A * K)[:, :, None, None]
    x_j = jnp.take_along_axis(x, idx, axis=1).reshape(B, A, K, *x.shape[2:])
    msg = kern * x_j.astype(jnp.float32)
    return jnp.where(mask[..., None, None], msg, 0.0).sum(axis=2)
