"""Building blocks for the Ponita backbone: polynomial features, sphere
codecs, the separable fiber-bundle convolution, and the ConvNext block —
re-designed for dense static-shape batches.

Capability parity targets (reference behavior, not code):
  * PolynomialFeatures — /root/reference/ponita/nn/embedding.py:4-14
  * scalar/vec <-> sphere codecs — /root/reference/ponita/utils/to_from_sphere.py:4-14
  * Conv / FiberBundleConv — /root/reference/ponita/nn/conv.py:12-146
  * ConvNext — /root/reference/ponita/nn/convnext.py:4-33

The PyG scatter-based message passing becomes a gather over the fixed-degree
receiver-major neighbor list plus a masked sum over the K axis; the spherical
(fiber) mixing stays a dense einsum that XLA maps onto the MXU.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch.nn.LayerNorm default eps — the reference's ConvNext norm
# (/root/reference/ponita/nn/convnext.py:18). flax defaults to 1e-6; pinning
# the torch value keeps imported reference checkpoints numerically exact.
LN_EPS = 1e-5

# Documented negative-result experiment gates (BASELINE.md r4), frozen at
# import time: reading os.environ inside __call__ is trace-time state — a
# toggle after a program is jit-cached silently has no effect and concurrent
# processes can diverge (ADVICE r4). Import-time constants make the setting
# process-wide and visible.
LN_NATIVE = os.environ.get("ARREAU_LN_NATIVE") == "1"
GELU_SAVED = os.environ.get("ARREAU_GELU_SAVED") == "1"


@jax.custom_vjp
def gelu_save_deriv(x):
    """tanh-GELU whose VJP multiplies by a derivative SAVED at forward time.

    Standard autodiff saves the pre-activation and re-evaluates the tanh
    chain inside the backward dots' fused epilogue; this saves gelu'(x)
    (same residual size as the pre-activation it replaces) so the backward
    is a single elementwise multiply. Value and derivative share one tanh
    (ops/pallas_basis._gelu_fwd_and_deriv — the formula matches jax.nn.gelu
    approximate=True). Opt-in via ARREAU_GELU_SAVED=1 in ConvNextBlock.
    """
    from arreau_tpu.ops.pallas_basis import _gelu_fwd_and_deriv

    y, _ = _gelu_fwd_and_deriv(x)
    return y


def _gsd_fwd(x):
    from arreau_tpu.ops.pallas_basis import _gelu_fwd_and_deriv

    y, d = _gelu_fwd_and_deriv(x)
    return y, d.astype(x.dtype)


def _gsd_bwd(d, g):
    return (g * d,)


gelu_save_deriv.defvjp(_gsd_fwd, _gsd_bwd)


def polynomial_features(x: jax.Array, degree: int) -> jax.Array:
    """Tensor-power polynomial features: ``[x, x (x) x, ...]`` flattened.

    For input dim ``d`` and degree ``n`` the output dim is ``d + d^2 + ... + d^n``.
    """
    feats = [x]
    for _ in range(1, degree):
        outer = feats[-1][..., :, None] * x[..., None, :]
        feats.append(outer.reshape(*outer.shape[:-2], -1))
    return jnp.concatenate(feats, axis=-1)


def polynomial_feature_dim(input_dim: int, degree: int) -> int:
    return sum(input_dim**i for i in range(1, degree + 1))


def scalar_to_sphere(scalar: jax.Array, num_ori: int) -> jax.Array:
    """``[..., F] -> [..., O, F]`` by repetition over the orientation grid."""
    return jnp.repeat(scalar[..., None, :], num_ori, axis=-2)


def vec_to_sphere(vec: jax.Array, ori_grid: jax.Array) -> jax.Array:
    """``[..., V, 3] x [O, 3] -> [..., O, V]`` inner products."""
    return jnp.einsum("...vd,od->...ov", vec, ori_grid)


def sphere_to_scalar(signal: jax.Array) -> jax.Array:
    """Mean over the orientation axis: ``[..., O, F] -> [..., F]``."""
    return signal.mean(axis=-2)


def sphere_to_vec(signal: jax.Array, ori_grid: jax.Array) -> jax.Array:
    """Signal-weighted grid average: ``[..., O, V] -> [..., V, 3]``."""
    return jnp.einsum("...ov,od->...vd", signal, ori_grid) / ori_grid.shape[-2]


class _KernelParam(nn.Module):
    """Bare ``kernel`` parameter under a named scope — creates the exact same
    param tree entry as a bias-free ``nn.Dense`` (``<name>/kernel`` with
    lecun-normal init) so the fused and flax BasisMLP paths share
    checkpoints."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jax.Array:
        # param_dtype pinned like nn.Dense (jnp.float_ flips to f64 under x64)
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _LayerNormParams(nn.Module):
    """Bare ``scale``/``bias`` parameters matching ``nn.LayerNorm``'s tree."""

    shape: tuple

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        # param_dtype pinned like nn.LayerNorm (jnp.float_ flips under x64)
        scale = self.param("scale", nn.initializers.ones, self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, self.shape, jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Bare ``kernel`` (+ optional ``bias``) parameters under a named scope —
    the exact param tree of an ``nn.Dense`` (lecun-normal kernel, zeros bias)
    for fused-kernel paths that consume the weights directly.

    ``param_dtype`` is pinned to float32 like ``nn.Dense``'s default —
    without it the initializers follow ``jnp.float_``, which flips to
    float64 under the x64 test mode and poisons downstream compute dtypes
    (the x64 sampler regression caught by tests/test_quality.py)."""

    shape: tuple
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> tuple[jax.Array, Optional[jax.Array]]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, self.param_dtype
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.shape[1],), self.param_dtype
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class BasisMLP(nn.Module):
    """Kernel-basis network: PolynomialFeatures -> Dense -> GELU -> Dense -> GELU.

    Mirrors the reference's ``basis_fn``/``fiber_basis_fn`` stacks
    (ponita.py:65-66) with explicit input dims instead of LazyLinear.
    """

    hidden_dim: int
    basis_dim: int
    degree: int
    dtype: Optional[jnp.dtype] = None
    # bias-gradient reductions over the edge-basis tensor lower to slow XLA
    # loop fusions at scale; use_bias=False removes them (see PonitaConfig).
    # NOTE: the polynomial features carry no constant term, so with BOTH
    # biases off the kernel basis is pinned to gelu(0)=0 at attr=0 — measured
    # to visibly degrade generated-crystal geometry (BASELINE.md). ``out_bias``
    # controls dense_out separately: bias on dense_in only keeps the constant
    # component representable while dropping the largest bias-grad reduction.
    use_bias: bool = True
    out_bias: Optional[bool] = None  # None = follow use_bias
    # run the whole chain as one Pallas kernel per (b', o) block (requires the
    # 4D kernel layout, no biases, degree <= 3; attributes are treated as
    # non-differentiable data — see ops/pallas_basis.py). Same param tree as
    # the flax path (dense_in/kernel, dense_out/kernel).
    fused: bool = False

    @nn.compact
    def __call__(self, attr: jax.Array) -> jax.Array:
        out_bias = self.use_bias if self.out_bias is None else self.out_bias
        if (self.fused and not self.use_bias and not out_bias
                and attr.ndim == 4 and self.degree <= 3):
            from arreau_tpu.ops.pallas_basis import fused_basis_mlp

            in_dim = polynomial_feature_dim(attr.shape[-1], self.degree)
            w1 = _KernelParam((in_dim, self.hidden_dim), name="dense_in")()
            w2 = _KernelParam((self.hidden_dim, self.basis_dim), name="dense_out")()
            cdt = self.dtype or w1.dtype
            return fused_basis_mlp(
                attr.astype(cdt), w1.astype(cdt), w2.astype(cdt), self.degree, cdt
            )
        h = polynomial_features(attr, self.degree)
        h = nn.Dense(self.hidden_dim, name="dense_in", dtype=self.dtype,
                     use_bias=self.use_bias)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.basis_dim, name="dense_out", dtype=self.dtype,
                     use_bias=out_bias)(h)
        return nn.gelu(h)


class MultiBasisMLP(nn.Module):
    """BasisMLP variant for the Pallas conv path: same parameter tree
    (``dense_in/{kernel,bias}``, ``dense_out/{kernel,bias}``) and identical
    forward numerics, but returns ``n_out`` aliased copies of the basis (one
    per consuming conv layer) through :func:`ops.pallas_basis.basis_mlp_multi`,
    whose fused Pallas backward consumes the per-layer cotangents directly —
    eliminating the bandwidth-bound N-way dbasis sum + GELU-backward loop
    fusion that XLA otherwise materializes (~2.8 ms/step at the canonical
    shape, see out/r3 phase table).

    Attributes are treated as non-differentiable data (no poly cotangent):
    do not differentiate through positions/lattice with this path.
    """

    hidden_dim: int
    basis_dim: int
    degree: int
    n_out: int
    dtype: Optional[jnp.dtype] = None
    use_bias: bool = True
    out_bias: Optional[bool] = None  # None = follow use_bias

    @nn.compact
    def __call__(self, attrT: jax.Array) -> tuple:
        """``attrT``: lane-major invariant attributes ``[B', O, d, E]`` (edge
        axis last — see :func:`ops.pallas_basis.basis_mlp_multi` for why the
        transposed layout is the one that stores only real bytes on TPU)."""
        from arreau_tpu.ops.pallas_basis import basis_mlp_multi

        out_bias = self.use_bias if self.out_bias is None else self.out_bias
        in_dim = polynomial_feature_dim(attrT.shape[-2], self.degree)
        w1, b1 = _DenseParams(
            (in_dim, self.hidden_dim), self.use_bias, name="dense_in"
        )()
        w2, b2 = _DenseParams(
            (self.hidden_dim, self.basis_dim), out_bias, name="dense_out"
        )()
        if b1 is None:
            b1 = jnp.zeros((self.hidden_dim,), w1.dtype)
        if b2 is None:
            b2 = jnp.zeros((self.basis_dim,), w2.dtype)
        cdt = self.dtype or w1.dtype
        return basis_mlp_multi(
            attrT.astype(cdt), w1.astype(cdt), b1.astype(cdt),
            w2.astype(cdt), b2.astype(cdt), self.degree, self.n_out,
        )


class FiberBundleConv(nn.Module):
    """Separable depthwise R^3 x S^2 group convolution over the fixed-degree
    neighbor list.

    Step 1 (spatial): per-edge depthwise kernel from the (windowed) kernel
    basis, multiplied with the gathered sender features and mask-summed over
    the K neighbor slots.
    Step 2 (spherical): dense orientation mixing ``x[b,o,c] K[o,p,c] -> [b,p,c]``
    normalized by the grid size.

    The reference's train-time "self-calibrating init" (conv.py:49-51) is
    replaced by a kernel-init variance correction: the spatial kernel Dense is
    scaled by ``1/sqrt(expected_degree)`` so the sum over K neighbor slots is
    variance-preserving at init; an optional one-shot host-side calibration
    utility lives in arreau_tpu/models/calibrate.py.
    """

    channels: int
    expected_degree: float = 8.0
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False  # fused TPU kernel (no per-edge HBM tensors)
    return_messages: bool = True
    # with use_pallas: also fold the fiber mixing into the kernel. Measured on
    # v5e (out/r2/kernel_microbench.json): fused fwd is fastest but its bwd
    # (two K passes + in-kernel dfk) loses more than the fwd gains — the
    # split spatial-kernel + XLA einsum is ~13% faster per layer fwd+bwd.
    fuse_fiber: bool = False
    # Set True if anything differentiates through atom POSITIONS (forces,
    # geometry relaxation): the radial window's cotangent is then computed in
    # the backward kernel instead of skipped as dead work. All training paths
    # here differentiate wrt params only, so the default skips it.
    position_grads: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, A, O, C]; O-major [B', O, TA, C] when use_pallas
        kernel_basis: jax.Array,  # [B, A, K, O, D]; k-major O-major [B', O, K*TA, D] when use_pallas
        fiber_kernel_basis: jax.Array,  # [O, O, basis_dim]
        src: jax.Array,  # [B, A, K]
        edge_mask: jax.Array,  # [B, A, K]; gather matrix [B', K*TA, TA] when use_pallas
        window: Optional[jax.Array] = None,  # [B', E, 1] in-kernel window (split pallas)
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        scale = 1.0 / jnp.sqrt(self.expected_degree)
        basis_dim = kernel_basis.shape[-1]
        w_spatial = self.param(
            "kernel",
            nn.initializers.variance_scaling(scale, "fan_in", "truncated_normal"),
            (basis_dim, self.channels),
            jnp.float32,
        )
        w = w_spatial.astype(self.dtype) if self.dtype else w_spatial

        fiber_kernel = nn.Dense(
            self.channels, use_bias=False, name="fiber_kernel", dtype=self.dtype
        )(fiber_kernel_basis)  # [O, P, C]
        num_ori = fiber_kernel.shape[0]
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)

        if self.use_pallas and not self.return_messages:
            from arreau_tpu.ops.pallas_conv import fused_fiber_conv, fused_spatial_conv

            if self.fuse_fiber:
                # One fused kernel: spatial conv + K-reduce + fiber mixing,
                # all VMEM-resident per super-crystal (x is [B', O, TA, C]).
                y = fused_fiber_conv(
                    kernel_basis.astype(w.dtype),
                    w,
                    x.astype(w.dtype),
                    edge_mask,
                    fiber_kernel / num_ori,
                )  # [B', P, TA, C] f32 — orientation-major for the next layer
            else:
                # window_grad follows position_grads: unless something
                # differentiates through positions (the window's only
                # inputs), its cotangent is dead work in the backward kernel
                # bf16 compute: store the f32-accumulated conv output in bf16
                # (the fiber einsum below casts to bf16 anyway — identical
                # values, no separate convert pass, half the HBM writes)
                out_dt = (
                    jnp.bfloat16 if w.dtype == jnp.bfloat16 else jnp.float32
                )
                x_sp = fused_spatial_conv(
                    kernel_basis.astype(w.dtype), w, x.astype(w.dtype), edge_mask,
                    window, window_grad=self.position_grads, out_dtype=out_dt,
                )  # [B', O, TA, C] out_dt
                y = (
                    jnp.einsum(
                        "botc,opc->bptc",
                        x_sp.astype(w.dtype),
                        fiber_kernel,
                        preferred_element_type=jnp.float32,
                    )
                    / num_ori
                )
            return y + bias, None
        kernel = jnp.einsum(
            "bakod,dc->bakoc", kernel_basis.astype(w.dtype), w
        )  # [B, A, K, O, C]
        # Gather sender features along the atom axis of each crystal.
        B, A, K = src.shape
        idx = src.reshape(B, A * K)[:, :, None, None]  # [B, A*K, 1, 1]
        x_j = jnp.take_along_axis(x, idx, axis=1).reshape(B, A, K, *x.shape[2:])
        messages = kernel * x_j.astype(kernel.dtype)
        x_spatial = jnp.where(edge_mask[..., None, None], messages, 0.0).sum(axis=2)

        x_out = (
            jnp.einsum(
                "baoc,opc->bapc",
                x_spatial,
                fiber_kernel,
                preferred_element_type=jnp.float32,
            )
            / num_ori
        )
        return x_out + bias.astype(x_out.dtype), messages


class ConvNextBlock(nn.Module):
    """Pre-norm residual block around the fiber-bundle conv: conv -> LayerNorm
    -> widen Dense -> GELU -> Dense -> (layer_scale) -> +residual."""

    channels: int
    widening_factor: int = 4
    layer_scale_init: Optional[float] = 1e-6
    act: Callable = nn.gelu
    expected_degree: float = 8.0
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    return_messages: bool = True
    fuse_fiber: bool = False
    position_grads: bool = False
    # Fold LN -> widen -> GELU -> narrow -> layer_scale -> +residual (+ the
    # per-layer readout) into one Pallas kernel pair. MEASURED SLOWER on v5e
    # than the XLA chain (+2.7 ms/step at the canonical shape): Mosaic
    # serializes the VPU phases (GELU/LN and their backwards) against the
    # MXU matmuls within a program, while XLA overlaps them as fusion
    # prologues/epilogues across the dots. Kept opt-in with parity tests as
    # a documented negative result (out/r3 phase table).
    fuse_convnext: bool = False

    @nn.compact
    def __call__(self, x, kernel_basis, fiber_kernel_basis, src, edge_mask,
                 window=None, readout_params=None):
        """Returns ``(x_out, messages, readout_or_None)``. ``readout_params``
        (wr, br) — created by the caller so the param tree keeps the
        top-level ``readout_i`` naming — are consumed by the fused Pallas
        kernel's epilogue on the TPU path; on the flax path the caller
        applies its own Dense and passes None."""
        residual = x
        x, messages = FiberBundleConv(
            self.channels, expected_degree=self.expected_degree, dtype=self.dtype,
            use_pallas=self.use_pallas, return_messages=self.return_messages,
            fuse_fiber=self.fuse_fiber, position_grads=self.position_grads,
            name="conv",
        )(x, kernel_basis, fiber_kernel_basis, src, edge_mask, window)

        if (self.fuse_convnext and self.use_pallas
                and not self.return_messages and self.dtype is not None):
            # One fused kernel: LN -> widen -> GELU -> narrow -> layer_scale
            # -> +residual (+ the per-layer readout as an epilogue matmul);
            # same parameter tree as the flax chain below.
            from arreau_tpu.ops.pallas_convnext import fused_convnext_mlp

            C = self.channels
            ln = _LayerNormParams((C,), name="norm")()
            w1, b1 = _DenseParams((C, self.widening_factor * C), True,
                                  name="linear_1")()
            w2, b2 = _DenseParams((self.widening_factor * C, C), True,
                                  name="linear_2")()
            if self.layer_scale_init is not None:
                gamma = self.param(
                    "layer_scale",
                    nn.initializers.constant(self.layer_scale_init),
                    (C,), jnp.float32,
                )
            else:
                gamma = jnp.ones((C,), jnp.float32)
            wr, br = readout_params if readout_params is not None else (None, None)
            cdt = self.dtype
            out, readout = fused_convnext_mlp(
                x.astype(jnp.float32), residual.astype(cdt), ln[0], ln[1],
                w1.astype(cdt), b1.astype(cdt), w2.astype(cdt), b2.astype(cdt),
                gamma, wr, br, cdt,
            )
            return out, messages, readout

        # LayerNorm statistics in f32; the normalized stream continues in the
        # compute dtype (bf16 on TPU) so saved activations/converts stay half
        # width through the MLP and the next layer's conv. epsilon matches
        # torch.nn.LayerNorm (1e-5, the reference's norm — convnext.py:18) so
        # imported reference checkpoints reproduce the exact normalization.
        if self.dtype is not None and LN_NATIVE:
            # Experimental (r4): let flax upcast inside the stat reduction
            # instead of materializing an explicit f32 copy of the conv
            # output — the r3 phase table attributes ~2.2 ms/step of exposed
            # async-copy waits to exactly these f32 LN-stat blocks staged
            # through scoped VMEM S(1). Stats still accumulate in f32
            # (flax _compute_stats upcasts); the normalized output is bf16.
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        else:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x.astype(jnp.float32))
            if self.dtype is not None:
                x = x.astype(self.dtype)
        x = nn.Dense(self.widening_factor * self.channels, name="linear_1", dtype=self.dtype)(x)
        if GELU_SAVED and self.act is nn.gelu:
            x = gelu_save_deriv(x)  # r4 experiment: see gelu_save_deriv
        else:
            x = self.act(x)
        x = nn.Dense(self.channels, name="linear_2", dtype=self.dtype)(x)
        if self.layer_scale_init is not None:
            gamma = self.param(
                "layer_scale",
                nn.initializers.constant(self.layer_scale_init),
                (self.channels,),
                jnp.float32,
            )
            x = gamma.astype(x.dtype) * x
        return residual + x, messages, None
