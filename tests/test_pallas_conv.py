"""Fused Pallas spatial-conv kernel: parity with the XLA oracle (interpret
mode on CPU; the same code compiles natively on TPU) and model-level parity
of the use_pallas backbone path."""

import jax
import jax.numpy as jnp
import numpy as np

from arreau_tpu.ops.pallas_conv import (
    fused_spatial_conv_standard_layout,
    reference_spatial_conv,
)


def _data(B=3, A=8, K=4, O=4, D=16, C=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    basis = jnp.asarray(rng.normal(size=(B, A, K, O, D)), dtype)
    w = jnp.asarray(rng.normal(size=(D, C)) * 0.1, dtype)
    x = jnp.asarray(rng.normal(size=(B, A, O, C)), dtype)
    src = jnp.asarray(rng.integers(0, A, size=(B, A, K)), jnp.int32)
    mask = jnp.asarray(rng.random((B, A, K)) > 0.3)
    return basis, w, x, src, mask


def test_fused_conv_forward_parity():
    basis, w, x, src, mask = _data()
    y_ref = reference_spatial_conv(basis, w, x, src, mask)
    y_pal = fused_spatial_conv_standard_layout(basis, w, x, src, mask)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )


def test_fused_conv_gradient_parity():
    basis, w, x, src, mask = _data(seed=1)

    def loss_p(basis, w, x):
        return (fused_spatial_conv_standard_layout(basis, w, x, src, mask) ** 2).sum()

    def loss_r(basis, w, x):
        return (reference_spatial_conv(basis, w, x, src, mask) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(basis, w, x)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(basis, w, x)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_model_pallas_path_matches_xla_path():
    """PonitaFiberBundle with use_pallas=True (interpret mode on CPU) must
    match the XLA path closely."""
    from arreau_tpu.models.ponita import PonitaConfig, PonitaFiberBundle
    from tests.test_ponita import _make_inputs

    base = dict(
        hidden_dim=16, basis_dim=8, degree=2, num_layers=2, radius=4.0,
        num_ori=4, output_dim_scalar=3, output_dim_vec=1,
        output_dim_global_scalar=2, output_dim_global_vec=0,
        output_dim_edge_scalar=0, remat=False,
    )
    cfg_x = PonitaConfig(**base, use_pallas=False)
    cfg_p = PonitaConfig(**base, use_pallas=True)
    inputs, _ = _make_inputs(jax.random.PRNGKey(0), cfg=cfg_x, dtype=jnp.float32)
    model_x = PonitaFiberBundle(cfg_x)
    model_p = PonitaFiberBundle(cfg_p)
    params = model_x.init(jax.random.PRNGKey(1), inputs)
    out_x = model_x.apply(params, inputs)
    out_p = model_p.apply(params, inputs)
    np.testing.assert_allclose(
        np.asarray(out_p.node_scalar), np.asarray(out_x.node_scalar), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.global_scalar), np.asarray(out_x.global_scalar), rtol=2e-4, atol=1e-5
    )
