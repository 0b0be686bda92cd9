"""Ponita backbone tests: shapes, masking independence, and SE(3) equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arreau_tpu.models.blocks import (
    polynomial_feature_dim,
    polynomial_features,
    scalar_to_sphere,
    sphere_to_scalar,
    sphere_to_vec,
    vec_to_sphere,
)
from arreau_tpu.models.ponita import (
    FiberBundleInputs,
    PonitaConfig,
    PonitaFiberBundle,
)
from arreau_tpu.ops.grids import cached_grid_s2, random_so3_matrix
from arreau_tpu.ops.pbc import pbc_neighbor_list

CFG = PonitaConfig(
    hidden_dim=16,
    basis_dim=8,
    degree=2,
    num_layers=2,
    radius=4.0,
    num_ori=6,
    output_dim_scalar=5,
    output_dim_vec=1,
    output_dim_global_scalar=3,
    output_dim_global_vec=1,
    output_dim_edge_scalar=1,
    remat=False,
)


def _make_inputs(key, B=2, A=6, F=4, V=2, cfg=CFG, dtype=jnp.float64):
    ks = jax.random.split(key, 5)
    lattice = (
        jax.random.normal(ks[0], (B, 3, 3), dtype) + 4.0 * jnp.eye(3, dtype=dtype)
    )
    frac = jax.random.uniform(ks[1], (B, A, 3), dtype)
    cart = jnp.einsum("bai,bij->baj", frac, lattice)
    num_atoms = jnp.array([A, A - 2])
    atom_mask = jnp.arange(A)[None, :] < num_atoms[:, None]
    nl = pbc_neighbor_list(cart, lattice, atom_mask, cfg.radius, 4)
    scalar = jax.random.normal(ks[2], (B, A, F), dtype)
    vec = jax.random.normal(ks[3], (B, A, V, 3), dtype)
    ori = jnp.asarray(cached_grid_s2(cfg.num_ori), dtype)
    return FiberBundleInputs(scalar, vec, nl, atom_mask, lattice, ori), cart


def test_polynomial_features_dims():
    x = jnp.ones((3, 4))
    for d in (1, 2, 3):
        out = polynomial_features(x, d)
        assert out.shape == (3, polynomial_feature_dim(4, d))
    # degree-2 content check: [x, outer(x, x).flatten()]
    x = jnp.array([[1.0, 2.0]])
    out = np.asarray(polynomial_features(x, 2))
    np.testing.assert_allclose(out, [[1, 2, 1, 2, 2, 4]])


def test_sphere_codecs_roundtrip():
    key = jax.random.PRNGKey(0)
    ori = jnp.asarray(cached_grid_s2(12))
    vec = jax.random.normal(key, (5, 2, 3), dtype=jnp.float64)
    sig = vec_to_sphere(vec, ori)
    rec = sphere_to_vec(sig, ori) * 3.0  # E[<v,w>w] = v/3 on S^2
    np.testing.assert_allclose(np.asarray(rec), np.asarray(vec), atol=0.25)
    s = jax.random.normal(key, (5, 4), dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(sphere_to_scalar(scalar_to_sphere(s, 12))), np.asarray(s), rtol=1e-12
    )


def test_ponita_shapes():
    inputs, _ = _make_inputs(jax.random.PRNGKey(0))
    model = PonitaFiberBundle(CFG)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out = model.apply(params, inputs)
    B, A, K = 2, 6, 4
    assert out.node_scalar.shape == (B, A, CFG.output_dim_scalar)
    assert out.node_vec.shape == (B, A, CFG.output_dim_vec, 3)
    assert out.global_scalar.shape == (B, CFG.output_dim_global_scalar)
    assert out.global_vec.shape == (B, CFG.output_dim_global_vec, 3)
    assert len(out.edge_scalar) == CFG.num_layers
    assert out.edge_scalar[0].shape == (B, A, K, CFG.output_dim_edge_scalar)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ponita_padding_independence():
    """Padded atom slots must not influence outputs on real atoms."""
    inputs, _ = _make_inputs(jax.random.PRNGKey(2))
    model = PonitaFiberBundle(CFG)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out1 = model.apply(params, inputs)

    # scribble junk into padded scalar/vec slots (crystal 1 has 2 padded atoms)
    pad = ~inputs.atom_mask
    scalar2 = jnp.where(pad[..., None], 77.0, inputs.scalar)
    vec2 = jnp.where(pad[..., None, None], -55.0, inputs.vec)
    out2 = model.apply(params, inputs._replace(scalar=scalar2, vec=vec2))

    mask = np.asarray(inputs.atom_mask)
    np.testing.assert_allclose(
        np.asarray(out1.node_scalar)[mask], np.asarray(out2.node_scalar)[mask], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out1.global_scalar), np.asarray(out2.global_scalar), rtol=1e-10
    )


def test_ponita_exact_equivariance_with_rotated_grid():
    """Rotating positions, lattice, vectors AND the orientation grid leaves
    scalar outputs exactly invariant and rotates vector outputs."""
    key = jax.random.PRNGKey(3)
    inputs, cart = _make_inputs(key)
    model = PonitaFiberBundle(CFG)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out = model.apply(params, inputs)

    R = random_so3_matrix(jax.random.PRNGKey(9))
    R = R.astype(jnp.float64)
    lattice_r = inputs.lattice @ R.T
    cart_r = cart @ R.T
    nl_r = pbc_neighbor_list(cart_r, lattice_r, inputs.atom_mask, CFG.radius, 4)
    inputs_r = FiberBundleInputs(
        scalar=inputs.scalar,
        vec=inputs.vec @ R.T,
        neighbors=nl_r,
        atom_mask=inputs.atom_mask,
        lattice=lattice_r,
        ori_grid=inputs.ori_grid @ R.T,
    )
    out_r = model.apply(params, inputs_r)

    mask = np.asarray(inputs.atom_mask)
    np.testing.assert_allclose(
        np.asarray(out_r.node_scalar)[mask],
        np.asarray(out.node_scalar)[mask],
        rtol=1e-7,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_r.global_scalar), np.asarray(out.global_scalar), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out_r.node_vec)[mask],
        np.asarray(out.node_vec @ R.T)[mask],
        rtol=1e-6,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_r.global_vec),
        np.asarray(out.global_vec @ R.T),
        rtol=1e-6,
        atol=1e-9,
    )


@pytest.mark.parametrize("num_ori", [16])
def test_ponita_approx_equivariance_fixed_grid(num_ori):
    """With the grid FIXED (the deployed setting), equivariance holds
    approximately — rotated inputs give closely matching scalar outputs."""
    cfg = PonitaConfig(
        hidden_dim=16,
        basis_dim=16,
        degree=2,
        num_layers=2,
        radius=4.0,
        num_ori=num_ori,
        output_dim_scalar=3,
        output_dim_vec=0,
        output_dim_global_scalar=2,
        output_dim_global_vec=0,
        output_dim_edge_scalar=0,
        remat=False,
    )
    key = jax.random.PRNGKey(4)
    inputs, cart = _make_inputs(key, cfg=cfg)
    model = PonitaFiberBundle(cfg)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out = model.apply(params, inputs)

    R = random_so3_matrix(jax.random.PRNGKey(11)).astype(jnp.float64)
    lattice_r = inputs.lattice @ R.T
    cart_r = cart @ R.T
    nl_r = pbc_neighbor_list(cart_r, lattice_r, inputs.atom_mask, cfg.radius, 4)
    inputs_r = inputs._replace(
        vec=inputs.vec @ R.T, neighbors=nl_r, lattice=lattice_r
    )
    out_r = model.apply(params, inputs_r)

    a = np.asarray(out.global_scalar)
    b = np.asarray(out_r.global_scalar)
    # relative deviation should be small (grid discretization error only)
    rel = np.abs(a - b) / (np.abs(a).mean() + 1e-8)
    assert rel.max() < 0.05, rel.max()


def test_make_ponita_factory_dispatch():
    from arreau_tpu.models import make_ponita, PonitaFiberBundle, PonitaPointCloud

    fb = make_ponita(num_ori=8, hidden_dim=16, basis_dim=8, num_layers=2,
                     output_dim_scalar=1)
    assert isinstance(fb, PonitaFiberBundle)
    assert fb.config.num_ori == 8

    pc = make_ponita(num_ori=-1, hidden_dim=16, basis_dim=8, num_layers=2,
                     output_dim_scalar=1)
    assert isinstance(pc, PonitaPointCloud)
    assert pc.config.lifted

    plain = make_ponita(num_ori=0, hidden_dim=16, basis_dim=8, num_layers=2,
                        output_dim_scalar=1)
    assert isinstance(plain, PonitaPointCloud)
    assert not plain.config.lifted


def test_stacked_readout_matches_per_layer():
    """The stacked readout (one concat_i(x_i) @ vstack_i(W_i) dot) is the
    same function of the same param tree as the per-layer readout dots."""
    import dataclasses

    inputs, _ = _make_inputs(jax.random.PRNGKey(7))
    stacked = PonitaFiberBundle(dataclasses.replace(CFG, stacked_readout=True))
    plain = PonitaFiberBundle(dataclasses.replace(CFG, stacked_readout=False))
    params = stacked.init(jax.random.PRNGKey(1), inputs)
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(
        jnp.shape, plain.init(jax.random.PRNGKey(1), inputs)
    )
    out_s = stacked.apply(params, inputs)
    out_p = plain.apply(params, inputs)
    # readout params/compute are f32 (param_dtype pinned like nn.Dense), so
    # every output carries f32-precision content even in f64-typed leaves;
    # one wide dot vs L narrow dots reassociates the f32 accumulation
    for a, b in zip(jax.tree_util.tree_leaves(out_s), jax.tree_util.tree_leaves(out_p)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * max(np.abs(b).max(), 1e-30))

    def loss(mod, p):
        out = mod.apply(p, inputs)
        return sum((jnp.asarray(leaf) ** 2).sum() for leaf in jax.tree_util.tree_leaves(out))

    g_s = jax.grad(lambda p: loss(stacked, p))(params)
    g_p = jax.grad(lambda p: loss(plain, p))(params)
    # f32 param grads see accumulation-order reassociation (one wide dot vs
    # L narrow dots) -> differences at f32 epsilon
    for a, b in zip(jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_p)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * max(np.abs(b).max(), 1e-30))
