"""Point-cloud Ponita modes: shapes, equivariance/invariance, QM9/MD17 task
learning smoke, and force consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arreau_tpu.data.molecules import dimenet_split, synthetic_molecules
from arreau_tpu.models.point_cloud import (
    PointCloudConfig,
    PointCloudInputs,
    PonitaPointCloud,
)
from arreau_tpu.ops.grids import random_so3_matrix
from arreau_tpu.ops.radius import radius_neighbor_list
from arreau_tpu.tasks.md17 import MD17Batch, MD17Config, MD17Model
from arreau_tpu.tasks.qm9 import MoleculeBatch, QM9Config, QM9Model
from arreau_tpu.train.loop import make_train_step
from arreau_tpu.train.optim import make_optimizer
from arreau_tpu.train.state import create_train_state

CFG = PointCloudConfig(
    hidden_dim=16, basis_dim=8, degree=2, num_layers=2,
    output_dim_scalar=2, lifted=True, graph_pooling=True,
)


def _inputs(key, B=2, N=6, F=3, lifted=True, dtype=jnp.float64):
    ks = jax.random.split(key, 3)
    pos = jax.random.normal(ks[0], (B, N, 3), dtype)
    mask = jnp.asarray(np.arange(N)[None, :] < np.array([[N], [N - 2]]))
    nb = radius_neighbor_list(pos, mask, 1000.0, 4, loop=not lifted)
    scalar = jax.random.normal(ks[1], (B, N, F), dtype)
    return PointCloudInputs(
        pos=pos, scalar=scalar, vec=jnp.zeros((B, N, 0, 3), dtype),
        neighbors=nb, node_mask=mask,
    ), pos, mask


@pytest.mark.slow
def test_lifted_point_cloud_shapes_and_invariance():
    inputs, pos, mask = _inputs(jax.random.PRNGKey(0))
    model = PonitaPointCloud(CFG)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out = model.apply(params, inputs)
    assert out.scalar.shape == (2, 2)
    assert np.isfinite(np.asarray(out.scalar)).all()

    # graph-level scalar is exactly rotation invariant in point-cloud mode
    # (all attributes are scalar invariants of the geometry)
    R = random_so3_matrix(jax.random.PRNGKey(3)).astype(jnp.float64)
    pos_r = pos @ R.T
    nb_r = radius_neighbor_list(pos_r, mask, 1000.0, 4, loop=False)
    out_r = model.apply(params, inputs._replace(pos=pos_r, neighbors=nb_r))
    np.testing.assert_allclose(
        np.asarray(out_r.scalar), np.asarray(out.scalar), rtol=1e-8
    )


def test_lifted_point_cloud_padding_independence():
    inputs, pos, mask = _inputs(jax.random.PRNGKey(4))
    model = PonitaPointCloud(CFG)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out1 = model.apply(params, inputs)
    junk = jnp.where(mask[..., None], inputs.scalar, 123.0)
    out2 = model.apply(params, inputs._replace(scalar=junk))
    np.testing.assert_allclose(np.asarray(out1.scalar), np.asarray(out2.scalar), rtol=1e-9)


def test_plain_point_cloud_mode():
    cfg = PointCloudConfig(
        hidden_dim=16, basis_dim=8, degree=2, num_layers=2,
        output_dim_scalar=1, lifted=False, graph_pooling=True,
    )
    inputs, pos, mask = _inputs(jax.random.PRNGKey(5), lifted=False)
    model = PonitaPointCloud(cfg)
    params = model.init(jax.random.PRNGKey(1), inputs)
    out = model.apply(params, inputs)
    assert out.scalar.shape == (2, 1)
    assert np.isfinite(np.asarray(out.scalar)).all()


@pytest.mark.slow
def test_qm9_task_learns():
    data = synthetic_molecules(32, seed=0, max_atoms=6, min_atoms=4)
    shift, scale = float(np.mean(data.y)), float(np.std(data.y))
    cfg = QM9Config(hidden_dim=16, basis_dim=8, degree=2, num_layers=2, max_neighbors=4)
    model = QM9Model(cfg, shift, scale, dtype=jnp.float64)
    batch = MoleculeBatch(
        pos=jnp.asarray(data.pos, jnp.float64),
        one_hot=jnp.asarray(data.one_hot, jnp.float64),
        mask=jnp.asarray(data.mask),
        y=jnp.asarray(data.y),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(5e-3)
    state = create_train_state(params, tx)
    step = make_train_step(model.loss, tx, donate=False)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(50):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


@pytest.mark.slow
def test_md17_forces_are_negative_energy_gradient():
    data = synthetic_molecules(8, seed=1, max_atoms=5, min_atoms=5, with_forces=True)
    cfg = MD17Config(hidden_dim=16, basis_dim=8, degree=2, num_layers=2, max_neighbors=4)
    model = MD17Model(cfg, 0.0, 1.0, dtype=jnp.float64)
    batch = MD17Batch(
        pos=jnp.asarray(data.pos, jnp.float64),
        one_hot=jnp.asarray(data.one_hot, jnp.float64),
        mask=jnp.asarray(data.mask),
        energy=jnp.asarray(data.y),
        force=jnp.asarray(data.forces, jnp.float64),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    energy, force = model.predict_energy_and_force(params, batch)
    assert np.isfinite(np.asarray(force)).all()

    # finite-difference check of -dE/dx for one coordinate
    eps = 1e-6
    pos2 = batch.pos.at[0, 1, 2].add(eps)
    e2 = model.predict_energy(params, pos2, batch)
    fd = -(float(e2[0]) - float(energy[0])) / eps
    np.testing.assert_allclose(fd, float(force[0, 1, 2]), rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_md17_task_learns_forces():
    data = synthetic_molecules(16, seed=2, max_atoms=5, min_atoms=5, with_forces=True)
    shift = float(np.mean(data.y))
    scale = float(np.sqrt(np.mean(data.forces**2)))
    cfg = MD17Config(hidden_dim=16, basis_dim=8, degree=2, num_layers=2, max_neighbors=4)
    model = MD17Model(cfg, shift, scale, dtype=jnp.float64)
    batch = MD17Batch(
        pos=jnp.asarray(data.pos, jnp.float64),
        one_hot=jnp.asarray(data.one_hot, jnp.float64),
        mask=jnp.asarray(data.mask),
        energy=jnp.asarray(data.y),
        force=jnp.asarray(data.forces, jnp.float64),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(3e-3)
    state = create_train_state(params, tx)
    step = make_train_step(model.loss, tx, donate=False)
    losses = []
    key = jax.random.PRNGKey(3)
    for _ in range(40):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    # rotation-repeat test path runs and returns finite MAEs
    results = model.test_repeats(state.params, jax.random.PRNGKey(4), batch, repeats=2)
    for e_mae, f_mae in results:
        assert np.isfinite(float(e_mae)) and np.isfinite(float(f_mae))


def test_dimenet_split_scales_down():
    tr, va, te = dimenet_split(100)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert len(np.unique(np.concatenate([tr, va, te]))) == 100


@pytest.mark.slow
def test_md17_forces_finite_with_padded_atoms():
    """Regression: masked neighbor slots must not produce NaN gradients when
    differentiating energies through the neighbor list (sqrt-at-zero)."""
    data = synthetic_molecules(4, seed=3, max_atoms=8, min_atoms=4, with_forces=True)
    cfg = MD17Config(hidden_dim=8, basis_dim=8, degree=2, num_layers=1, max_neighbors=4)
    model = MD17Model(cfg, 0.0, 1.0, dtype=jnp.float64)
    batch = MD17Batch(
        pos=jnp.asarray(data.pos, jnp.float64),
        one_hot=jnp.asarray(data.one_hot, jnp.float64),
        mask=jnp.asarray(data.mask),
        energy=jnp.asarray(data.y),
        force=jnp.asarray(data.forces, jnp.float64),
    )
    assert not bool(batch.mask.all()), "fixture should include padded atoms"
    params = model.init(jax.random.PRNGKey(0), batch)
    _, force = model.predict_energy_and_force(params, batch)
    assert np.isfinite(np.asarray(force)).all()
    loss, metrics = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
