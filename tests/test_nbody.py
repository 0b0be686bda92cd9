"""N-body simulator physics parity (vs a step-by-step numpy oracle), dataset
IO, radius graph, and task training smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arreau_tpu.data.nbody import (
    DT,
    MAX_F,
    generate_nbody_npz,
    load_nbody_split,
    simulate_charged,
)
from arreau_tpu.ops.radius import radius_neighbor_list
from arreau_tpu.tasks.nbody import NBodyBatch, NBodyConfig, NBodyModel, rotate_nbody_batch


def _oracle_trajectory(loc0, vel0, coupling, T, sample_freq):
    """Independent numpy leapfrog matching the published reference physics:
    initial kick, then per step move -> sample(pre-kick vel) -> kick."""
    def forces(loc):
        n = loc.shape[0]
        diff = loc[:, None, :] - loc[None, :, :]
        dist3 = (np.sum(diff**2, axis=-1)) ** 1.5
        with np.errstate(divide="ignore", invalid="ignore"):
            size = coupling / dist3
        np.fill_diagonal(size, 0.0)
        f = (size[..., None] * diff).sum(axis=1)
        return np.clip(f, -MAX_F, MAX_F)

    loc, vel = loc0.copy(), vel0.copy()
    vel = vel + DT * forces(loc)
    frames_loc, frames_vel = [], []
    for i in range(1, T):
        loc = loc + DT * vel
        if i % sample_freq == 0:
            frames_loc.append(loc.copy())
            frames_vel.append(vel.copy())
        vel = vel + DT * forces(loc)
    return np.stack(frames_loc), np.stack(frames_vel)


def test_simulator_matches_oracle():
    T, freq = 600, 100
    loc, vel, edges, charges = simulate_charged(
        jax.random.PRNGKey(0), num_sims=3, T=T, sample_freq=freq
    )
    assert loc.shape == (3, T // freq - 1, 5, 3)
    # reconstruct initial conditions is not possible from outputs; instead
    # re-run the jax sim's own start state through the oracle by extracting
    # frame alignment: run oracle from scratch with same RNG draws.
    key = jax.random.PRNGKey(0)
    k_q, k_loc, k_vel = jax.random.split(key, 3)
    n = 5
    charges0 = np.where(np.asarray(jax.random.bernoulli(k_q, 0.5, (3, n))), 1.0, -1.0)
    np.testing.assert_array_equal(charges0, charges)
    loc_std = 1.0
    loc0 = np.asarray(jax.random.normal(k_loc, (3, n, 3))) * loc_std
    vel0 = np.asarray(jax.random.normal(k_vel, (3, n, 3)))
    vel0 = vel0 * 0.5 / np.linalg.norm(vel0, axis=-1, keepdims=True)
    for s in range(3):
        coupling = np.outer(charges0[s], charges0[s])
        oloc, ovel = _oracle_trajectory(loc0[s], vel0[s], coupling, T, freq)
        np.testing.assert_allclose(loc[s], oloc, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(vel[s], ovel, rtol=1e-4, atol=1e-6)


def test_npz_roundtrip(tmp_path):
    d = str(tmp_path)
    generate_nbody_npz(d, num_train=4, num_valid=3, num_test=2, T=500, sample_freq=10)
    ex = load_nbody_split(d, "train", "nbody_small")
    assert ex.loc0.shape == (4, 5, 3)
    assert ex.charges.shape == (4, 5)
    assert set(np.unique(ex.charges)) <= {-1.0, 1.0}
    assert np.isfinite(ex.loc_end).all()
    ex_val = load_nbody_split(d, "val", "nbody_small")
    assert len(ex_val) == 3


def test_radius_neighbor_list_fully_connected():
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)))
    mask = jnp.ones((2, 5), bool)
    nl = radius_neighbor_list(pos, mask, radius=1000.0, max_neighbors=5, loop=True)
    assert np.asarray(nl.mask).all()
    # nearest neighbor of each node is itself (dist 0) with loop=True
    assert (np.asarray(nl.dist)[:, :, 0] == 0).all()
    nl2 = radius_neighbor_list(pos, mask, radius=1000.0, max_neighbors=5, loop=False)
    m2 = np.asarray(nl2.mask)
    assert m2[:, :, :4].all() and not m2[:, :, 4].any()
    src2 = np.asarray(nl2.src)
    for b in range(2):
        for i in range(5):
            assert i not in src2[b, i, :4]


def test_nbody_task_learns():
    cfg = NBodyConfig(hidden_dim=16, basis_dim=8, degree=2, num_layers=2, num_ori=4)
    model = NBodyModel(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    batch = NBodyBatch(
        pos=jnp.asarray(rng.normal(size=(8, 5, 3))),
        vel=jnp.asarray(rng.normal(size=(8, 5, 3))),
        charges=jnp.asarray(rng.choice([-1.0, 1.0], size=(8, 5))),
        target_pos=jnp.asarray(rng.normal(size=(8, 5, 3)) * 0.1),
    )
    params = model.init(jax.random.PRNGKey(0), batch)

    from arreau_tpu.train.loop import make_train_step
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    tx = make_optimizer(5e-3)
    state = create_train_state(params, tx)
    step = make_train_step(model.loss, tx, donate=False)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(40):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, batch)
        losses.append(float(m["mse"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_nbody_rotation_augmentation_equivariance():
    """Rotating the inputs should rotate the prediction (statistically exact
    for scalar MSE: loss of rotated batch ~= loss of original for an
    equivariant model when the grid is rotated too; here we check the
    augmentation helper itself rotates consistently)."""
    rng = np.random.default_rng(1)
    batch = NBodyBatch(
        pos=jnp.asarray(rng.normal(size=(4, 5, 3))),
        vel=jnp.asarray(rng.normal(size=(4, 5, 3))),
        charges=jnp.asarray(rng.choice([-1.0, 1.0], size=(4, 5))),
        target_pos=jnp.asarray(rng.normal(size=(4, 5, 3))),
    )
    rot = rotate_nbody_batch(jax.random.PRNGKey(2), batch)
    # distances between particles preserved
    def pdist(x):
        return np.linalg.norm(np.asarray(x)[:, :, None] - np.asarray(x)[:, None], axis=-1)

    np.testing.assert_allclose(pdist(rot.pos), pdist(batch.pos), rtol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot.vel), axis=-1),
        np.linalg.norm(np.asarray(batch.vel), axis=-1),
        rtol=1e-9,
    )
    np.testing.assert_array_equal(rot.charges, batch.charges)


@pytest.mark.slow
def test_train_cli_scan_epoch_path(tmp_path):
    """End-to-end smoke of the scanned-epoch fast path in the train CLI:
    tiny model, tiny generated dataset, --scan_epoch=True forces the jitted
    lax.scan loop regardless of device count. Training MSE must improve and
    the final test MSE be finite."""
    from arreau_tpu.cli import train_nbody

    test_mse = train_nbody.main([
        "--epochs=6",
        "--val_interval=3",
        "--batch_size=20",
        "--max_training_samples=60",
        "--generate_train=60",
        "--scan_epoch=True",
        "--hidden_dim=16",
        "--basis_dim=8",
        "--degree=2",
        "--layers=2",
        "--num_ori=4",
        f"--data_dir={tmp_path / 'data'}",
        f"--checkpoint_dir={tmp_path / 'ckpt'}",
    ])
    assert np.isfinite(test_mse)
