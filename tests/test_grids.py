"""Tests for orientation grids and random rotations."""

import numpy as np
import jax
import jax.numpy as jnp

from arreau_tpu.ops import grids


def test_uniform_grid_s1():
    g = np.asarray(grids.uniform_grid_s1(8))
    assert g.shape == (8, 2)
    np.testing.assert_allclose((g**2).sum(-1), 1.0, rtol=1e-6)
    # first point is (1, 0); equally spaced
    np.testing.assert_allclose(g[0], [1.0, 0.0], atol=1e-7)
    angles = np.arctan2(g[:, 1], g[:, 0])
    diffs = np.diff(np.unwrap(angles))
    np.testing.assert_allclose(diffs, 2 * np.pi / 8, rtol=1e-5)


def test_uniform_grid_s2_near_uniform():
    n = 16
    g = np.asarray(grids.uniform_grid_s2(n, jax.random.PRNGKey(0)))
    assert g.shape == (n, 3)
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, rtol=1e-5)
    # nearest-neighbor geodesic distances should be fairly even after repulsion
    dots = np.clip(g @ g.T, -1, 1)
    geo = np.arccos(dots)
    np.fill_diagonal(geo, np.inf)
    nn = geo.min(axis=1)
    assert nn.min() > 0.3  # no near-duplicate orientations
    assert nn.std() / nn.mean() < 0.35


def test_random_so3_matrix_is_rotation():
    R = np.asarray(grids.random_so3_matrix(jax.random.PRNGKey(1), (10,)))
    for i in range(10):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, rtol=1e-9)


def test_random_so2_matrix_is_rotation():
    R = np.asarray(grids.random_so2_matrix(jax.random.PRNGKey(2), (10,)))
    for i in range(10):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(2), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, rtol=1e-9)


def test_quat_to_matrix_identity():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(grids.quat_to_matrix(q)), np.eye(3), atol=1e-12)


def test_rotation_converters_roundtrip():
    from arreau_tpu.ops import rotations as rot

    key = jax.random.PRNGKey(0)
    q = rot.random_quat(key, (16,))
    # canonical sign (w >= 0) for comparison
    q = jnp.where(q[:, :1] < 0, -q, q)
    m = rot.quat_to_matrix(q)
    q2 = rot.matrix_to_quat(m)
    q2 = jnp.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-8)

    e = rot.matrix_to_euler(m)
    m2 = rot.euler_to_matrix(e)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-8)


def test_rotation_geodesic_and_slerp():
    from arreau_tpu.ops import rotations as rot

    q1 = rot.random_quat(jax.random.PRNGKey(1), (8,))
    q2 = rot.random_quat(jax.random.PRNGKey(2), (8,))
    d_q = rot.geodesic_distance_quat(q1, q2)
    d_m = rot.geodesic_distance_matrix(rot.quat_to_matrix(q1), rot.quat_to_matrix(q2))
    # SO(3) angle = 2 * quaternion angle (double cover)
    np.testing.assert_allclose(np.asarray(d_m), 2 * np.asarray(d_q), atol=1e-5)

    mid = rot.slerp(q1, q2, jnp.asarray(0.5))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(mid), axis=-1), 1.0, atol=1e-9)
    d1 = rot.geodesic_distance_quat(q1, mid)
    d2 = rot.geodesic_distance_quat(mid, q2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    # identity endpoints
    np.testing.assert_allclose(
        np.asarray(rot.slerp(q1, q1, jnp.asarray(0.3))), np.asarray(q1), atol=1e-6
    )


def test_quat_mul_matches_matrix_product():
    from arreau_tpu.ops import rotations as rot

    q1 = rot.random_quat(jax.random.PRNGKey(3), (5,))
    q2 = rot.random_quat(jax.random.PRNGKey(4), (5,))
    m = rot.quat_to_matrix(rot.quat_mul(q1, q2))
    m2 = rot.quat_to_matrix(q1) @ rot.quat_to_matrix(q2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-8)
