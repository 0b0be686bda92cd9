"""Parity tests for the lattice codec against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from arreau_tpu.ops import lattice as lat


def _oracle_matrix_to_params(m):
    """Independent numpy implementation of the crystallographic convention."""
    lengths = np.linalg.norm(m, axis=-1)
    angles = np.zeros(3)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        cos = np.dot(m[j], m[k]) / (lengths[j] * lengths[k])
        angles[i] = np.arccos(np.clip(cos, -1, 1))
    return lengths, angles


def _random_lattices(n, seed=0):
    rng = np.random.default_rng(seed)
    # well-conditioned random lattices: random rotation-ish + diagonal dominance
    mats = rng.normal(size=(n, 3, 3)) + 4.0 * np.eye(3)
    return mats


def test_matrix_to_params_matches_oracle():
    mats = _random_lattices(16)
    lengths, angles = lat.matrix_to_params(jnp.asarray(mats))
    for i in range(len(mats)):
        ol, oa = _oracle_matrix_to_params(mats[i])
        np.testing.assert_allclose(np.asarray(lengths[i]), ol, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(angles[i]), oa, rtol=1e-10)


def test_params_roundtrip():
    """lattice_from_params(matrix_to_params(L)) preserves lengths and angles."""
    mats = _random_lattices(32, seed=1)
    lengths, angles = lat.matrix_to_params(jnp.asarray(mats))
    rebuilt = lat.lattice_from_params(lengths, angles)
    lengths2, angles2 = lat.matrix_to_params(rebuilt)
    np.testing.assert_allclose(np.asarray(lengths2), np.asarray(lengths), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(angles2), np.asarray(angles), rtol=1e-6, atol=1e-8)


def test_lattice_from_params_canonical_orientation():
    lengths = jnp.array([[2.0, 3.0, 4.0]])
    angles = jnp.deg2rad(jnp.array([[90.0, 90.0, 90.0]]))
    m = np.asarray(lat.lattice_from_params(lengths, angles))[0]
    # vector_c along +z; orthorhombic cell is axis-aligned up to convention
    np.testing.assert_allclose(m[2], [0, 0, 4.0], atol=1e-12)
    np.testing.assert_allclose(np.abs(np.linalg.det(m)), 24.0, rtol=1e-10)


def test_frac_cart_roundtrip():
    rng = np.random.default_rng(2)
    mats = jnp.asarray(_random_lattices(4, seed=3))
    frac = jnp.asarray(rng.uniform(size=(4, 7, 3)))
    cart = lat.frac_to_cart(frac, mats)
    back = lat.cart_to_frac_without_mod(cart, mats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(frac), rtol=1e-9, atol=1e-10)
    wrapped = lat.cart_to_frac(cart, mats)
    assert (np.asarray(wrapped) >= 0).all() and (np.asarray(wrapped) < 1).all()


def test_angle_codec_roundtrip():
    rng = np.random.default_rng(4)
    angles = jnp.asarray(rng.uniform(0.1, np.pi - 0.1, size=(5, 3)))
    decoded = lat.decode_angles(lat.encode_angles(angles))
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(angles), rtol=1e-12)


def test_symmetric_matrix_vector_roundtrip():
    rng = np.random.default_rng(5)
    m = rng.normal(size=(6, 3, 3))
    sym = lat.symmetrize_matrix(jnp.asarray(m))
    vec = lat.symmetric_matrix_to_vector(sym)
    back = lat.vector_to_symmetric_matrix(vec)
    np.testing.assert_allclose(np.asarray(back), np.asarray(sym), rtol=1e-12)


def test_polar_decomposition():
    mats = jnp.asarray(_random_lattices(8, seed=6))
    u, p = lat.polar_decomposition(mats)
    u_np, p_np = np.asarray(u), np.asarray(p)
    # u orthogonal, p symmetric PSD, u @ p == m
    for i in range(8):
        np.testing.assert_allclose(u_np[i] @ u_np[i].T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(p_np[i], p_np[i].T, atol=1e-9)
        np.testing.assert_allclose(u_np[i] @ p_np[i], np.asarray(mats)[i], atol=1e-8)


def test_volume():
    mats = jnp.asarray(_random_lattices(5, seed=7))
    np.testing.assert_allclose(
        np.asarray(lat.volume(mats)),
        np.abs(np.linalg.det(np.asarray(mats))),
        rtol=1e-10,
    )


def test_wrapped_angle_mse():
    # distance between 0.1 and 2*pi - 0.1 is 0.2 on the circle
    pred = jnp.array([[0.1]])
    tgt = jnp.array([[2 * np.pi - 0.1]])
    np.testing.assert_allclose(float(lat.wrapped_angle_mse(pred, tgt)), 0.2**2, rtol=1e-9)


@pytest.mark.parametrize(
    "family", ["cubic", "tetragonal", "orthorhombic", "monoclinic", "triclinic", "hexagonal", "rhombohedral"]
)
def test_bravais_angles(family):
    import jax

    angles = lat.sample_bravais_angles(jax.random.PRNGKey(0), family, 10, degrees=True)
    a = np.asarray(angles)
    assert a.shape == (10, 3)
    if family == "monoclinic":
        np.testing.assert_allclose(a[:, 0], 90.0)
        np.testing.assert_allclose(a[:, 2], 90.0)
        assert ((a[:, 1] >= 90) & (a[:, 1] <= 180)).all()
    if family == "hexagonal":
        np.testing.assert_allclose(a, np.broadcast_to([90.0, 90.0, 120.0], (10, 3)))
    if family == "rhombohedral":
        np.testing.assert_allclose(a[:, 0], a[:, 1])
        np.testing.assert_allclose(a[:, 0], a[:, 2])


def test_cubic_score_and_losses():
    cubic = lat.cubic_score(jnp.array([[4.0, 4.0, 4.0]]))
    np.testing.assert_allclose(float(cubic[0]), 1.0)
    skewed = lat.cubic_score(jnp.array([[2.0, 4.0, 6.0]]))
    assert float(skewed[0]) < 1.0

    mats = jnp.asarray(_random_lattices(4, seed=8))
    assert float(lat.vector_length_mse_loss(mats, mats)) < 1e-12

    inside = lat.angle_bound_loss(jnp.array([[90.0, 100.0, 80.0]]))
    np.testing.assert_allclose(float(inside), 0.0)
    outside = lat.angle_bound_loss(jnp.array([[150.0, 90.0, 40.0]]))
    assert float(outside) > 0


def test_ridge_pinv_matches_pinv_and_is_bounded():
    import jax.numpy as jnp
    import numpy as np

    from arreau_tpu.ops import lattice as lat

    rng = np.random.default_rng(5)
    L = jnp.asarray(rng.normal(size=(16, 3, 3)) + 4 * np.eye(3))
    np.testing.assert_allclose(
        np.asarray(lat.ridge_pinv_3x3(L)), np.asarray(jnp.linalg.pinv(L)),
        rtol=1e-8, atol=1e-10,
    )
    # near-singular lattices stay bounded (pinv's robustness requirement)
    sing = jnp.asarray(np.stack([np.diag([1e-12, 2.0, 3.0]), np.zeros((3, 3))]))
    out = np.asarray(lat.ridge_pinv_3x3(sing))
    assert np.isfinite(out).all()
