"""Parity tests for PBC geometry: min-image distance and the fixed-degree
radius graph, against brute-force numpy oracles."""

import itertools

import numpy as np
import jax.numpy as jnp

from arreau_tpu.ops import lattice as lat
from arreau_tpu.ops import pbc

OFFSETS = np.array(list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.float64)


def _random_crystals(B, A, seed=0):
    rng = np.random.default_rng(seed)
    lattices = rng.normal(size=(B, 3, 3)) + 5.0 * np.eye(3)
    frac = rng.uniform(size=(B, A, 3))
    num_atoms = rng.integers(2, A + 1, size=(B,))
    mask = np.arange(A)[None, :] < num_atoms[:, None]
    return lattices, frac, mask


def _oracle_min_image(c1, c2, L):
    """Brute-force min over 27 images of |c1 - (c2 + o @ L)|^2 per atom."""
    best_sqr = np.full(c1.shape[0], np.inf)
    best_vec = np.zeros_like(c1)
    for o in OFFSETS:
        vec = c1 - (c2 + o @ L)
        sqr = (vec**2).sum(-1)
        upd = sqr < best_sqr
        best_sqr = np.where(upd, sqr, best_sqr)
        best_vec = np.where(upd[:, None], vec, best_vec)
    return best_sqr, best_vec


def test_min_distance_pbc_matches_bruteforce():
    lattices, frac, _ = _random_crystals(4, 6, seed=10)
    rng = np.random.default_rng(11)
    frac2 = frac + rng.normal(scale=0.3, size=frac.shape)
    cart1 = np.einsum("bni,bij->bnj", frac % 1, lattices)
    cart2 = np.einsum("bni,bij->bnj", frac2 % 1, lattices)

    sqr, vec = pbc.min_distance_pbc(jnp.asarray(cart1), jnp.asarray(cart2), jnp.asarray(lattices))
    for b in range(4):
        osqr, ovec = _oracle_min_image(cart1[b], cart2[b], lattices[b])
        np.testing.assert_allclose(np.asarray(sqr[b]), osqr, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(vec[b]), ovec, rtol=1e-8, atol=1e-9)


def _oracle_edges(cart, L, mask, radius, max_neighbors):
    """Brute-force per-receiver neighbor sets: (src, image, dist) lists of the
    K nearest in-radius candidates."""
    A = cart.shape[0]
    out = []
    for i in range(A):
        cands = []
        if not mask[i]:
            out.append(cands)
            continue
        for j in range(A):
            if not mask[j]:
                continue
            for ci, o in enumerate(OFFSETS):
                vec = cart[j] + o @ L - cart[i]
                sqr = (vec**2).sum()
                if sqr <= radius * radius and sqr > 1e-4:
                    cands.append((sqr, j, ci))
        cands.sort(key=lambda x: x[0])
        out.append(cands[:max_neighbors])
    return out


def test_pbc_neighbor_list_matches_bruteforce():
    B, A, K, radius = 3, 8, 5, 4.0
    lattices, frac, mask = _random_crystals(B, A, seed=12)
    cart = np.einsum("bni,bij->bnj", frac, lattices)

    nl = pbc.pbc_neighbor_list(
        jnp.asarray(cart), jnp.asarray(lattices), jnp.asarray(mask), radius, K
    )
    src = np.asarray(nl.src)
    image = np.asarray(nl.image)
    dist = np.asarray(nl.dist)
    direction = np.asarray(nl.direction)
    nmask = np.asarray(nl.mask)

    for b in range(B):
        oracle = _oracle_edges(cart[b], lattices[b], mask[b], radius, K)
        for i in range(A):
            got = [
                (src[b, i, k], image[b, i, k], dist[b, i, k])
                for k in range(K)
                if nmask[b, i, k]
            ]
            want = oracle[i]
            assert len(got) == len(want), (b, i, got, want)
            # same multiset of (j, image) pairs and matching distances
            got_sorted = sorted(got, key=lambda x: x[2])
            for (gj, gc, gd), (wsqr, wj, wc) in zip(got_sorted, want):
                np.testing.assert_allclose(gd, np.sqrt(wsqr), rtol=1e-9)
            assert sorted((g[0], g[1]) for g in got) == sorted((w[1], w[2]) for w in want) or (
                # ties in distance can legitimately swap picks; compare distances only
                np.allclose(
                    sorted(g[2] for g in got), sorted(np.sqrt(w[0]) for w in want), rtol=1e-9
                )
            )
            # direction vectors consistent: |direction| == dist, direction = r_j + o@L - r_i
            for k in range(K):
                if nmask[b, i, k]:
                    j, c = src[b, i, k], image[b, i, k]
                    expect = cart[b, j] + OFFSETS[c] @ lattices[b] - cart[b, i]
                    np.testing.assert_allclose(direction[b, i, k], expect, rtol=1e-8, atol=1e-9)


def test_neighbor_list_masked_atoms_have_no_edges():
    B, A, K = 2, 6, 4
    lattices, frac, mask = _random_crystals(B, A, seed=13)
    cart = np.einsum("bni,bij->bnj", frac, lattices)
    nl = pbc.pbc_neighbor_list(jnp.asarray(cart), jnp.asarray(lattices), jnp.asarray(mask), 5.0, K)
    nmask = np.asarray(nl.mask)
    src = np.asarray(nl.src)
    for b in range(B):
        for i in range(A):
            if not mask[b, i]:
                assert not nmask[b, i].any()
            for k in range(K):
                if nmask[b, i, k]:
                    assert mask[b, src[b, i, k]]


def test_ve_wrapped_target_is_consistent():
    """The VE forward's wrapped eps is the min-image displacement noisy − clean,
    so subtracting it moves the noisy point back onto (an image of) the clean
    point: frac_noisy − eps ≡ frac_x0 (mod 1)."""
    import jax
    from arreau_tpu.diffusion.ve import make_ve_schedule, ve_forward_pbc

    B, A = 3, 5
    lattices, frac, _ = _random_crystals(B, A, seed=14)
    sched = make_ve_schedule(100, 0.001, 1.0, dtype=jnp.float64)
    t = jnp.array([5, 50, 99])
    noisy, eps, sigmas = ve_forward_pbc(
        sched, jax.random.PRNGKey(0), jnp.asarray(frac), t, jnp.asarray(lattices)
    )
    recon = (np.asarray(noisy) - np.asarray(eps)) % 1.0
    diff = np.abs(recon - frac % 1.0)
    diff = np.minimum(diff, 1 - diff)
    assert diff.max() < 1e-6


def test_neighbor_list_chunked_matches_direct():
    """The receiver-chunked selection path (large-A buckets) must produce the
    same neighbor list as the single-shot path."""
    lattices, frac, mask = _random_crystals(3, 12, seed=21)
    cart = np.einsum("bai,bij->baj", frac, lattices)
    direct = pbc.pbc_neighbor_list(
        jnp.asarray(cart), jnp.asarray(lattices), jnp.asarray(mask), 5.0, 6,
        max_select_elems=1 << 30,
    )
    # force chunking down to 1-4 receivers per chunk
    chunked = pbc.pbc_neighbor_list(
        jnp.asarray(cart), jnp.asarray(lattices), jnp.asarray(mask), 5.0, 6,
        max_select_elems=3 * 4 * 12 * 27,
    )
    assert pbc._select_chunk_size(3, 12, 3 * 4 * 12 * 27) < 12
    np.testing.assert_array_equal(np.asarray(direct.src), np.asarray(chunked.src))
    np.testing.assert_array_equal(np.asarray(direct.image), np.asarray(chunked.image))
    np.testing.assert_array_equal(np.asarray(direct.mask), np.asarray(chunked.mask))
    np.testing.assert_allclose(
        np.asarray(direct.dist), np.asarray(chunked.dist), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(direct.direction), np.asarray(chunked.direction), rtol=1e-12, atol=1e-12
    )


def test_neighbor_list_gradients_flow_and_are_finite():
    """Gradients reach cart and lattice through dist/direction (the
    differentiable recompute phase), including under chunking."""
    import jax

    lattices, frac, mask = _random_crystals(2, 8, seed=22)
    cart = np.einsum("bai,bij->baj", frac, lattices)

    def loss(cart, lattice, max_elems):
        nl = pbc.pbc_neighbor_list(
            cart, lattice, jnp.asarray(mask), 5.0, 4, max_select_elems=max_elems
        )
        return jnp.sum(nl.dist**2) + jnp.sum(nl.direction**2)

    for max_elems in (1 << 30, 2 * 2 * 8 * 27):
        g_cart, g_lat = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(cart), jnp.asarray(lattices), max_elems
        )
        assert np.isfinite(np.asarray(g_cart)).all()
        assert np.isfinite(np.asarray(g_lat)).all()
        assert np.abs(np.asarray(g_cart)).sum() > 0
        assert np.abs(np.asarray(g_lat)).sum() > 0
