"""Parity tests that use the reference's OWN executable code as the oracle.

Every other parity test in this suite checks against oracles we re-derived
(brute-force PBC search, hand-written schedule formulas). This tier closes the
"misread the reference" hole: ``torch`` (CPU) is in the image and the
reference's entire math core is pure torch with no PyG/Lightning dependency,
so we import it from /root/reference and assert parity directly.

SECURITY NOTE (ADVICE r4): the reference checkout is untrusted public
content, and importing its modules EXECUTES its code at test-collection
time. Accepted deliberately for this parity oracle, with the blast radius
kept minimal: imports are limited to the pure-math modules enumerated below
(diffusion_helpers / lattice_helpers / d3pm / ponita geometry+utils — no
CLI, no IO, no network paths exist in them), the checkout is read-only, and
the same policy applies to the other oracle tiers
(test_import_e2e_bound.py, test_reference_grad_parity.py,
test_chain_oracle.py). Vet any new reference import before adding it here:

  * ``radius_graph_pbc`` golden edge sets (diffusion_helpers.py:328-564),
    uncapped + capped + a deliberate-tie crystal for the max_neighbors
    tie-break semantics (:492-545);
  * ``min_distance_sqr_pbc`` values and min-image vectors (:254-325);
  * ``VE_pbc`` sigma ladder / forward wrapped target / reverse step (:28-81),
    with the jax-side noise injected into the torch code via monkeypatching
    ``torch.randn_like`` so both sides see identical draws;
  * ``VP`` / ``VP_lattice`` schedule tables and every reverse variant
    (:84-220), run on the reference's own tables for exactness;
  * ``D3PM`` tables / q_posterior_logits / loss / q_sample / reverse
    (d3pm.py:25-215) with shared uniform draws;
  * the lattice codec (lattice_helpers.py:5-105), windowing
    (ponita/utils/windowing.py), sphere codecs (ponita/utils/to_from_sphere.py),
    fiber-bundle invariants (ponita/geometry/invariants.py:10-47), the
    MatterGen-A39 edge scalars (ponita/transforms/invariants.py:79-87
    semantics), and the Gaussian Fourier time embedding
    (diffusion_helpers.py:14-25).

Documented deliberate deviations (each bounded here):
  * inv2 of the fiber-bundle invariants adds 1e-16 under the sqrt for a
    finite gradient at zero rejection — bounded by eps^2/(2 sqrt(x)),
    asserted at atol 1e-12;
  * ``cart_to_frac`` uses a damped closed-form pinv instead of SVD pinv —
    equal to ~1e-10 for well-conditioned lattices (asserted);
  * the VP tables are built in fp64 here vs the reference's hardcoded fp32
    ``torch.arange(dtype=torch.float)`` — table parity asserted at fp32
    resolution, then all step functions are run ON the reference's tables so
    the step-formula comparison is exact.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

from diffusion import diffusion_helpers as ref_dh  # noqa: E402
from diffusion import lattice_helpers as ref_lh  # noqa: E402
from diffusion.d3pm import D3PM as RefD3PM  # noqa: E402
from ponita.geometry import invariants as ref_inv  # noqa: E402
from ponita.utils import to_from_sphere as ref_sphere  # noqa: E402
from ponita.utils.windowing import PolynomialCutoff as RefPolynomialCutoff  # noqa: E402

from arreau_tpu.diffusion import d3pm as my_d3pm  # noqa: E402
from arreau_tpu.diffusion import ve as my_ve  # noqa: E402
from arreau_tpu.diffusion import vp as my_vp  # noqa: E402
from arreau_tpu.models.blocks import (  # noqa: E402
    scalar_to_sphere,
    sphere_to_scalar,
    sphere_to_vec,
    vec_to_sphere,
)
from arreau_tpu.models.ponita import fiber_bundle_invariants, lattice_edge_scalars  # noqa: E402
from arreau_tpu.ops import lattice as my_lat  # noqa: E402
from arreau_tpu.ops.fourier import gaussian_fourier_features  # noqa: E402
from arreau_tpu.ops.pbc import SUPERCELLS, NeighborList, min_distance_pbc, pbc_neighbor_list  # noqa: E402
from arreau_tpu.ops.windowing import polynomial_cutoff  # noqa: E402


@pytest.fixture(autouse=True)
def _torch_fp64():
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def T(x):
    return torch.as_tensor(np.asarray(x))


def allclose(a, b, rtol=1e-10, atol=1e-10):
    a = np.asarray(a.detach() if hasattr(a, "detach") else a, dtype=np.float64)
    b = np.asarray(b.detach() if hasattr(b, "detach") else b, dtype=np.float64)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def random_crystals(rng, B, A, len_lo=5.0, len_hi=8.0, ang_lo=70.0, ang_hi=110.0):
    """Random dense crystal batch + the packed layout the reference expects."""
    lengths = rng.uniform(len_lo, len_hi, (B, 3))
    angles = np.deg2rad(rng.uniform(ang_lo, ang_hi, (B, 3)))
    lattice = np.asarray(my_lat.lattice_from_params(jnp.asarray(lengths), jnp.asarray(angles)))
    frac = rng.uniform(0.0, 1.0, (B, A, 3))
    num_atoms = rng.integers(3, A + 1, (B,))
    mask = np.arange(A)[None, :] < num_atoms[:, None]
    cart = np.einsum("bai,bij->baj", frac, lattice)
    packed = np.concatenate([cart[b, : num_atoms[b]] for b in range(B)], axis=0)
    return cart, lattice, num_atoms, mask, packed


# ---------------------------------------------------------------------------
# VE_pbc (diffusion_helpers.py:28-81)
# ---------------------------------------------------------------------------


def test_ve_sigma_ladder_matches_reference():
    ref = ref_dh.VE_pbc(num_steps=50, sigma_min=0.01, sigma_max=3.0)
    mine = my_ve.make_ve_schedule(50, 0.01, 3.0, dtype=jnp.float64)
    allclose(mine.sigmas, ref.sigmas, rtol=1e-12, atol=0)


def test_ve_forward_wrapped_target_matches_reference(monkeypatch):
    rng = np.random.default_rng(0)
    B, A = 6, 5
    cart, lattice, _, _, _ = random_crystals(rng, B, A)
    frac = np.asarray(my_lat.cart_to_frac(jnp.asarray(cart), jnp.asarray(lattice)))
    t = rng.integers(1, 50, (B,))

    sched = my_ve.make_ve_schedule(50, 0.01, 3.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(7)
    frac_noisy, wrapped_eps, used_sig = my_ve.ve_forward_pbc(
        sched, key, jnp.asarray(frac), jnp.asarray(t), jnp.asarray(lattice)
    )
    # The same eps my ve_forward_pbc drew internally (same key, same call).
    eps = np.asarray(jax.random.normal(key, frac.shape, dtype=jnp.float64))

    ref = ref_dh.VE_pbc(num_steps=50, sigma_min=0.01, sigma_max=3.0)
    monkeypatch.setattr(torch, "randn_like", lambda x: T(eps.reshape(-1, 3)))
    t_atoms = np.repeat(t, A)
    ref_noisy, ref_eps, ref_sig = ref.forward(
        T(frac.reshape(-1, 3)), T(t_atoms), T(lattice), T(np.full(B, A))
    )
    allclose(frac_noisy.reshape(-1, 3), ref_noisy, rtol=1e-9, atol=1e-9)
    allclose(wrapped_eps.reshape(-1, 3), ref_eps, rtol=1e-8, atol=1e-9)
    allclose(np.broadcast_to(np.asarray(used_sig), (B, A, 3)).reshape(-1, 3)[:, :1], ref_sig)


def test_ve_reverse_step_matches_reference(monkeypatch):
    rng = np.random.default_rng(1)
    B, A = 5, 4
    frac_xt = rng.uniform(0, 1, (B, A, 3))
    pred_eps = rng.normal(0, 0.1, (B, A, 3))
    for tval in (0, 1, 13, 49):
        t = np.full(B, tval)
        sched = my_ve.make_ve_schedule(49, 0.01, 3.0, dtype=jnp.float64)
        key = jax.random.PRNGKey(tval + 100)
        mine = my_ve.ve_reverse_step(
            sched, key, jnp.asarray(frac_xt), jnp.asarray(pred_eps), jnp.asarray(t)
        )
        noise = np.asarray(jax.random.normal(key, frac_xt.shape, dtype=jnp.float64))

        ref = ref_dh.VE_pbc(num_steps=49, sigma_min=0.01, sigma_max=3.0)
        monkeypatch.setattr(torch, "randn_like", lambda x, _n=noise: T(_n.reshape(-1, 3)))
        ref_next = ref.reverse(
            T(frac_xt.reshape(-1, 3)), T(pred_eps.reshape(-1, 3)), T(np.repeat(t, A)),
            None, None,
        )
        allclose(mine.reshape(-1, 3), ref_next, rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# VP / VP_lattice (diffusion_helpers.py:84-220)
# ---------------------------------------------------------------------------


def _ref_vp():
    # .double() upcasts the buffers (the ctor hardcodes fp32 arange) so both
    # sides run the step arithmetic in fp64 on the same fp32-rounded tables.
    return ref_dh.VP_lattice(num_steps=60, s=0.0001, power=2, clipmax=0.999).double()


def _shared_vp_schedule(ref):
    """My schedule NamedTuple built from the reference's own fp32 tables, so
    step-function comparisons are exact (table-resolution independent)."""
    return my_vp.VPSchedule(
        alpha_bars=jnp.asarray(ref.alpha_bars.numpy(), dtype=jnp.float64),
        betas=jnp.asarray(ref.betas.numpy(), dtype=jnp.float64),
        sigmas=jnp.asarray(ref.sigmas.numpy(), dtype=jnp.float64),
    )


def test_vp_schedule_tables_match_reference_at_fp32():
    ref = _ref_vp()
    mine = my_vp.make_vp_schedule(60, s=0.0001, power=2, clipmax=0.999, dtype=jnp.float32)
    # The reference hardcodes fp32 (torch.arange(dtype=torch.float)); compare
    # at that resolution.
    allclose(mine.alpha_bars, ref.alpha_bars, rtol=3e-6, atol=1e-7)
    allclose(mine.betas, ref.betas, rtol=3e-5, atol=1e-7)
    allclose(mine.sigmas, ref.sigmas, rtol=3e-5, atol=1e-6)


def test_vp_forward_matches_reference(monkeypatch):
    rng = np.random.default_rng(2)
    B, D = 7, 6
    h0 = rng.normal(0, 1, (B, D))
    t = rng.integers(1, 60, (B,))
    ref = _ref_vp()
    sched = _shared_vp_schedule(ref)
    key = jax.random.PRNGKey(3)
    ht, eps = my_vp.vp_forward(sched, key, jnp.asarray(h0), jnp.asarray(t))
    noise = np.asarray(jax.random.normal(key, h0.shape, dtype=jnp.float64))
    monkeypatch.setattr(torch, "randn_like", lambda x: T(noise))
    ref_ht, ref_eps = ref.forward(T(h0), T(t))
    allclose(eps, ref_eps, rtol=1e-12, atol=0)
    allclose(ht, ref_ht, rtol=1e-12, atol=1e-12)


def test_vp_reverse_step_matches_reference(monkeypatch):
    rng = np.random.default_rng(3)
    B, D = 6, 6
    ht = rng.normal(0, 1, (B, D))
    pred = rng.normal(0, 1, (B, D))
    ref = _ref_vp()
    sched = _shared_vp_schedule(ref)
    for tval in (1, 2, 30, 60):
        t = np.full(B, tval)
        key = jax.random.PRNGKey(tval)
        mine = my_vp.vp_reverse_step(sched, key, jnp.asarray(ht), jnp.asarray(pred), jnp.asarray(t))
        noise = np.asarray(jax.random.normal(key, ht.shape, dtype=jnp.float64))
        monkeypatch.setattr(torch, "randn_like", lambda x, _n=noise: T(_n))
        allclose(mine, ref.reverse(T(ht), T(pred), T(t)), rtol=1e-10, atol=1e-10)


def test_vp_reverse_given_x0_matches_reference_incl_variance_quirk(monkeypatch):
    rng = np.random.default_rng(4)
    B, D = 6, 6
    xt = rng.normal(0, 1, (B, D))
    x0 = rng.normal(0, 1, (B, D))
    ref = _ref_vp()
    sched = _shared_vp_schedule(ref)
    for tval in (1, 2, 25, 60):
        t = np.full(B, tval)
        key = jax.random.PRNGKey(40 + tval)
        mine = my_vp.vp_reverse_given_x0(sched, key, jnp.asarray(xt), jnp.asarray(x0), jnp.asarray(t))
        noise = np.asarray(jax.random.normal(key, xt.shape, dtype=jnp.float64))
        monkeypatch.setattr(torch, "randn_like", lambda x, _n=noise: T(_n))
        allclose(mine, ref.reverse_given_x0(T(xt), T(x0), T(t)), rtol=1e-10, atol=1e-10)


def test_vp_reverse_without_noise_matches_reference():
    rng = np.random.default_rng(5)
    B, D = 6, 6
    lt = rng.normal(0, 1, (B, D))
    pred = rng.normal(0, 1, (B, D))
    ref = _ref_vp()
    sched = _shared_vp_schedule(ref)
    for tval in (1, 17, 60):
        t = np.full(B, tval)
        mine = my_vp.vp_reverse_without_noise(sched, jnp.asarray(lt), jnp.asarray(pred), jnp.asarray(t))
        allclose(mine, ref.reverse_without_noise(T(lt), T(pred), T(t)), rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# min_distance_sqr_pbc (diffusion_helpers.py:254-325)
# ---------------------------------------------------------------------------


def test_min_distance_sqr_pbc_matches_reference():
    rng = np.random.default_rng(6)
    B, A = 8, 5
    cart1, lattice, _, _, _ = random_crystals(rng, B, A)
    frac2 = rng.uniform(0, 1, (B, A, 3))
    cart2 = np.einsum("bai,bij->baj", frac2, lattice)

    min_sqr, min_vec = min_distance_pbc(
        jnp.asarray(cart1), jnp.asarray(cart2), jnp.asarray(lattice)
    )
    ref_sqr, ref_vec = ref_dh.min_distance_sqr_pbc(
        T(cart1.reshape(-1, 3)), T(cart2.reshape(-1, 3)), T(lattice),
        T(np.full(B, A)), "cpu", return_vector=True,
    )
    allclose(min_sqr.reshape(-1), ref_sqr, rtol=1e-10, atol=1e-10)
    allclose(min_vec.reshape(-1, 3), ref_vec, rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# radius_graph_pbc golden edge sets (diffusion_helpers.py:328-564)
# ---------------------------------------------------------------------------


def _mine_edge_dict(nb: NeighborList, num_atoms, mask):
    """Dense neighbor list -> {(recv, src, cell_triple): (dist, direction)} in
    the reference's packed atom indexing."""
    B, A, K = nb.src.shape
    offsets = np.concatenate([[0], np.cumsum(num_atoms)[:-1]])
    src = np.asarray(nb.src)
    image = np.asarray(nb.image)
    dist = np.asarray(nb.dist)
    direction = np.asarray(nb.direction)
    m = np.asarray(nb.mask)
    edges = {}
    for b in range(B):
        for a in range(int(num_atoms[b])):
            for k in range(K):
                if not m[b, a, k]:
                    continue
                cell = tuple(int(c) for c in SUPERCELLS[image[b, a, k]])
                key = (int(offsets[b] + a), int(offsets[b] + src[b, a, k]), cell)
                assert key not in edges, f"duplicate edge {key}"
                edges[key] = (dist[b, a, k], direction[b, a, k])
    return edges


def _ref_edge_dict(packed, lattice, num_atoms, radius, threshold):
    edge_index, to_jimages, _, dists, directions = ref_dh.radius_graph_pbc(
        T(packed), T(lattice), torch.as_tensor(num_atoms, dtype=torch.long),
        radius, threshold, "cpu",
    )
    edge_index = edge_index.numpy()
    # to_jimages = -unit_cell; the cell offset added to the SOURCE atom is
    # unit_cell (diffusion_helpers.py:547-551).
    cells = (-to_jimages.numpy()).astype(int)
    dists = dists.numpy()
    directions = directions.numpy()
    edges = {}
    for e in range(edge_index.shape[1]):
        key = (int(edge_index[1, e]), int(edge_index[0, e]), tuple(cells[e]))
        assert key not in edges, f"duplicate reference edge {key}"
        edges[key] = (dists[e], directions[e])
    return edges


def _assert_edge_dicts_equal(mine, ref, allow_exact_tie_swaps=False):
    """Edge sets must be identical; with ``allow_exact_tie_swaps`` an edge may
    be replaced by an EXACTLY equidistant image of the same (recv, src) pair.

    Documented deviation (bounded here): the capped builder breaks exact
    distance ties (e.g. an atom's own images at +v and -v) by fp rounding
    noise in the phase-1 matmul expansion, while the reference's stable sort
    (diffusion_helpers.py:511-515) keeps the lowest candidate slot. The kept
    edge then differs only within an exactly-equidistant tie class — same
    receiver, same source atom, same distance — which is geometrically
    equivalent. Non-tied edges must still match exactly.
    """
    only_mine = set(mine) - set(ref)
    only_ref = set(ref) - set(mine)
    if allow_exact_tie_swaps:
        def tie_key(edges, keys):
            return sorted((k[0], k[1], round(float(edges[k][0]), 9)) for k in keys)

        assert tie_key(mine, only_mine) == tie_key(ref, only_ref), (
            f"unmatched edges are not exact-tie swaps: "
            f"only-mine={sorted(only_mine)[:5]} only-ref={sorted(only_ref)[:5]}"
        )
    else:
        assert not only_mine and not only_ref, (
            f"edge sets differ: {len(mine)} vs {len(ref)}; "
            f"only-mine={sorted(only_mine)[:5]} only-ref={sorted(only_ref)[:5]}"
        )
    for key, (d_mine, v_mine) in mine.items():
        if key in only_mine:
            continue
        d_ref, v_ref = ref[key]
        np.testing.assert_allclose(d_mine, d_ref, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(v_mine, v_ref, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize(
    "seed,len_lo,len_hi,ang_lo,ang_hi",
    [
        (7, 5.0, 8.0, 70.0, 110.0),   # typical cells
        (70, 4.0, 10.0, 45.0, 135.0),  # heavily skewed cells
    ],
)
def test_radius_graph_pbc_uncapped_golden_edges(seed, len_lo, len_hi, ang_lo, ang_hi):
    """No-cap path (reference early return, diffusion_helpers.py:469-490):
    edge sets must be IDENTICAL on 20 randomized crystals — including
    heavily skewed cells where image geometry is least forgiving (both
    implementations share the reference's 27-image assumption; parity holds
    regardless of whether 27 images suffice physically)."""
    rng = np.random.default_rng(seed)
    B, A, K = 20, 6, 96
    cart, lattice, num_atoms, mask, packed = random_crystals(
        rng, B, A, len_lo=len_lo, len_hi=len_hi, ang_lo=ang_lo, ang_hi=ang_hi
    )
    nb = pbc_neighbor_list(
        jnp.asarray(cart), jnp.asarray(lattice), jnp.asarray(mask),
        radius=5.0, max_neighbors=K,
    )
    deg = np.asarray(nb.mask).sum(-1)
    assert deg.max() < K, "K too small to hold the whole uncapped edge set"
    mine = _mine_edge_dict(nb, num_atoms, mask)
    # threshold <= 0 -> reference returns every in-radius edge
    ref = _ref_edge_dict(packed, lattice, num_atoms, 5.0, 0)
    _assert_edge_dicts_equal(mine, ref)


def test_radius_graph_pbc_capped_golden_edges():
    """max_neighbors=8 cap: the reference sorts per receiver and keeps the 8
    nearest (diffusion_helpers.py:492-545); we run 8 argmin passes. With
    continuous random coordinates (no ties) the kept edge sets must match
    exactly, crystal by crystal."""
    rng = np.random.default_rng(8)
    B, A = 20, 7
    cart, lattice, num_atoms, mask, packed = random_crystals(
        rng, B, A, len_lo=4.0, len_hi=7.0
    )
    nb = pbc_neighbor_list(
        jnp.asarray(cart), jnp.asarray(lattice), jnp.asarray(mask),
        radius=5.0, max_neighbors=8,
    )
    mine = _mine_edge_dict(nb, num_atoms, mask)
    ref = _ref_edge_dict(packed, lattice, num_atoms, 5.0, 8)
    # random coordinates still create EXACT ties: every atom is equidistant to
    # its own images at +v and -v — allow swaps within those tie classes only
    _assert_edge_dicts_equal(mine, ref, allow_exact_tie_swaps=True)


def test_radius_graph_pbc_tie_break_semantics():
    """Deliberate exact ties: a single atom in a cubic cell (a=3, r=5) sees 6
    axis images at d=3 and 12 face-diagonal images at d=3*sqrt(2); cap=8 keeps
    the 6 axis images plus exactly 2 of the 12 tied diagonals. WHICH two
    diagonals differs between the reference (stable sort keeps the lowest
    candidate slot) and us (fp noise in the phase-1 expansion breaks exact
    ties) — the documented bounded deviation. Asserted: identical distance
    multisets and identical (recv, src) structure, i.e. the selections differ
    only inside exactly-equidistant tie classes."""
    lattice = 3.0 * np.eye(3)[None]
    cart = np.zeros((1, 1, 3))
    mask = np.ones((1, 1), bool)
    num_atoms = np.array([1])
    nb = pbc_neighbor_list(
        jnp.asarray(cart), jnp.asarray(lattice), jnp.asarray(mask),
        radius=5.0, max_neighbors=8,
    )
    mine = _mine_edge_dict(nb, num_atoms, mask)
    ref = _ref_edge_dict(cart.reshape(-1, 3), lattice, num_atoms, 5.0, 8)
    assert len(mine) == len(ref) == 8
    _assert_edge_dicts_equal(mine, ref, allow_exact_tie_swaps=True)
    # the 6 non-degenerate-in-distance axis images must be in BOTH selections
    axis_cells = {(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)}
    for edges in (mine, ref):
        cells = {k[2] for k in edges}
        assert axis_cells <= cells


# ---------------------------------------------------------------------------
# D3PM (d3pm.py:25-215)
# ---------------------------------------------------------------------------


def _ref_d3pm(forward_type="mask", T_=24, C=6):
    return RefD3PM(x0_model=None, n_T=T_, num_classes=C, forward_type=forward_type,
                   hybrid_loss_coeff=0.001)


def _shared_tables(ref):
    return my_d3pm.D3PMTables(
        q_one_step_transposed=jnp.asarray(ref.q_one_step_transposed.numpy(), jnp.float64),
        q_mats=jnp.asarray(ref.q_mats.numpy(), jnp.float64),
        hybrid_loss_coeff=float(ref.hybrid_loss_coeff),
    )


@pytest.mark.parametrize("forward_type", ["mask", "uniform"])
def test_d3pm_tables_match_reference(forward_type):
    ref = _ref_d3pm(forward_type)
    mine = my_d3pm.make_d3pm_tables(24, 6, forward_type=forward_type, dtype=jnp.float64)
    allclose(mine.q_one_step_transposed, ref.q_one_step_transposed, rtol=1e-12, atol=1e-14)
    allclose(mine.q_mats, ref.q_mats, rtol=1e-12, atol=1e-14)


def test_d3pm_q_posterior_logits_match_reference():
    rng = np.random.default_rng(9)
    ref = _ref_d3pm()
    tables = _shared_tables(ref)
    B, A, C = 4, 6, 6
    N = B * A
    x0 = rng.integers(0, C, (B, A))
    xt = rng.integers(0, C, (B, A))
    t = rng.integers(1, 25, (B, A))
    t.flat[0] = 1  # exercise the t==1 branch

    mine_int = my_d3pm.q_posterior_logits(
        tables, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t)
    )
    ref_int = ref.q_posterior_logits(
        torch.as_tensor(x0.reshape(N), dtype=torch.long),
        torch.as_tensor(xt.reshape(N), dtype=torch.long),
        torch.as_tensor(t.reshape(N), dtype=torch.long),
    )
    allclose(mine_int.reshape(N, C), ref_int, rtol=1e-10, atol=1e-10)

    x0_logits = rng.normal(0, 2, (B, A, C))
    mine_log = my_d3pm.q_posterior_logits(
        tables, jnp.asarray(x0_logits), jnp.asarray(xt), jnp.asarray(t)
    )
    ref_log = ref.q_posterior_logits(
        T(x0_logits.reshape(N, C)),
        torch.as_tensor(xt.reshape(N), dtype=torch.long),
        torch.as_tensor(t.reshape(N), dtype=torch.long),
    )
    allclose(mine_log.reshape(N, C), ref_log, rtol=1e-10, atol=1e-10)


def test_d3pm_loss_matches_reference():
    rng = np.random.default_rng(10)
    ref = _ref_d3pm()
    tables = _shared_tables(ref)
    B, A, C = 5, 4, 6
    N = B * A
    x0 = rng.integers(0, C, (B, A))
    xt = rng.integers(0, C, (B, A))
    t = rng.integers(1, 25, (B, A))
    logits = rng.normal(0, 1.5, (B, A, C))

    mine = my_d3pm.d3pm_loss(
        tables, jnp.asarray(x0), jnp.asarray(logits), jnp.asarray(xt),
        jnp.asarray(t), jnp.ones((B, A), bool),
    )
    ref_loss = ref.calculate_loss(
        torch.as_tensor(x0.reshape(N), dtype=torch.long),
        T(logits.reshape(N, C)),
        torch.as_tensor(xt.reshape(N), dtype=torch.long),
        torch.as_tensor(t.reshape(N), dtype=torch.long),
    )
    allclose(mine, ref_loss, rtol=1e-10, atol=1e-12)


def test_d3pm_q_sample_shared_noise_matches_reference():
    rng = np.random.default_rng(11)
    ref = _ref_d3pm()
    tables = _shared_tables(ref)
    B, A, C = 6, 5, 6
    N = B * A
    x0 = rng.integers(0, C, (B, A))
    t = rng.integers(1, 25, (B, A))
    key = jax.random.PRNGKey(12)
    mine = my_d3pm.d3pm_sample_xt(tables, key, jnp.asarray(x0), jnp.asarray(t))
    # the exact uniform draw d3pm_sample_xt made internally
    u = np.asarray(jax.random.uniform(key, (B, A, C), dtype=jnp.float64))
    ref_xt = ref.q_sample(
        torch.as_tensor(x0.reshape(N), dtype=torch.long),
        torch.as_tensor(t.reshape(N), dtype=torch.long),
        T(u.reshape(N, C)),
    )
    np.testing.assert_array_equal(np.asarray(mine).reshape(N), ref_xt.numpy())


def test_d3pm_reverse_shared_noise_matches_reference(monkeypatch):
    rng = np.random.default_rng(13)
    ref = _ref_d3pm()
    tables = _shared_tables(ref)
    B, A, C = 6, 5, 6
    N = B * A
    xt = rng.integers(0, C, (B, A))
    logits = rng.normal(0, 2, (B, A, C))
    for tval in (1, 2, 12, 24):
        t = np.full((B, A), tval)
        key = jax.random.PRNGKey(tval + 7)
        mine = my_d3pm.d3pm_reverse_step(
            tables, key, jnp.asarray(xt), jnp.asarray(logits), jnp.asarray(t)
        )
        u = np.asarray(jax.random.uniform(key, (B, A, C), dtype=jnp.float64))
        monkeypatch.setattr(torch, "rand", lambda *s, **kw: T(u.reshape(N, C)))
        ref_next = ref.reverse(
            torch.as_tensor(xt.reshape(N), dtype=torch.long),
            T(logits.reshape(N, C)),
            torch.as_tensor(t.reshape(N), dtype=torch.long),
        )
        np.testing.assert_array_equal(np.asarray(mine).reshape(N), ref_next.numpy())


def test_d3pm_strided_transitions_match_chained_reference_mats():
    ref = _ref_d3pm()
    ref_one_step = ref.q_one_step_transposed.transpose(1, 2).numpy()  # Q_1..Q_T
    ts = np.array([0, 3, 4, 11, 23])
    mine = my_d3pm.make_strided_transitions(24, 6, ts, dtype=jnp.float64)
    for k in range(len(ts) - 1):
        s, t = int(ts[k]), int(ts[k + 1])
        mat = np.eye(6)
        for i in range(s, t):
            mat = mat @ ref_one_step[i]
        allclose(mine[k], mat.T, rtol=1e-12, atol=1e-14)


# ---------------------------------------------------------------------------
# Lattice codec (lattice_helpers.py:5-105) + frac/cart transforms
# ---------------------------------------------------------------------------


def test_lattice_codec_matches_reference():
    rng = np.random.default_rng(14)
    B = 16
    lengths = rng.uniform(3, 9, (B, 3))
    angles = np.deg2rad(rng.uniform(60, 120, (B, 3)))

    ref_mat = ref_lh.lattice_from_params(T(lengths), T(angles))
    my_mat = my_lat.lattice_from_params(jnp.asarray(lengths), jnp.asarray(angles))
    allclose(my_mat, ref_mat, rtol=1e-10, atol=1e-10)

    ref_len, ref_ang = ref_lh.matrix_to_params(ref_mat)
    my_len, my_ang = my_lat.matrix_to_params(jnp.asarray(np.asarray(ref_mat)))
    allclose(my_len, ref_len, rtol=1e-10, atol=1e-12)
    allclose(my_ang, ref_ang, rtol=1e-10, atol=1e-12)

    enc_ref = ref_lh.encode_angles(T(angles))
    enc_mine = my_lat.encode_angles(jnp.asarray(angles))
    allclose(enc_mine, enc_ref, rtol=1e-12, atol=0)
    allclose(my_lat.decode_angles(enc_mine), ref_lh.decode_angles(enc_ref),
             rtol=1e-12, atol=0)


def test_frac_cart_transforms_match_reference():
    rng = np.random.default_rng(15)
    B, A = 6, 5
    cart, lattice, _, _, _ = random_crystals(rng, B, A)
    frac_ref = ref_dh.cart_to_frac_coords(
        T(cart.reshape(-1, 3)), T(lattice), T(np.full(B, A))
    )
    frac_mine = my_lat.cart_to_frac(jnp.asarray(cart), jnp.asarray(lattice))
    # SVD pinv vs damped closed-form pinv: ~1e-10 on well-conditioned cells
    allclose(frac_mine.reshape(-1, 3), frac_ref, rtol=1e-8, atol=1e-8)

    cart_ref = ref_dh.frac_to_cart_coords(frac_ref, T(lattice), T(np.full(B, A)))
    cart_mine = my_lat.frac_to_cart(jnp.asarray(np.asarray(frac_ref).reshape(B, A, 3)),
                                    jnp.asarray(lattice))
    allclose(cart_mine.reshape(-1, 3), cart_ref, rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# Ponita utils: windowing, sphere codecs, invariants, edge scalars, Fourier
# ---------------------------------------------------------------------------


def test_polynomial_cutoff_matches_reference():
    x = np.linspace(0, 7, 101)
    ref = RefPolynomialCutoff(r_max=5.0, p=6)(T(x))
    mine = polynomial_cutoff(jnp.asarray(x), 5.0, p=6)
    allclose(mine, ref, rtol=1e-12, atol=1e-14)
    # r_max=None passthrough
    allclose(polynomial_cutoff(jnp.asarray(x), None), RefPolynomialCutoff(r_max=None)(T(x)))


def test_sphere_codecs_match_reference():
    rng = np.random.default_rng(16)
    B, C, O = 5, 4, 12
    ori = rng.normal(0, 1, (O, 3))
    ori /= np.linalg.norm(ori, axis=-1, keepdims=True)
    vec = rng.normal(0, 1, (B, C, 3))
    scalar = rng.normal(0, 1, (B, C))
    signal = rng.normal(0, 1, (B, O, C))

    allclose(vec_to_sphere(jnp.asarray(vec), jnp.asarray(ori)),
             ref_sphere.vec_to_sphere(T(vec), T(ori)), rtol=1e-12, atol=1e-12)
    allclose(scalar_to_sphere(jnp.asarray(scalar), O),
             ref_sphere.scalar_to_sphere(T(scalar), T(ori)), rtol=0, atol=0)
    allclose(sphere_to_vec(jnp.asarray(signal), jnp.asarray(ori)),
             ref_sphere.sphere_to_vec(T(signal), T(ori)), rtol=1e-12, atol=1e-12)
    allclose(sphere_to_scalar(jnp.asarray(signal)),
             ref_sphere.sphere_to_scalar(T(signal)), rtol=1e-12, atol=1e-12)


def _neighborlist_from_directions(direction):
    """[E, 3 or 2] direction rows -> a [1, E, 1]-shaped NeighborList."""
    E, D = direction.shape
    d = jnp.asarray(direction.reshape(1, E, 1, D))
    dist = jnp.sqrt(jnp.sum(d**2, axis=-1))
    return NeighborList(
        src=jnp.zeros((1, E, 1), jnp.int32),
        image=jnp.zeros((1, E, 1), jnp.int32),
        dist=dist,
        direction=d,
        mask=jnp.ones((1, E, 1), bool),
    )


def test_r3s2_fiber_bundle_invariants_match_reference():
    rng = np.random.default_rng(17)
    E, O = 40, 12
    direction = rng.normal(0, 2, (E, 3))
    ori = rng.normal(0, 1, (O, 3))
    ori /= np.linalg.norm(ori, axis=-1, keepdims=True)

    nb = _neighborlist_from_directions(direction)
    spatial, fiber, _ = fiber_bundle_invariants(nb, jnp.asarray(ori))
    ref_attr, ref_fiber = ref_inv.invariant_attr_r3s2_fiber_bundle(
        None, T(ori), None, T(direction), separable=True
    )
    # inv2 deviation bound: we add 1e-16 under the sqrt (finite gradient at
    # zero rejection); |sqrt(x + 1e-16) - sqrt(x)| <= 1e-16 / (2 sqrt(x)).
    allclose(spatial.reshape(E, O, 2), ref_attr, rtol=1e-9, atol=1e-8)
    allclose(fiber, ref_fiber, rtol=1e-12, atol=1e-12)


def test_r2s1_fiber_bundle_invariants_match_reference():
    rng = np.random.default_rng(18)
    N, E, O = 10, 25, 8
    pos = rng.normal(0, 2, (N, 2))
    edge_index = rng.integers(0, N, (2, E))
    theta = rng.uniform(0, 2 * np.pi, (O,))
    ori = np.stack([np.cos(theta), np.sin(theta)], axis=-1)

    direction = pos[edge_index[0]] - pos[edge_index[1]]  # send - receive
    nb = _neighborlist_from_directions(direction)
    spatial, fiber, _ = fiber_bundle_invariants(nb, jnp.asarray(ori))
    ref_attr, ref_fiber = ref_inv.invariant_attr_r2s1_fiber_bundle(
        T(pos), T(ori), torch.as_tensor(edge_index, dtype=torch.long), separable=True
    )
    allclose(spatial.reshape(E, O, 2), ref_attr, rtol=1e-10, atol=1e-10)
    allclose(fiber, ref_fiber, rtol=1e-12, atol=1e-12)


def test_lattice_edge_scalars_match_reference_semantics():
    """The A39 edge scalars: [dist, cos(dir, L_row_0..2)] — reference builds
    them with torch.nn.CosineSimilarity(dim=-1) (eps=1e-8 denominator guard),
    ponita/transforms/invariants.py:79-87. That module needs PyG to import,
    so the oracle here is the same CosineSimilarity call on raw tensors."""
    rng = np.random.default_rng(19)
    B, A, K = 3, 4, 5
    direction = rng.normal(0, 2, (B, A, K, 3))
    direction[0, 0, 0] = 0.0  # masked-slot-like zero direction
    lattice = rng.normal(0, 3, (B, 3, 3))
    mask = np.ones((B, A, K), bool)
    dist = np.linalg.norm(direction, axis=-1)
    nb = NeighborList(
        src=jnp.zeros((B, A, K), jnp.int32), image=jnp.zeros((B, A, K), jnp.int32),
        dist=jnp.asarray(dist), direction=jnp.asarray(direction),
        mask=jnp.asarray(mask),
    )
    mine = lattice_edge_scalars(nb, jnp.asarray(lattice))

    cos = torch.nn.CosineSimilarity(dim=-1)
    dir_t = T(direction)
    lat_rows = [T(lattice)[:, i, :][:, None, None, :].expand(B, A, K, 3) for i in range(3)]
    ref = torch.stack(
        [T(dist)] + [cos(dir_t, row) for row in lat_rows], dim=-1
    )
    allclose(mine, ref, rtol=1e-9, atol=1e-9)


def test_gaussian_fourier_embedding_matches_reference():
    rng = np.random.default_rng(20)
    emb = 16
    ref_mod = ref_dh.GaussianFourierProjection(embedding_size=emb, scale=1.0)
    w = ref_mod.gaussian_fourier_proj_w.detach().numpy()
    x = rng.uniform(0, 1, (9, 1))
    ref_out = ref_mod(T(x))
    mine = gaussian_fourier_features(jnp.asarray(x), jnp.asarray(w))
    allclose(mine, ref_out, rtol=1e-10, atol=1e-12)
