"""Strided (fewer-step, DDIM-family) sampler: math oracles for the three
chains' t -> s updates, and the end-to-end strided sampler path.

The strided mode is a beyond-parity extension; the reference only ever runs
the full T-step adjacent chain (/root/reference/diffusion/diffusion_loss.py:
318-365). These tests pin the generalized updates to closed-form oracles so
they are correct for ANY stride, not just the dense one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from arreau_tpu.diffusion.d3pm import (
    _one_step_mats,
    d3pm_strided_reverse_step,
    make_d3pm_tables,
    make_strided_transitions,
    q_posterior_logits,
)
from arreau_tpu.diffusion.ve import make_ve_schedule, ve_ddim_step, ve_reverse_step
from arreau_tpu.diffusion.vp import make_vp_schedule, vp_ddim_step_given_x0
from tests.conftest import assert_allclose

T = 50


# ---------------- VP (lengths / angles) ----------------


def test_vp_ddim_marginal_preserved_any_eta():
    """With an exact x0 prediction, x_s keeps the forward marginal
    q(x_s | x0) = N(sqrt(abar_s) x0, 1 - abar_s) for any eta: the
    deterministic part contributes (1 - abar_s - sig^2) variance through the
    implied eps and the noise adds sig^2."""
    sched = make_vp_schedule(T, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    B, D, N = 5, 3, 40_000
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, D)) * 2.0)
    for eta in (0.0, 0.5, 1.0):
        t = jnp.full((N * B,), 37)
        s = jnp.full((N * B,), 11)
        x0_rep = jnp.tile(x0, (N, 1))
        k1, k2 = jax.random.split(jax.random.PRNGKey(int(eta * 10) + 1))
        abar_t = sched.alpha_bars[37]
        eps = jax.random.normal(k1, x0_rep.shape, dtype=x0_rep.dtype)
        xt = jnp.sqrt(abar_t) * x0_rep + jnp.sqrt(1 - abar_t) * eps
        xs = vp_ddim_step_given_x0(sched, k2, xt, x0_rep, t, s, eta=eta)
        abar_s = float(sched.alpha_bars[11])
        resid = np.asarray(xs - np.sqrt(abar_s) * x0_rep)
        assert abs(resid.mean()) < 0.01
        assert abs(resid.var() - (1 - abar_s)) < 0.01


def test_vp_ddim_adjacent_eta1_matches_ddpm_posterior_mean_and_std():
    """For s = t-1 and eta = 1 the DDIM update is the ancestral DDPM
    posterior: mean (abar-weighted x0/x_t mix) and std
    sqrt((1-abar_{t-1}) beta_t / (1-abar_t))."""
    sched = make_vp_schedule(T, dtype=jnp.float64)
    t_i, s_i = 23, 22
    B, D = 4, 3
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.normal(size=(B, D)))
    x0 = jnp.asarray(rng.normal(size=(B, D)))
    t = jnp.full((B,), t_i)
    s = jnp.full((B,), s_i)

    # deterministic part: run with a key but eta=1 and subtract the noise term
    # by comparing two different keys — instead evaluate the mean directly by
    # reconstructing it from the eta=0 direction coefficient algebra.
    abar_t = float(sched.alpha_bars[t_i])
    abar_s = float(sched.alpha_bars[s_i])
    beta_t = float(sched.betas[t_i])
    alpha_t = 1 - beta_t
    post_mean = (
        np.sqrt(abar_s) * beta_t * np.asarray(x0)
        + np.sqrt(alpha_t) * (1 - abar_s) * np.asarray(xt)
    ) / (1 - abar_t)
    post_std = np.sqrt((1 - abar_s) * beta_t / (1 - abar_t))

    # Monte-Carlo the update to split mean and std
    N = 60_000
    keys = jax.random.split(jax.random.PRNGKey(2), 1)[0]
    xt_rep = jnp.tile(xt, (N, 1))
    x0_rep = jnp.tile(x0, (N, 1))
    out = vp_ddim_step_given_x0(
        sched,
        keys,
        xt_rep,
        x0_rep,
        jnp.full((N * B,), t_i),
        jnp.full((N * B,), s_i),
        eta=1.0,
    ).reshape(N, B, D)
    assert_allclose(out.mean(axis=0), post_mean, rtol=0, atol=4 * post_std / np.sqrt(N) + 1e-4)
    assert_allclose(np.asarray(out).std(axis=0).mean(), post_std, rtol=0.02, atol=0)


def test_vp_ddim_final_step_returns_x0():
    sched = make_vp_schedule(T, dtype=jnp.float64)
    B, D = 3, 3
    rng = np.random.default_rng(2)
    xt = jnp.asarray(rng.normal(size=(B, D)))
    x0 = jnp.asarray(rng.normal(size=(B, D)))
    out = vp_ddim_step_given_x0(
        sched, jax.random.PRNGKey(0), xt, x0, jnp.full((B,), 5), jnp.zeros((B,), jnp.int32)
    )
    assert_allclose(out, x0, rtol=1e-7, atol=1e-7)


# ---------------- VE (coords) ----------------


def test_ve_ddim_eta0_exact_prediction_recovers_x0():
    """Deterministic strided step straight to s=0 with an exact displacement
    prediction lands on the clean coordinates."""
    sched = make_ve_schedule(T, 0.001, 1.0, dtype=jnp.float64)
    B, A = 3, 7
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(size=(B, A, 3)))
    t = jnp.full((B,), 41)
    sig_t = sched.sigmas[41]
    eps = jnp.asarray(rng.normal(size=(B, A, 3))) * sig_t
    xt = (x0 + eps) % 1.0
    out = ve_ddim_step(
        sched, jax.random.PRNGKey(0), xt, eps, t, jnp.zeros((B,), jnp.int32), eta=0.0
    )
    # both wrapped to [0,1)
    diff = np.abs(np.asarray(out - x0 % 1.0)) % 1.0
    diff = np.minimum(diff, 1.0 - diff)
    assert diff.max() < 1e-9


def test_ve_ddim_marginal_preserved_any_eta():
    """Exact prediction keeps the unwrapped marginal std at sigma_s."""
    sched = make_ve_schedule(T, 0.001, 1.0, dtype=jnp.float64)
    N = 50_000
    t_i, s_i = 45, 20
    x0 = jnp.zeros((N, 1, 3), jnp.float64) + 0.5
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    eps = jax.random.normal(k1, x0.shape, dtype=x0.dtype) * sched.sigmas[t_i]
    xt = x0 + eps  # unwrapped on purpose: we test the unwrapped marginal
    for eta in (0.0, 1.0):
        out = ve_ddim_step(
            sched,
            k2,
            xt,
            eps,
            jnp.full((N,), t_i),
            jnp.full((N,), s_i),
            eta=eta,
        )
        # unwrap around 0.5 (sigma_s ~ 0.03 << 0.5 so no wrap ambiguity)
        resid = (np.asarray(out) - 0.5 + 0.5) % 1.0 - 0.5
        assert abs(resid.std() - float(sched.sigmas[s_i])) < 0.002, eta


def test_ve_ddim_eta1_std_matches_dense_reverse_std():
    """eta=1 adjacent-step noise std equals ve_reverse_step's posterior std."""
    sched = make_ve_schedule(T, 0.001, 1.0, dtype=jnp.float64)
    t_i = 30
    sig_t = float(sched.sigmas[t_i])
    sig_s = float(sched.sigmas[t_i - 1])
    expected = np.sqrt(sig_s**2 * (sig_t**2 - sig_s**2) / sig_t**2)
    # ve_ddim_step noise scale: eta * sig_s * sqrt(1 - sig_s^2/sig_t^2)
    got = 1.0 * sig_s * np.sqrt(1 - sig_s**2 / sig_t**2)
    assert_allclose(got, expected, rtol=1e-12, atol=0)
    # and the dense step uses the same number (documented quirk check)
    B = 2
    xt = jnp.zeros((B, 1, 3), jnp.float64)
    eps = jnp.zeros_like(xt)
    out = ve_reverse_step(sched, jax.random.PRNGKey(0), xt, eps, jnp.full((B,), t_i))
    z = jax.random.normal(jax.random.PRNGKey(0), xt.shape, dtype=xt.dtype)
    assert_allclose((out - 0.0) % 1.0, (expected * z) % 1.0, rtol=1e-9, atol=1e-12)


# ---------------- D3PM (types) ----------------


def test_strided_transitions_match_one_step_products():
    C = 6
    ts = np.array([0, 3, 10, 29, T - 1])
    strided = np.asarray(
        make_strided_transitions(T, C, ts, "mask", mask_prob=0.05, dtype=jnp.float64)
    )
    one_step = _one_step_mats(T, C, "mask", 0.05)
    for k in range(ts.size - 1):
        s, t = int(ts[k]), int(ts[k + 1])
        mat = np.eye(C)
        for i in range(s, t):
            mat = mat @ one_step[i]
        assert_allclose(strided[k], mat.T, rtol=1e-12, atol=1e-14)
        # rows of the (untransposed) kernel are distributions
        assert_allclose(strided[k].sum(axis=0), np.ones(C), rtol=1e-12, atol=1e-12)


def test_strided_transitions_uniform_products():
    C = 4
    ts = np.array([0, 7, T - 1])
    strided = np.asarray(
        make_strided_transitions(T, C, ts, "uniform", dtype=jnp.float64)
    )
    one_step = _one_step_mats(T, C, "uniform", 0.02)
    for k in range(ts.size - 1):
        s, t = int(ts[k]), int(ts[k + 1])
        mat = np.eye(C)
        for i in range(s, t):
            mat = mat @ one_step[i]
        assert_allclose(strided[k], mat.T, rtol=1e-12, atol=1e-14)


def test_d3pm_strided_adjacent_matches_dense_posterior():
    """With stride 1 (s = t-1) the strided posterior logits equal the dense
    q_posterior_logits, so the strided reverse draw (same key) is identical."""
    C = 5
    tables = make_d3pm_tables(T, C, "mask", dtype=jnp.float64)
    t_i = 9
    ts = np.array([t_i - 1, t_i])
    q_strided_T = make_strided_transitions(T, C, ts, "mask", dtype=jnp.float64)
    rng = np.random.default_rng(5)
    B, A = 3, 4
    xt = jnp.asarray(rng.integers(0, C, size=(B, A)))
    x0_logits = jnp.asarray(rng.normal(size=(B, A, C)))
    t = jnp.full((B, A), t_i)
    s = jnp.full((B, A), t_i - 1)

    key = jax.random.PRNGKey(6)
    from arreau_tpu.diffusion.d3pm import d3pm_reverse_step

    dense = d3pm_reverse_step(tables, key, xt, x0_logits, t)
    strided = d3pm_strided_reverse_step(
        tables, q_strided_T[0], key, xt, x0_logits, s
    )
    # t-1 >= 1 here so the damp/final-step gates agree too
    assert np.array_equal(np.asarray(dense), np.asarray(strided))
    # and the underlying posteriors agree numerically
    dense_post = q_posterior_logits(tables, x0_logits, xt, t)
    fact1 = q_strided_T[0][xt, :]
    qbar_s = tables.q_mats[jnp.maximum(s - 1, 0)]
    fact2 = jnp.einsum("...c,...cd->...d", jax.nn.softmax(x0_logits, -1), qbar_s)
    strided_post = jnp.log(fact1 + 1e-6) + jnp.log(fact2 + 1e-6)
    assert_allclose(strided_post, dense_post, rtol=1e-9, atol=1e-9)


def test_d3pm_strided_exact_x0_unmasks():
    """Striding straight from T-1 to 0 with confident x0 logits returns x0."""
    C = 5
    tables = make_d3pm_tables(T, C, "mask", dtype=jnp.float64)
    ts = np.array([0, T - 1])
    q_strided_T = make_strided_transitions(T, C, ts, "mask", dtype=jnp.float64)
    B, A = 2, 6
    rng = np.random.default_rng(7)
    x0 = rng.integers(0, C - 1, size=(B, A))
    x0_logits = jnp.asarray(50.0 * np.eye(C)[x0])
    xt = jnp.full((B, A), C - 1)  # fully masked terminal state
    s = jnp.zeros((B, A), jnp.int32)
    out = d3pm_strided_reverse_step(
        tables, q_strided_T[0], jax.random.PRNGKey(8), xt, x0_logits, s,
        temperature=0.0,
    )
    assert np.array_equal(np.asarray(out), x0)


# ---------------- end-to-end strided sampler ----------------


def test_sampler_strided_end_to_end():
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel

    cfg = DiffusionConfig(
        num_atomic_states=4,
        num_timesteps=40,
        hidden_dim=16,
        basis_dim=8,
        num_layers=2,
        num_ori=4,
        degree=2,
    )
    model = DiffusionModel(cfg)
    B, A = 2, 5
    init_batch = CrystalBatch(
        frac_x=jnp.zeros((B, A, 3)),
        atom_types=jnp.zeros((B, A), jnp.int32),
        lattice=jnp.broadcast_to(4.0 * jnp.eye(3), (B, 3, 3)),
        num_atoms=jnp.full((B,), A),
        atom_mask=jnp.ones((B, A), bool),
    )
    params = model.init(jax.random.PRNGKey(0), init_batch)
    out = jax.jit(
        lambda p, k: model.sample(
            p, k, num_samples=B, num_atoms_per_sample=A, sample_steps=6
        )
    )(params, jax.random.PRNGKey(1))
    assert out.frac_x.shape == (B, A, 3)
    assert np.isfinite(np.asarray(out.frac_x)).all()
    assert np.isfinite(np.asarray(out.lattice)).all()
    assert (np.asarray(out.frac_x) >= 0).all() and (np.asarray(out.frac_x) < 1).all()
    types = np.asarray(out.atom_types)
    assert (types >= 0).all() and (types < cfg.num_atomic_states).all()

    # eta and angle-diffusion variants compile and run through the same path
    cfg_ang = DiffusionConfig(
        num_atomic_states=4,
        num_timesteps=40,
        hidden_dim=16,
        basis_dim=8,
        num_layers=2,
        num_ori=4,
        degree=2,
        diffuse_angles=True,
    )
    model_ang = DiffusionModel(cfg_ang)
    params_ang = model_ang.init(jax.random.PRNGKey(0), init_batch)
    out_ang = jax.jit(
        lambda p, k: model_ang.sample(
            p, k, num_samples=B, num_atoms_per_sample=A, sample_steps=5, ddim_eta=1.0
        )
    )(params_ang, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out_ang.lattice)).all()


def test_sampler_strided_full_steps_falls_back_to_dense():
    """sample_steps >= T-1 must take the exact dense parity path (identical
    draws to sample_steps=None under the same key)."""
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel

    cfg = DiffusionConfig(
        num_atomic_states=4,
        num_timesteps=12,
        hidden_dim=8,
        basis_dim=8,
        num_layers=1,
        num_ori=4,
        degree=2,
    )
    model = DiffusionModel(cfg)
    B, A = 2, 3
    init_batch = CrystalBatch(
        frac_x=jnp.zeros((B, A, 3)),
        atom_types=jnp.zeros((B, A), jnp.int32),
        lattice=jnp.broadcast_to(4.0 * jnp.eye(3), (B, 3, 3)),
        num_atoms=jnp.full((B,), A),
        atom_mask=jnp.ones((B, A), bool),
    )
    params = model.init(jax.random.PRNGKey(0), init_batch)
    key = jax.random.PRNGKey(3)
    dense = model.sample(params, key, num_samples=B, num_atoms_per_sample=A)
    fallback = model.sample(
        params, key, num_samples=B, num_atoms_per_sample=A,
        sample_steps=cfg.num_timesteps - 1,
    )
    assert_allclose(dense.frac_x, fallback.frac_x, rtol=0, atol=0)
    assert np.array_equal(np.asarray(dense.atom_types), np.asarray(fallback.atom_types))


def test_sample_jit_cache_matches_unjitted_and_reuses_entry():
    """The jit-cached public sample() must return exactly what the raw impl
    returns (same key -> same draws), reuse one cache entry per static
    signature, and retrace transparently when constant_atoms appears."""
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel

    cfg = DiffusionConfig(
        num_atomic_states=4,
        num_timesteps=10,
        hidden_dim=8,
        basis_dim=8,
        num_layers=1,
        num_ori=4,
        degree=2,
    )
    model = DiffusionModel(cfg)
    B, A = 2, 3
    init_batch = CrystalBatch(
        frac_x=jnp.zeros((B, A, 3)),
        atom_types=jnp.zeros((B, A), jnp.int32),
        lattice=jnp.broadcast_to(4.0 * jnp.eye(3), (B, 3, 3)),
        num_atoms=jnp.full((B,), A),
        atom_mask=jnp.ones((B, A), bool),
    )
    params = model.init(jax.random.PRNGKey(0), init_batch)
    key = jax.random.PRNGKey(7)

    out_jit = model.sample(params, key, num_samples=B, num_atoms_per_sample=A)
    out_raw = model._sample_impl(params, key, num_samples=B, num_atoms_per_sample=A)
    np.testing.assert_allclose(
        np.asarray(out_jit.frac_x), np.asarray(out_raw.frac_x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out_jit.atom_types), np.asarray(out_raw.atom_types)
    )
    np.testing.assert_allclose(
        np.asarray(out_jit.lattice), np.asarray(out_raw.lattice), rtol=1e-5, atol=1e-6
    )

    # same static signature -> one cache entry, reused
    assert len(model._sample_jit_cache) == 1
    model.sample(params, jax.random.PRNGKey(8), num_samples=B, num_atoms_per_sample=A)
    assert len(model._sample_jit_cache) == 1
    # different static signature -> new entry
    model.sample(
        params, key, num_samples=B, num_atoms_per_sample=A, sample_steps=4
    )
    assert len(model._sample_jit_cache) == 2

    # constant_atoms rides the SAME entry (pytree-structure retrace) and pins
    # the returned types
    const = jnp.ones((B, A), jnp.int32)
    out_const = model.sample(
        params, key, num_samples=B, num_atoms_per_sample=A, constant_atoms=const
    )
    assert len(model._sample_jit_cache) == 2
    np.testing.assert_array_equal(np.asarray(out_const.atom_types), np.asarray(const))
