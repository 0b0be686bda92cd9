"""Parity tests for VE/VP/D3PM schedules against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from arreau_tpu.diffusion.ve import make_ve_schedule, ve_reverse_step
from arreau_tpu.diffusion.vp import (
    make_vp_schedule,
    vp_forward,
    vp_reverse_given_x0,
    vp_reverse_step,
)
from arreau_tpu.diffusion import d3pm as d3


def test_ve_sigma_ladder():
    T, smin, smax = 1000, 0.001, 1.0
    sched = make_ve_schedule(T, smin, smax, dtype=jnp.float64)
    sig = np.asarray(sched.sigmas)
    assert sig.shape == (T + 1,)
    np.testing.assert_allclose(sig[0], smin, rtol=1e-12)
    np.testing.assert_allclose(sig[-1], smax, rtol=1e-12)
    # geometric: constant ratio
    ratios = sig[1:] / sig[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-9)


def _oracle_vp(T, s=0.0001, power=2, clipmax=0.999):
    t = np.arange(0, T + 1, dtype=np.float64)
    f_t = np.cos((np.pi / 2) * ((t / T) + s) / (1 + s)) ** power
    alpha_bars = f_t / f_t[0]
    betas = np.concatenate([[0.0], 1 - alpha_bars[1:] / alpha_bars[:-1]])
    betas = np.minimum(betas, clipmax)
    sigmas = np.concatenate(
        [[0.0], np.sqrt(betas[1:] * (1 - alpha_bars[:-1]) / (1 - alpha_bars[1:]))]
    )
    return alpha_bars, betas, sigmas


def test_vp_schedule_tables():
    T = 1000
    sched = make_vp_schedule(T, dtype=jnp.float64)
    abar, betas, sigmas = _oracle_vp(T)
    np.testing.assert_allclose(np.asarray(sched.alpha_bars), abar, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sched.sigmas), sigmas, rtol=1e-10)


def test_vp_forward_stats():
    """Forward marginal at large t should approach N(0, 1)."""
    T = 1000
    sched = make_vp_schedule(T, dtype=jnp.float64)
    h0 = jnp.full((4096, 3), 2.5, dtype=jnp.float64)
    t = jnp.full((4096,), T, dtype=jnp.int32)
    ht, eps = vp_forward(sched, jax.random.PRNGKey(0), h0, t)
    ht = np.asarray(ht)
    assert abs(ht.mean()) < 0.05
    assert abs(ht.std() - 1.0) < 0.05


def test_vp_reverse_given_x0_with_true_x0_recovers():
    """Iterating reverse_given_x0 with the TRUE x0 from T to 1 should land near
    x0 (posterior mean collapses onto x0 as t -> 1)."""
    T = 50
    sched = make_vp_schedule(T, dtype=jnp.float64)
    key = jax.random.PRNGKey(1)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)) * 3)
    xt = jax.random.normal(key, x0.shape, dtype=jnp.float64)
    for timestep in range(T - 1, 0, -1):
        key, sub = jax.random.split(key)
        t = jnp.full((8,), timestep, dtype=jnp.int32)
        xt = vp_reverse_given_x0(sched, sub, xt, x0, t)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0), atol=0.3)


def test_ve_reverse_t0_no_noise():
    sched = make_ve_schedule(100, 0.001, 1.0, dtype=jnp.float64)
    xt = jnp.asarray(np.random.default_rng(2).uniform(size=(2, 4, 3)))
    eps = jnp.zeros_like(xt)
    out = ve_reverse_step(sched, jax.random.PRNGKey(0), xt, eps, jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(xt) % 1.0, rtol=1e-12)


# ---------------- D3PM ----------------


def test_d3pm_tables_mask_structure():
    T, C = 100, 7
    tbl = d3.make_d3pm_tables(T, C, dtype=jnp.float64)
    q1 = np.asarray(tbl.q_one_step_transposed[0]).T  # un-transpose
    # rows sum to 1; diagonal 0.98; mask column 0.02; mask row absorbing
    np.testing.assert_allclose(q1.sum(-1), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.diag(q1)[:-1], 0.98)
    np.testing.assert_allclose(q1[:-1, -1], 0.02)
    np.testing.assert_allclose(q1[-1, -1], 1.0)
    # cumulative: q_mats[t-1][i, mask] = 1 - 0.98^t for i != mask
    for t in (1, 5, 50):
        qm = np.asarray(tbl.q_mats[t - 1])
        np.testing.assert_allclose(qm[0, -1], 1 - 0.98**t, rtol=1e-10)
        np.testing.assert_allclose(np.diag(qm)[:-1], 0.98**t, rtol=1e-10)


def test_d3pm_sample_xt_distribution():
    T, C = 100, 5
    tbl = d3.make_d3pm_tables(T, C, dtype=jnp.float64)
    N = 20000
    x0 = jnp.zeros((1, N), dtype=jnp.int32)
    t = jnp.full((1, N), 40, dtype=jnp.int32)
    xt = d3.d3pm_sample_xt(tbl, jax.random.PRNGKey(0), x0, t)
    frac_mask = (np.asarray(xt) == C - 1).mean()
    expected = 1 - 0.98**40
    assert abs(frac_mask - expected) < 0.02
    # only x0 class or mask are ever produced by the masking process
    assert set(np.unique(np.asarray(xt))) <= {0, C - 1}


def test_d3pm_posterior_t1_returns_x0_logits():
    T, C = 10, 4
    tbl = d3.make_d3pm_tables(T, C, dtype=jnp.float64)
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(1, 6, C)))
    xt = jnp.zeros((1, 6), dtype=jnp.int32)
    t = jnp.ones((1, 6), dtype=jnp.int32)
    post = d3.q_posterior_logits(tbl, logits, xt, t)
    np.testing.assert_allclose(np.asarray(post), np.asarray(logits), rtol=1e-12)


def test_d3pm_loss_perfect_prediction_small():
    """With near-one-hot correct predictions the hybrid loss ≈ CE ≈ 0."""
    T, C = 10, 4
    tbl = d3.make_d3pm_tables(T, C, dtype=jnp.float64)
    x0 = jnp.asarray(np.random.default_rng(4).integers(0, C - 1, size=(2, 5)))
    t = jnp.full((2, 5), 3, dtype=jnp.int32)
    xt = d3.d3pm_sample_xt(tbl, jax.random.PRNGKey(1), x0, t)
    perfect_logits = jnp.log(jax.nn.one_hot(x0, C, dtype=jnp.float64) + 1e-10)
    mask = jnp.ones((2, 5), dtype=bool)
    loss = d3.d3pm_loss(tbl, x0, perfect_logits, xt, t, mask)
    assert float(loss) < 1e-3

    # random logits should be much worse
    bad_logits = jnp.asarray(np.random.default_rng(5).normal(size=(2, 5, C)))
    bad = d3.d3pm_loss(tbl, x0, bad_logits, xt, t, mask)
    assert float(bad) > float(loss) + 0.1


def test_d3pm_loss_masking():
    """Padded atoms must not change the loss."""
    T, C = 10, 4
    tbl = d3.make_d3pm_tables(T, C, dtype=jnp.float64)
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.integers(0, C - 1, size=(1, 4)))
    logits = jnp.asarray(rng.normal(size=(1, 4, C)))
    xt = jnp.asarray(rng.integers(0, C, size=(1, 4)))
    t = jnp.full((1, 4), 5, dtype=jnp.int32)

    full = d3.d3pm_loss(tbl, x0, logits, xt, t, jnp.ones((1, 4), bool))

    # pad with junk atoms, mask them out
    x0p = jnp.concatenate([x0, jnp.full((1, 3), 2)], axis=1)
    logitsp = jnp.concatenate([logits, jnp.asarray(rng.normal(size=(1, 3, C)))], axis=1)
    xtp = jnp.concatenate([xt, jnp.full((1, 3), 1)], axis=1)
    tp = jnp.full((1, 7), 5, dtype=jnp.int32)
    maskp = jnp.asarray([[True] * 4 + [False] * 3])
    padded = d3.d3pm_loss(tbl, x0p, logitsp, xtp, tp, maskp)
    np.testing.assert_allclose(float(padded), float(full), rtol=1e-10)


def test_d3pm_reverse_reaches_real_classes():
    """Reverse sampling from all-mask with confident x0 logits should recover
    the predicted classes by t=1."""
    T, C = 50, 6
    tbl = d3.make_d3pm_tables(T, C, dtype=jnp.float64)
    key = jax.random.PRNGKey(7)
    B, A = 2, 10
    target = jnp.asarray(np.random.default_rng(8).integers(0, C - 1, size=(B, A)))
    logits = jnp.log(jax.nn.one_hot(target, C, dtype=jnp.float64) + 1e-10)
    x = jnp.full((B, A), C - 1)
    for timestep in range(T - 1, 0, -1):
        key, sub = jax.random.split(key)
        t = jnp.full((B, A), timestep, dtype=jnp.int32)
        x = d3.d3pm_reverse_step(tbl, sub, x, logits, t)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(target))


def test_d3pm_reverse_temperature_zero_is_posterior_argmax():
    """temperature=0 makes the reverse draw the deterministic posterior
    argmax, independent of the RNG key; temperature=1 is the reference
    gumbel draw."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.diffusion import d3pm as d3

    tbl = d3.make_d3pm_tables(num_steps=50, num_classes=6, forward_type="mask")
    rng = jax.random.PRNGKey(0)
    x0_logits = jax.random.normal(rng, (4, 8, 6)) * 3.0
    xt = jnp.full((4, 8), 5)  # all MASK
    t = jnp.full((4, 8), 30)

    a = d3.d3pm_reverse_step(tbl, jax.random.PRNGKey(1), xt, x0_logits, t, temperature=0.0)
    b = d3.d3pm_reverse_step(tbl, jax.random.PRNGKey(2), xt, x0_logits, t, temperature=0.0)
    assert (a == b).all()
    expected = jnp.argmax(d3.q_posterior_logits(tbl, x0_logits, xt, t), axis=-1)
    assert (a == expected).all()
