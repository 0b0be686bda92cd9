"""Variance-preserving DDPM with a cosine alpha-bar schedule, pure-function.

Re-design of the reference's twin ``VP`` / ``VP_lattice`` classes
(/root/reference/diffusion/diffusion_helpers.py:84-220) as one schedule table
plus step functions (the two classes are byte-identical duplicates there; here
there is a single implementation). Used for lattice-length diffusion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPSILON = 1e-8


class VPSchedule(NamedTuple):
    alpha_bars: jax.Array  # [T + 1]
    betas: jax.Array  # [T + 1] (betas[0] = 0)
    sigmas: jax.Array  # [T + 1] (sigmas[0] = 0)

    @property
    def num_steps(self) -> int:
        return self.alpha_bars.shape[0] - 1


def make_vp_schedule(
    num_steps: int = 1000,
    s: float = 0.0001,
    power: int = 2,
    clipmax: float = 0.999,
    dtype=jnp.float32,
) -> VPSchedule:
    """Cosine alpha-bar schedule (Nichol & Dhariwal 2021), power/clip options as
    in the reference (diffusion_helpers.py:89-104)."""
    t = jnp.arange(0, num_steps + 1, dtype=dtype)
    f_t = jnp.cos((jnp.pi / 2) * ((t / num_steps) + s) / (1 + s)) ** power
    alpha_bars = f_t / f_t[0]
    betas = jnp.concatenate(
        [jnp.zeros((1,), dtype), 1 - alpha_bars[1:] / alpha_bars[:-1]]
    )
    betas = jnp.minimum(betas, clipmax)
    sigmas = jnp.sqrt(betas[1:] * (1 - alpha_bars[:-1]) / (1 - alpha_bars[1:]))
    sigmas = jnp.concatenate([jnp.zeros((1,), dtype), sigmas])
    return VPSchedule(alpha_bars=alpha_bars, betas=betas, sigmas=sigmas)


def vp_forward(
    schedule: VPSchedule, key: jax.Array, h0: jax.Array, t: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """q(h_t | h_0): ``h_t = sqrt(abar) h0 + sqrt(1-abar) eps``.

    ``h0``: ``[B, D]``, ``t``: ``[B]``. Returns (h_t, eps).
    """
    abar = schedule.alpha_bars[t][:, None]
    eps = jax.random.normal(key, h0.shape, dtype=h0.dtype)
    return jnp.sqrt(abar) * h0 + jnp.sqrt(1 - abar) * eps, eps


def vp_reverse_step(
    schedule: VPSchedule,
    key: jax.Array,
    ht: jax.Array,
    pred_eps: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """DDPM ancestral step from eps-prediction (Ho et al. 2020, alg. 2), with
    the reference's alpha clamping and t<=1 noise gating
    (diffusion_helpers.py:116-131)."""
    alpha = 1 - schedule.betas[t]
    alpha = jnp.maximum(alpha, 1 - schedule.betas[-2])
    abar = schedule.alpha_bars[t]
    sigma = schedule.sigmas[t][:, None]
    z = jnp.where(
        (t > 1)[:, None],
        jax.random.normal(key, ht.shape, dtype=ht.dtype),
        jnp.zeros_like(ht),
    )
    coef = (1.0 / jnp.sqrt(alpha + EPSILON))[:, None]
    eps_coef = ((1 - alpha) / jnp.sqrt(1 - abar + EPSILON))[:, None]
    return coef * (ht - eps_coef * pred_eps) + sigma * z


def vp_reverse_given_x0(
    schedule: VPSchedule,
    key: jax.Array,
    xt: jax.Array,
    pred_x0: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """Posterior q(x_{t-1} | x_t, x0-prediction) step — the sampler's lattice
    update (reference ``reverse_given_x0``, diffusion_helpers.py:185-199).

    Note: the reference adds noise scaled by the posterior *variance* (not its
    square root); we reproduce that exactly for parity.
    """
    abar_t = schedule.alpha_bars[t][:, None]
    abar_prev = schedule.alpha_bars[jnp.maximum(t - 1, 0)][:, None]
    beta_t = schedule.betas[t][:, None]
    alpha_t = 1 - beta_t
    denominator = 1 - abar_t
    mean = (jnp.sqrt(abar_prev) * beta_t * pred_x0 + jnp.sqrt(alpha_t) * (1 - abar_prev) * xt) / denominator
    variance = (1 - abar_prev) * beta_t / denominator
    z = jnp.where(
        (t > 1)[:, None],
        jax.random.normal(key, xt.shape, dtype=xt.dtype),
        jnp.zeros_like(xt),
    )
    return mean + variance * z


def vp_ddim_step_given_x0(
    schedule: VPSchedule,
    key: jax.Array,
    xt: jax.Array,
    pred_x0: jax.Array,
    t: jax.Array,
    s: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """Generalized (strided) reverse step t -> s (s < t) from an x0-prediction
    — DDIM (Song et al. 2021, eq. 12) specialized to x0-parameterization.

    ``x_s = sqrt(abar_s) x0 + sqrt(1 - abar_s - sig^2) eps_implied + sig z``
    with ``eps_implied = (x_t - sqrt(abar_t) x0) / sqrt(1 - abar_t)`` and
    ``sig = eta * sqrt((1-abar_s)/(1-abar_t)) * sqrt(1 - abar_t/abar_s)``.

    ``eta = 0`` is the deterministic DDIM update; ``eta = 1`` recovers the
    ancestral DDPM posterior std for adjacent steps. For an exact
    eps-prediction the marginal q(x_s | x0) = N(sqrt(abar_s) x0, 1-abar_s)
    is preserved for any eta (tests/test_strided_sampler.py). ``s == 0``
    returns the x0 prediction (abar_0 = 1). Beyond-parity: the reference
    sampler has no strided mode (diffusion_helpers.py:185-199 is the
    adjacent-step posterior only).
    """
    abar_t = schedule.alpha_bars[t][:, None]
    abar_s = schedule.alpha_bars[s][:, None]
    eps_implied = (xt - jnp.sqrt(abar_t) * pred_x0) / jnp.sqrt(1 - abar_t + EPSILON)
    sig = eta * jnp.sqrt((1 - abar_s) / (1 - abar_t + EPSILON)) * jnp.sqrt(
        jnp.maximum(1 - abar_t / (abar_s + EPSILON), 0.0)
    )
    dir_coef = jnp.sqrt(jnp.maximum(1 - abar_s - sig**2, 0.0))
    z = jnp.where(
        (s > 0)[:, None],
        jax.random.normal(key, xt.shape, dtype=xt.dtype),
        jnp.zeros_like(xt),
    )
    return jnp.sqrt(abar_s) * pred_x0 + dir_coef * eps_implied + sig * z


def vp_reverse_without_noise(
    schedule: VPSchedule, ht: jax.Array, pred_eps: jax.Array, t: jax.Array
) -> jax.Array:
    alpha = 1 - schedule.betas[t]
    alpha = jnp.maximum(alpha, 1 - schedule.betas[-2])
    abar = schedule.alpha_bars[t]
    coef = (1.0 / jnp.sqrt(alpha + EPSILON))[:, None]
    eps_coef = ((1 - alpha) / jnp.sqrt(1 - abar + EPSILON))[:, None]
    return coef * (ht - eps_coef * pred_eps)
