"""Variance-exploding score diffusion on fractional coordinates under PBC.

Pure-function re-design of the reference's ``VE_pbc``
(/root/reference/diffusion/diffusion_helpers.py:28-81): a geometric sigma
ladder, a wrapped forward noising whose regression target is the min-image
displacement from the noisy point back to the clean point, and an
annealed-Langevin-style reverse update. All functions take a dense crystal
batch ``[B, A, 3]`` and explicit PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from arreau_tpu.ops.lattice import cart_to_frac, frac_to_cart
from arreau_tpu.ops.pbc import min_distance_pbc


class VESchedule(NamedTuple):
    """Geometric sigma ladder ``sigmas[0..T]`` (sigmas[t] used at step t)."""

    sigmas: jax.Array  # [T + 1]

    @property
    def num_steps(self) -> int:
        return self.sigmas.shape[0] - 1


def make_ve_schedule(num_steps: int, sigma_min: float, sigma_max: float, dtype=jnp.float32) -> VESchedule:
    """``sigmas = exp(linspace(log sigma_min, log sigma_max, T+1))`` — the
    reference's ladder (diffusion_helpers.py:38-41)."""
    log_s = jnp.linspace(jnp.log(sigma_min), jnp.log(sigma_max), num_steps + 1, dtype=dtype)
    return VESchedule(sigmas=jnp.exp(log_s))


def ve_forward_pbc(
    schedule: VESchedule,
    key: jax.Array,
    frac_x0: jax.Array,
    t: jax.Array,
    lattice: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Noise fractional coords and compute the wrapped regression target.

    Args:
      frac_x0: ``[B, A, 3]`` clean fractional coordinates.
      t: ``[B]`` int timesteps in ``[1, T]`` (broadcast over atoms).
      lattice: ``[B, 3, 3]``.

    Returns:
      (frac_noisy ``[B, A, 3]``, wrapped_frac_eps ``[B, A, 3]``, used_sigmas
      ``[B, 1, 1]``) where ``wrapped_frac_eps`` is the min-image displacement
      from the closest periodic image of the clean position to the noisy
      position (noisy − clean_image), in fractional coordinates wrapped into
      [0, 1) — identical semantics to the reference's ``VE_pbc.forward``
      (diffusion_helpers.py:43-63), whose reverse step *subtracts* the
      predicted eps.
    """
    sigmas = schedule.sigmas[t][:, None, None]
    eps = jax.random.normal(key, frac_x0.shape, dtype=frac_x0.dtype)
    frac_noisy = (frac_x0 + eps * sigmas) % 1.0

    cart_noisy = frac_to_cart(frac_noisy, lattice)
    cart_clean = frac_to_cart(frac_x0, lattice)
    # Vector from the noisy point to the nearest image of the clean point.
    _, min_vec = min_distance_pbc(cart_noisy, cart_clean, lattice)
    wrapped_frac_eps = cart_to_frac(min_vec, lattice)
    return frac_noisy, wrapped_frac_eps, sigmas


def ve_reverse_step(
    schedule: VESchedule,
    key: jax.Array,
    frac_xt: jax.Array,
    pred_eps: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """One annealed-Langevin reverse step on wrapped fractional coords.

    ``x_{t-1} = (x_t - eps * (s_t^2 - s_{t-1}^2) + noise) mod 1`` with noise
    std ``sqrt(s_{t-1}^2 (s_t^2 - s_{t-1}^2) / s_t^2)`` — the reference's
    ``VE_pbc.reverse`` (diffusion_helpers.py:65-81). ``t`` is ``[B]``.
    """
    sig = schedule.sigmas[t][:, None, None]
    adj = jnp.where((t == 0)[:, None, None], 0.0, schedule.sigmas[jnp.maximum(t - 1, 0)][:, None, None])
    mean = frac_xt - pred_eps * (sig**2 - adj**2)
    std = jnp.sqrt(jnp.maximum(adj**2 * (sig**2 - adj**2) / (sig**2), 0.0))
    noise = jax.random.normal(key, frac_xt.shape, dtype=frac_xt.dtype)
    return (mean + std * noise) % 1.0


def ve_ddim_step(
    schedule: VESchedule,
    key: jax.Array,
    frac_xt: jax.Array,
    pred_eps: jax.Array,
    t: jax.Array,
    s: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """Strided reverse step sigma_t -> sigma_s (s < t) on wrapped coords.

    The VE forward is ``x_t = x0 + sigma_t eps``; the model predicts the
    (min-image) displacement ``pred_eps = x_t - x0``, so ``x0_hat = x_t -
    pred_eps``. The DDIM family of updates preserving the q(x_s | x0)
    marginal under an exact prediction is

    ``x_s = x0_hat + sqrt(sigma_s^2 - sig_n^2)/sigma_t * pred_eps + sig_n z``

    with ``sig_n = eta * sigma_s * sqrt(1 - sigma_s^2/sigma_t^2)`` (eta = 0:
    deterministic; eta = 1: the exact ancestral posterior q(x_s | x_t, x0),
    whose std matches :func:`ve_reverse_step`'s). All arithmetic stays in
    fractional space and re-wraps mod 1. Beyond-parity: the reference has no
    strided sampler; note its adjacent-step mean uses the annealed-Langevin
    step ``pred_eps (sigma_t^2 - sigma_{t-1}^2)`` (diffusion_helpers.py:65-81)
    rather than this exact posterior mean — the two agree only as the per-step
    sigma ratio -> 1.
    """
    sig_t = schedule.sigmas[t][:, None, None]
    sig_s = jnp.where((s == 0)[:, None, None], 0.0, schedule.sigmas[jnp.maximum(s, 0)][:, None, None])
    sig_n = eta * sig_s * jnp.sqrt(jnp.maximum(1 - sig_s**2 / sig_t**2, 0.0))
    dir_coef = jnp.sqrt(jnp.maximum(sig_s**2 - sig_n**2, 0.0)) / sig_t
    x0_hat = frac_xt - pred_eps
    noise = jax.random.normal(key, frac_xt.shape, dtype=frac_xt.dtype)
    return (x0_hat + dir_coef * pred_eps + sig_n * noise) % 1.0
