"""Gaussian Fourier time-step embedding (fixed random frequencies).

Reference behavior: /root/reference/diffusion/diffusion_helpers.py:14-25 —
non-trainable ``w ~ N(0, scale^2)``, output ``[sin(2*pi*w*x) || cos(2*pi*w*x)]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_fourier_weights(key: jax.Array, embedding_size: int, scale: float) -> jax.Array:
    """Sample the fixed (non-trainable) frequency vector ``[embedding_size]``."""
    return jax.random.normal(key, (embedding_size,)) * scale


def gaussian_fourier_features(x: jax.Array, weights: jax.Array) -> jax.Array:
    """Embed ``x`` ``[..., 1]`` (or ``[...]``) into ``[..., 2*embedding_size]``."""
    if x.ndim == 0 or x.shape[-1] != 1:
        x = x[..., None]
    proj = x * weights * (2 * jnp.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
