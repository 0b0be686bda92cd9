"""Smooth radial cutoff envelope (DimeNet eq. 8), pure-jnp.

Reference behavior: /root/reference/ponita/utils/windowing.py:4-34.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polynomial_cutoff(x: jax.Array, r_max: float | None, p: int = 6) -> jax.Array:
    """Polynomial envelope that smoothly decays to 0 at ``r_max``.

    ``envelope(x) = 1 - (p+1)(p+2)/2 u^p + p(p+2) u^(p+1) - p(p+1)/2 u^(p+2)``
    with ``u = x / r_max``, multiplied by the indicator ``x < r_max``.
    ``r_max=None`` returns ones (no windowing).
    """
    if r_max is None:
        return jnp.ones_like(x)
    u = x / r_max
    pf = float(p)
    envelope = (
        1.0
        - (pf + 1.0) * (pf + 2.0) / 2.0 * u**p
        + pf * (pf + 2.0) * u ** (p + 1)
        - pf * (pf + 1.0) / 2.0 * u ** (p + 2)
    )
    return envelope * (x < r_max)
