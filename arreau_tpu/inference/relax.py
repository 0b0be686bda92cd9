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


def relax_with_mace(
    result,
    model_path: str | None = None,
    fmax: float = 0.05,
    max_steps: int = 100,
    device: str = "cpu",
):
    """Reference-parity MACE + ASE BFGS relaxation of a ``SampleResult``
    (/root/reference/diffusion/inference/relax.py:21-75: per-crystal ASE
    ``Atoms`` with scaled positions + PBC, MACE calculator, BFGS loop,
    relaxed fractional coordinates written back; lattice held fixed like the
    reference).

    Fully wired — it runs as soon as the `mace-torch` and `ase` packages are
    installed (they are not bundled in this image, hence the import gate).
    ``model_path`` selects a local ``.model`` file like the reference's
    pinned ``MACECalculator`` checkpoint; ``None`` uses the downloadable
    MACE-MP foundation model (``mace.calculators.mace_mp``). Returns a new
    ``SampleResult``; ``relax_soft_sphere`` stays the TPU-native in-image
    alternative.
    """
    try:
        from ase import Atoms
        from ase.optimize import BFGS
        if model_path is None:
            from mace.calculators import mace_mp

            calculator = mace_mp(device=device)
        else:
            from mace.calculators import MACECalculator

            calculator = MACECalculator(model_paths=model_path, device=device)
    except ImportError as e:
        raise ImportError(
            "relax_with_mace needs the `mace-torch` and `ase` packages (the "
            "reference's MACE-MP relaxation path). Use relax_soft_sphere for "
            "the built-in TPU-native relaxation."
        ) from e

    import numpy as np

    from arreau_tpu.inference.io import SampleResult

    new_frac = np.array(result.frac_x, dtype=np.float64, copy=True)
    energies = []
    for i in range(len(result.num_atoms)):
        s, n = int(result.idx_start[i]), int(result.num_atoms[i])
        system = Atoms(
            numbers=np.asarray(result.atomic_numbers[s : s + n]),
            scaled_positions=np.asarray(result.frac_x[s : s + n]) % 1.0,
            cell=np.asarray(result.lattice[i]),
            pbc=(True, True, True),
        )
        system.calc = calculator
        BFGS(system, logfile=None).run(fmax=fmax, steps=max_steps)
        new_frac[s : s + n] = system.get_scaled_positions()
        energies.append(float(system.get_potential_energy()))
    return SampleResult(
        frac_x=new_frac,
        atomic_numbers=np.array(result.atomic_numbers, copy=True),
        lattice=np.array(result.lattice, copy=True),
        idx_start=np.array(result.idx_start, copy=True),
        num_atoms=np.array(result.num_atoms, copy=True),
    ), np.asarray(energies)
