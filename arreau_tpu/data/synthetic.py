"""Synthetic crystal generator for tests, overfit checks and benchmarks.

Produces physically plausible random crystals with the same shape statistics
as the Alexandria dataset used by the reference (avg ~10 atoms/crystal,
lengths a few angstrom, near-orthogonal cells) so graph-build and train-step
cost is representative. This stands in for the real Alexandria shards when
no dataset files are present.
"""

from __future__ import annotations

import numpy as np

from arreau_tpu.data.atoms import AtomicNumberTable, table_from_zs
from arreau_tpu.tasks.diffusion import CrystalBatch

DEFAULT_ZS = [1, 3, 6, 7, 8, 13, 14, 26]  # H Li C N O Al Si Fe


def synthetic_z_table(zs=None) -> AtomicNumberTable:
    return table_from_zs(zs if zs is not None else DEFAULT_ZS)


def random_lattices(rng: np.random.Generator, n: int) -> np.ndarray:
    """Random monoclinic-ish lattices ``[n, 3, 3]`` in the canonical
    (pymatgen) orientation: lengths U(3, 8) angstrom, angles U(75, 105) deg."""
    lengths = rng.uniform(3.0, 8.0, size=(n, 3))
    angles = np.deg2rad(rng.uniform(75.0, 105.0, size=(n, 3)))
    cos_a, cos_b, cos_g = np.cos(angles).T
    sin_a, sin_b = np.sin(angles[:, 0]), np.sin(angles[:, 1])
    gamma_star = np.arccos(np.clip((cos_a * cos_b - cos_g) / (sin_a * sin_b), -1, 1))
    a, b, c = lengths.T
    zeros = np.zeros(n)
    va = np.stack([a * sin_b, zeros, a * cos_b], -1)
    vb = np.stack(
        [-b * sin_a * np.cos(gamma_star), b * sin_a * np.sin(gamma_star), b * cos_a], -1
    )
    vc = np.stack([zeros, zeros, c], -1)
    return np.stack([va, vb, vc], axis=1)


def _geometry_types(frac: np.ndarray, num_real: int) -> np.ndarray:
    """Atom types correlated with geometry (the fractional z coordinate) so
    the D3PM type channel has learnable signal instead of an irreducible
    uniform-entropy floor."""
    return np.minimum((frac[..., 2] * num_real).astype(np.int64), num_real - 1)


def make_synthetic_batch(
    rng: np.random.Generator,
    z_table: AtomicNumberTable,
    batch_size: int,
    max_atoms: int,
    min_atoms: int = 2,
    dtype=np.float32,
) -> CrystalBatch:
    """Random dense crystal batch: uniform frac coords, uniform real
    (non-MASK) atom types, variable atom counts."""
    B, A = batch_size, max_atoms
    lattice = random_lattices(rng, B)
    frac = rng.uniform(size=(B, A, 3))
    num_atoms = rng.integers(min_atoms, A + 1, size=(B,))
    atom_mask = np.arange(A)[None, :] < num_atoms[:, None]
    num_real = len(z_table) - 1  # exclude MASK (last index)
    types = _geometry_types(frac, num_real)
    types = np.where(atom_mask, types, 0)

    return CrystalBatch(
        frac_x=frac.astype(dtype),
        atom_types=types.astype(np.int32),
        lattice=lattice.astype(dtype),
        num_atoms=num_atoms.astype(np.int32),
        atom_mask=atom_mask,
    )


def synthetic_packed(n: int, seed: int = 0, max_atoms: int = 24, min_atoms: int = 2):
    """A CrystalDataset of n random crystals in the packed columnar layout
    (variable sizes, for exercising the bucketed loader and train CLI)."""
    from arreau_tpu.data.crystal import CrystalDataset, PackedCrystals

    rng = np.random.default_rng(seed)
    z_table = synthetic_z_table()
    counts = rng.integers(min_atoms, max_atoms + 1, size=n).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    total = int(offsets[-1])
    num_real = len(z_table) - 1
    frac = rng.uniform(size=(total, 3))
    type_indices = _geometry_types(frac, num_real)
    packed = PackedCrystals(
        atomic_numbers=np.asarray(z_table.indices_to_zs(type_indices)),
        frac_coords=frac,
        offsets=offsets,
        lattices=random_lattices(rng, n),
    )
    return CrystalDataset.from_packed(packed, z_table)
