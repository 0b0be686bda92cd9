"""Generated-crystal result container + HDF5 IO.

Capability parity with the reference's ``SampleResult`` dataclass
(/root/reference/diffusion/diffusion_loss.py:39-49) and its HDF5 save/load
(/root/reference/diffusion/inference/process_generated_crystals.py:8-47).
The on-disk field names match the reference so downstream tools interoperate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class SampleResult:
    frac_x: Optional[np.ndarray] = None  # [total_atoms, 3]
    atomic_numbers: Optional[np.ndarray] = None  # [total_atoms]
    lattice: Optional[np.ndarray] = None  # [num_crystals, 3, 3]
    idx_start: Optional[np.ndarray] = None  # [num_crystals]
    num_atoms: Optional[np.ndarray] = None  # [num_crystals]

    def crystal(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(frac coords, atomic numbers, lattice) of crystal i."""
        s = int(self.idx_start[i])
        e = s + int(self.num_atoms[i])
        return self.frac_x[s:e], self.atomic_numbers[s:e], self.lattice[i]

    @property
    def num_crystals(self) -> int:
        return len(self.num_atoms)


def from_dense_batch(batch, z_table) -> SampleResult:
    """Flatten a dense sampled CrystalBatch into a SampleResult (host side)."""
    frac = np.asarray(batch.frac_x, np.float64)
    types = np.asarray(batch.atom_types)
    mask = np.asarray(batch.atom_mask)
    lattice = np.asarray(batch.lattice, np.float64)
    num_atoms = np.asarray(batch.num_atoms)

    frac_list, z_list = [], []
    for b in range(frac.shape[0]):
        m = mask[b]
        frac_list.append(frac[b][m])
        z_list.append(z_table.indices_to_zs(types[b][m]))
    idx_start = np.concatenate([[0], np.cumsum(num_atoms)[:-1]])
    return SampleResult(
        frac_x=np.concatenate(frac_list),
        atomic_numbers=np.concatenate(z_list),
        lattice=lattice,
        idx_start=idx_start.astype(np.int64),
        num_atoms=num_atoms.astype(np.int64),
    )


def concat_results(results: list[SampleResult]) -> SampleResult:
    frac = np.concatenate([r.frac_x for r in results])
    zs = np.concatenate([r.atomic_numbers for r in results])
    lattice = np.concatenate([r.lattice for r in results])
    num_atoms = np.concatenate([r.num_atoms for r in results])
    idx_start = np.concatenate([[0], np.cumsum(num_atoms)[:-1]])
    return SampleResult(frac, zs, lattice, idx_start.astype(np.int64), num_atoms)


def save_sample_results(path: str, result: SampleResult) -> None:
    """Write the reference layout: datasets nested under a ``crystals`` group
    (process_generated_crystals.py:8-15), so reference tools read these files."""
    import h5py
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        g = f.create_group("crystals")
        g.create_dataset("frac_x", data=result.frac_x)
        g.create_dataset("atomic_numbers", data=result.atomic_numbers)
        g.create_dataset("lattice", data=result.lattice)
        g.create_dataset("idx_start", data=result.idx_start)
        g.create_dataset("num_atoms", data=result.num_atoms)


def load_sample_results(path: str) -> SampleResult:
    """Read either the reference's grouped layout or flat root datasets."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f["crystals"] if "crystals" in f else f
        return SampleResult(
            frac_x=g["frac_x"][:],
            atomic_numbers=g["atomic_numbers"][:],
            lattice=g["lattice"][:],
            idx_start=g["idx_start"][:],
            num_atoms=g["num_atoms"][:],
        )
