"""Crystal dataset: HDF5 IO, size-bucketed dense batching, and splits.

Capability parity with the reference's data layer
(/root/reference/diffusion/lattice_dataset.py:15-113) redesigned for TPU
input pipelines:

  * **Packed columnar HDF5 layout** (`atomic_numbers [total_atoms]`,
    `frac_coords [total_atoms, 3]`, `offsets [N+1]`, `lattice_matrix
    [N, 3, 3]`): one contiguous read instead of the reference's
    dataset-per-crystal layout (which it itself flags as slow). The reference
    layout is still readable for drop-in compatibility.
  * **Size-bucketed dense batching**: XLA needs static shapes, so crystals
    are grouped into per-batch size buckets (max-atoms ladder) and emitted as
    dense ``[B, A_bucket]`` :class:`CrystalBatch` es with masks. Bucket
    batch-sizes are derived from a node budget so every compiled program
    variant does similar work. This replaces the PyG DataLoader + flat Batch
    collation (main_diffusion.py:221-230).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from arreau_tpu.data.atoms import AtomicNumberTable, table_from_zs
from arreau_tpu.tasks.diffusion import CrystalBatch

DEFAULT_BUCKETS = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


@dataclass
class PackedCrystals:
    """Columnar in-memory crystal store (float64 on disk/host, cast at batch)."""

    atomic_numbers: np.ndarray  # [total_atoms] int
    frac_coords: np.ndarray  # [total_atoms, 3]
    offsets: np.ndarray  # [N + 1] int64 prefix sums
    lattices: np.ndarray  # [N, 3, 3]

    def __len__(self) -> int:
        return len(self.lattices)

    @property
    def num_atoms(self) -> np.ndarray:
        return np.diff(self.offsets)

    def concat(self, other: "PackedCrystals") -> "PackedCrystals":
        return PackedCrystals(
            atomic_numbers=np.concatenate([self.atomic_numbers, other.atomic_numbers]),
            frac_coords=np.concatenate([self.frac_coords, other.frac_coords]),
            offsets=np.concatenate(
                [self.offsets, self.offsets[-1] + other.offsets[1:]]
            ),
            lattices=np.concatenate([self.lattices, other.lattices]),
        )


def write_packed_h5(path: str, packed: PackedCrystals) -> None:
    import h5py

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("atomic_numbers", data=packed.atomic_numbers)
        f.create_dataset("frac_coords", data=packed.frac_coords)
        f.create_dataset("offsets", data=packed.offsets)
        f.create_dataset("lattice_matrix", data=packed.lattices)
        f.attrs["layout"] = "packed-v1"


def read_h5(path: str) -> PackedCrystals:
    """Read either the packed layout or the reference per-crystal layout
    (groups ``atomic_number/<i>``, ``frac_coord/<i>``, dense
    ``lattice_matrix``)."""
    import h5py

    with h5py.File(path, "r") as f:
        if "offsets" in f:
            return PackedCrystals(
                atomic_numbers=f["atomic_numbers"][:],
                frac_coords=f["frac_coords"][:],
                offsets=f["offsets"][:],
                lattices=f["lattice_matrix"][:],
            )
        # reference layout
        keys = sorted(f["atomic_number"], key=int)
        zs = [f["atomic_number"][k][:] for k in keys]
        fkeys = sorted(f["frac_coord"], key=int)
        fracs = [f["frac_coord"][k][:] for k in fkeys]
        lattices = f["lattice_matrix"][:]
    counts = np.array([len(z) for z in zs], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return PackedCrystals(
        atomic_numbers=np.concatenate(zs) if zs else np.zeros(0, np.int64),
        frac_coords=np.concatenate(fracs) if fracs else np.zeros((0, 3)),
        offsets=offsets,
        lattices=lattices,
    )


class CrystalDataset:
    """Loads one or more shards and exposes packed arrays + the z-table."""

    def __init__(self, paths: Sequence[str] = (), packed: Optional[PackedCrystals] = None,
                 z_table: Optional[AtomicNumberTable] = None):
        if packed is None:
            packs = [read_h5(p) for p in paths]
            packed = packs[0]
            for p in packs[1:]:
                packed = packed.concat(p)
        self.packed = packed
        self.z_table: AtomicNumberTable = z_table or table_from_zs(
            np.unique(packed.atomic_numbers).tolist()
        )
        # Pre-convert Zs to table indices once.
        self.type_indices = self.z_table.zs_to_indices(packed.atomic_numbers)

    @classmethod
    def from_packed(cls, packed: PackedCrystals, z_table=None) -> "CrystalDataset":
        return cls(packed=packed, z_table=z_table)

    def __len__(self) -> int:
        return len(self.packed)


def random_split(
    n: int, fractions: Sequence[float], seed: int
) -> list[np.ndarray]:
    """Shuffled index split (reference uses torch random_split 0.7/0.15/0.15,
    main_diffusion.py:212-216)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    out, start = [], 0
    for frac in fractions[:-1]:
        size = int(round(frac * n))
        out.append(perm[start : start + size])
        start += size
    out.append(perm[start:])
    return out


def _bucket_for(n_atoms: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n_atoms <= b:
            return b
    raise ValueError(f"crystal with {n_atoms} atoms exceeds largest bucket {buckets[-1]}")


def pack_dense_batch(
    dataset: CrystalDataset,
    idx: np.ndarray,
    max_atoms: int,
    dtype=np.float32,
) -> CrystalBatch:
    """Collate the given crystals into one dense padded batch (numpy).

    A C++ fast path (arreau_tpu.native.collate) is used when the extension is
    built; this numpy version is the reference implementation and fallback.
    """
    from arreau_tpu.native import collate_dense  # lazy; may be the numpy impl

    packed = dataset.packed
    return collate_dense(
        type_indices=dataset.type_indices,
        frac_coords=packed.frac_coords,
        offsets=packed.offsets,
        lattices=packed.lattices,
        idx=np.asarray(idx, np.int64),
        max_atoms=max_atoms,
        dtype=dtype,
    )


class BucketedLoader:
    """Shuffled size-bucketed batch iterator.

    Crystals are assigned to the smallest bucket that fits; each bucket's
    batch size is ``node_budget // bucket`` so every program variant does a
    similar amount of work. Batches are emitted in shuffled bucket-chunk
    order each epoch. Batch sizes can optionally be rounded down to a
    multiple of the data-parallel device count.
    """

    def __init__(
        self,
        dataset: CrystalDataset,
        indices: np.ndarray,
        node_budget: int = 4096,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        seed: int = 0,
        dtype=np.float32,
        batch_multiple: int = 1,
        drop_remainder: bool = False,
        host_index: int = 0,
        num_hosts: int = 1,
    ):
        # Multi-host SPMD contract: every host must execute the SAME sequence
        # of compiled programs (bucket sizes) for the SAME number of steps, or
        # the gradient collectives deadlock. So chunking decisions are made
        # GLOBALLY from the shared seed over the full index set, and each host
        # takes its stride slice of every global chunk (disjoint data, equal
        # shapes). batch_multiple should be the GLOBAL device count.
        assert 0 <= host_index < num_hosts
        self.dataset = dataset
        self.node_budget = node_budget
        self.buckets = tuple(buckets)
        self.dtype = dtype
        self.batch_multiple = max(batch_multiple, num_hosts)
        self.drop_remainder = drop_remainder
        self.host_index = host_index
        self.num_hosts = num_hosts
        self._rng = np.random.default_rng(seed)

        num_atoms = dataset.packed.num_atoms
        self.by_bucket: dict[int, np.ndarray] = {}
        assign = {b: [] for b in self.buckets}
        for i in np.asarray(indices):
            assign[_bucket_for(int(num_atoms[i]), self.buckets)].append(i)
        for b, lst in assign.items():
            if lst:
                self.by_bucket[b] = np.asarray(lst, np.int64)

    def batch_size_for(self, bucket: int) -> int:
        """GLOBAL batch size for a bucket (all hosts combined)."""
        bs = max(self.node_budget // bucket, 1)
        m = self.batch_multiple
        if m > 1:
            bs = max((bs // m) * m, m)
        return bs

    def _global_chunks(self) -> list[tuple[int, np.ndarray]]:
        chunks: list[tuple[int, np.ndarray]] = []
        for bucket in self.buckets:  # deterministic bucket order
            if bucket not in self.by_bucket:
                continue
            perm = self._rng.permutation(self.by_bucket[bucket])
            bs = self.batch_size_for(bucket)
            for start in range(0, len(perm), bs):
                chunk = perm[start : start + bs]
                if len(chunk) < bs:
                    if self.drop_remainder:
                        continue
                    # pad the final chunk with the -1 sentinel so the shape
                    # (and compiled program) stays identical; the collator
                    # emits empty masked examples for sentinels, and the loss
                    # / metrics exclude them — epoch means stay exact.
                    chunk = np.concatenate(
                        [chunk, np.full(bs - len(chunk), -1, np.int64)]
                    )
                chunks.append((bucket, chunk))
        order = self._rng.permutation(len(chunks))
        return [chunks[i] for i in order]

    def __iter__(self) -> Iterator[CrystalBatch]:
        for bucket, chunk in self._global_chunks():
            local = chunk[self.host_index :: self.num_hosts]
            yield pack_dense_batch(self.dataset, local, bucket, self.dtype)

    def num_batches(self) -> int:
        total = 0
        for bucket, idx in self.by_bucket.items():
            bs = self.batch_size_for(bucket)
            n = len(idx) // bs if self.drop_remainder else -(-len(idx) // bs)
            total += n
        return total
