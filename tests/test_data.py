"""Data layer tests: z-table, HDF5 roundtrip (both layouts), prep parsing,
native collator parity, bucketed loader."""

import bz2
import json
import os

import numpy as np
import pytest

from arreau_tpu.data.atoms import (
    MASK_ATOMIC_NUMBER,
    AtomicNumberTable,
    symbol_to_z,
    table_from_zs,
    z_to_symbol,
)
from arreau_tpu.data.crystal import (
    BucketedLoader,
    CrystalDataset,
    PackedCrystals,
    pack_dense_batch,
    random_split,
    read_h5,
    write_packed_h5,
)
from arreau_tpu.data.prep import parse_entries, prep_shard


def _random_packed(n=20, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(2, 9, size=n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = offsets[-1]
    return PackedCrystals(
        atomic_numbers=rng.choice([1, 6, 8, 26], size=total),
        frac_coords=rng.uniform(size=(total, 3)),
        offsets=offsets,
        lattices=rng.normal(size=(n, 3, 3)) + 4 * np.eye(3),
    )


def test_z_table():
    t = table_from_zs([8, 1, 6], [26])
    assert t.zs == [1, 6, 8, 26, MASK_ATOMIC_NUMBER]
    assert t.mask_index == 4
    assert t.z_to_index(8) == 2 and t.index_to_z(2) == 8
    np.testing.assert_array_equal(t.zs_to_indices(np.array([1, 26, 6])), [0, 3, 1])
    np.testing.assert_array_equal(t.indices_to_zs(np.array([0, 3])), [1, 26])
    np.testing.assert_array_equal(t.symbols_to_indices(["H", "Fe", "O"]), [0, 3, 2])
    assert symbol_to_z("Fe") == 26 and z_to_symbol(26) == "Fe"
    assert z_to_symbol(MASK_ATOMIC_NUMBER) == "MASK"


def test_packed_h5_roundtrip(tmp_path):
    packed = _random_packed()
    path = str(tmp_path / "x.h5")
    write_packed_h5(path, packed)
    back = read_h5(path)
    np.testing.assert_array_equal(back.atomic_numbers, packed.atomic_numbers)
    np.testing.assert_allclose(back.frac_coords, packed.frac_coords)
    np.testing.assert_array_equal(back.offsets, packed.offsets)
    np.testing.assert_allclose(back.lattices, packed.lattices)


def test_reference_layout_read(tmp_path):
    """The reference's dataset-per-crystal HDF5 layout is readable too."""
    import h5py

    packed = _random_packed(5, seed=1)
    path = str(tmp_path / "ref.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("atomic_number")
        fc = f.create_group("frac_coord")
        for i in range(5):
            s, e = packed.offsets[i], packed.offsets[i + 1]
            g.create_dataset(str(i), data=packed.atomic_numbers[s:e])
            fc.create_dataset(str(i), data=packed.frac_coords[s:e])
        f.create_dataset("lattice_matrix", data=packed.lattices)
    back = read_h5(path)
    np.testing.assert_array_equal(back.atomic_numbers, packed.atomic_numbers)
    np.testing.assert_allclose(back.frac_coords, packed.frac_coords)
    np.testing.assert_array_equal(back.offsets, packed.offsets)


def test_prep_parses_pymatgen_schema(tmp_path):
    entry = {
        "structure": {
            "lattice": {"matrix": [[4.0, 0, 0], [0, 5.0, 0], [0, 0, 6.0]]},
            "sites": [
                {"species": [{"element": "Fe", "occu": 1}], "abc": [0.1, 0.2, 0.3]},
                {"species": [{"element": "O", "occu": 1}], "abc": [0.5, 0.5, 0.5]},
            ],
        }
    }
    data = {"entries": [entry, entry]}
    packed = parse_entries(data)
    assert len(packed) == 2
    np.testing.assert_array_equal(packed.atomic_numbers, [26, 8, 26, 8])
    np.testing.assert_allclose(packed.frac_coords[1], [0.5, 0.5, 0.5])

    # end-to-end: bz2 file -> packed h5
    in_path = str(tmp_path / "shard.json.bz2")
    with bz2.open(in_path, "wt", encoding="utf-8") as fh:
        json.dump(data, fh)
    out_path = str(tmp_path / "shard.h5")
    prep_shard(in_path, out_path, take=1)
    back = read_h5(out_path)
    assert len(back) == 1


def test_native_collator_matches_numpy(tmp_path):
    from arreau_tpu.native import _collate_numpy, _load, collate_dense

    packed = _random_packed(16, seed=2)
    path = str(tmp_path / "c.h5")
    write_packed_h5(path, packed)
    ds = CrystalDataset([path])
    idx = np.array([3, 0, 7, 7, 12])

    got = pack_dense_batch(ds, idx, max_atoms=12, dtype=np.float32)
    want = _collate_numpy(
        ds.type_indices,
        packed.frac_coords,
        packed.offsets,
        packed.lattices,
        idx,
        12,
        np.float32,
    )
    assert _load() is not None, "native collator failed to build"
    np.testing.assert_allclose(got.frac_x, want.frac_x, rtol=1e-6)
    np.testing.assert_array_equal(got.atom_types, want.atom_types)
    np.testing.assert_allclose(got.lattice, want.lattice, rtol=1e-6)
    np.testing.assert_array_equal(got.num_atoms, want.num_atoms)
    np.testing.assert_array_equal(got.atom_mask, want.atom_mask)


def test_random_split():
    splits = random_split(100, [0.7, 0.15, 0.15], seed=0)
    assert [len(s) for s in splits] == [70, 15, 15]
    assert len(np.unique(np.concatenate(splits))) == 100


def test_bucketed_loader(tmp_path):
    packed = _random_packed(50, seed=3)
    path = str(tmp_path / "b.h5")
    write_packed_h5(path, packed)
    ds = CrystalDataset([path])
    loader = BucketedLoader(ds, np.arange(50), node_budget=64, buckets=(8, 16), seed=0)

    seen = 0
    for batch in loader:
        B, A = batch.atom_types.shape
        assert A in (8, 16)
        assert B == loader.batch_size_for(A)
        assert (batch.num_atoms <= A).all()
        assert (batch.atom_mask.sum(1) == batch.num_atoms).all()
        seen += B
    assert seen >= 50  # final chunks are padded by repetition
    assert loader.num_batches() > 0


def test_synthetic_types_correlate_with_geometry():
    """The D3PM channel needs learnable signal: synthetic atom types must be a
    deterministic function of the fractional z coordinate."""
    from arreau_tpu.data.synthetic import synthetic_packed, synthetic_z_table

    ds = synthetic_packed(50, seed=0)
    num_real = len(ds.z_table) - 1
    frac_z = ds.packed.frac_coords[:, 2]
    expect = np.minimum((frac_z * num_real).astype(np.int64), num_real - 1)
    np.testing.assert_array_equal(ds.type_indices, expect)
