"""The real-Alexandria seam, end to end without real data: a faithful
``*.json.bz2`` fixture (bz2 framing, multiple pymatgen
``ComputedStructureEntry`` dicts with the full as_dict schema — @module/@class
envelopes, oxidation-state species, site properties/labels, energy/correction
metadata, a diverse species zoo) -> ``data/prep.py`` (multi-process
``prep_all`` incl. the take-N dev subset) -> packed HDF5 shards ->
``CrystalDataset`` -> one training epoch -> checkpoint.

Byte format oracle: /root/reference/diffusion/prep_datasets.py:38-80 reads
``json.load(bz2.open(...))["entries"]`` and consumes
``structure.lattice.matrix``, per-site ``species[0]`` and ``abc`` — exactly
the fields exercised here.
"""

import bz2
import json
import math
import os

import numpy as np
import pytest

from arreau_tpu.data.crystal import CrystalDataset, read_h5
from arreau_tpu.data.prep import parse_entries, prep_all

# species zoo: light/heavy, metals/non-metals, alkali/halogen/lanthanide
SPECIES_ZOO = [
    "H", "Li", "C", "N", "O", "F", "Na", "Al", "Si", "S", "Cl", "K", "Ti",
    "Fe", "Cu", "Ga", "Se", "Ag", "Cs", "La", "W", "Pb", "Bi",
]
Z_OF = {
    "H": 1, "Li": 3, "C": 6, "N": 7, "O": 8, "F": 9, "Na": 11, "Al": 13,
    "Si": 14, "S": 16, "Cl": 17, "K": 19, "Ti": 22, "Fe": 26, "Cu": 29,
    "Ga": 31, "Se": 34, "Ag": 47, "Cs": 55, "La": 57, "W": 74, "Pb": 82,
    "Bi": 83,
}


def _lattice_dict(rng):
    """pymatgen Lattice.as_dict(): matrix + derived params + pbc."""
    lengths = rng.uniform(3.0, 11.0, size=3)
    # monoclinic-ish: alpha=gamma=90, beta free (the Alexandria common case)
    alpha, gamma = 90.0, 90.0
    beta = rng.uniform(80.0, 120.0)
    a, b, c = lengths
    br = math.radians(beta)
    matrix = [
        [a, 0.0, 0.0],
        [0.0, b, 0.0],
        [c * math.cos(br), 0.0, c * math.sin(br)],
    ]
    vol = a * b * c * math.sin(br)
    return {
        "@module": "pymatgen.core.lattice",
        "@class": "Lattice",
        "matrix": matrix,
        "pbc": [True, True, True],
        "a": a, "b": b, "c": c,
        "alpha": alpha, "beta": beta, "gamma": gamma,
        "volume": vol,
    }


def _entry_dict(rng, entry_id):
    """Full ComputedStructureEntry.as_dict() schema with Alexandria-style
    metadata; oxidation states on some species; site properties/labels."""
    n_atoms = int(rng.integers(1, 17))
    lattice = _lattice_dict(rng)
    matrix = np.asarray(lattice["matrix"])
    symbols = [SPECIES_ZOO[int(i)] for i in rng.integers(0, len(SPECIES_ZOO), n_atoms)]
    sites = []
    comp = {}
    for i, sym in enumerate(symbols):
        abc = rng.uniform(0.0, 1.0, size=3)
        xyz = abc @ matrix
        species = {"element": sym, "occu": 1}
        if i % 2 == 0:  # pymatgen Species carry oxidation_state when decorated
            species["oxidation_state"] = float(rng.integers(-2, 4))
        sites.append({
            "species": [species],
            "abc": abc.tolist(),
            "xyz": xyz.tolist(),
            "properties": {"magmom": float(rng.normal()), "charge": 0.0},
            "label": sym,
        })
        comp[sym] = comp.get(sym, 0.0) + 1.0
    return {
        "@module": "pymatgen.entries.computed_entries",
        "@class": "ComputedStructureEntry",
        "energy": float(rng.normal() * 10 - 50),
        "composition": comp,
        "entry_id": entry_id,
        "correction": 0.0,
        "energy_adjustments": [],
        "parameters": {"run_type": "GGA", "is_hubbard": False},
        "data": {"mat_id": entry_id, "decomposition_energy": float(rng.normal())},
        "structure": {
            "@module": "pymatgen.core.structure",
            "@class": "Structure",
            "charge": 0,
            "lattice": lattice,
            "properties": {},
            "sites": sites,
        },
    }


def make_alexandria_bz2(dirpath, shard_sizes=(8, 4), seed=0):
    """Write alexandria_ps_00{i}.json.bz2 shards with the reference framing
    ({"entries": [...]} under bz2 text mode). Returns the raw entry dicts."""
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    all_entries = []
    for i, n in enumerate(shard_sizes):
        entries = [_entry_dict(rng, f"agm{i:03d}{j:04d}") for j in range(n)]
        with bz2.open(
            os.path.join(dirpath, f"alexandria_ps_00{i}.json.bz2"),
            "wt", encoding="utf-8",
        ) as fh:
            json.dump({"entries": entries}, fh)
        all_entries.append(entries)
    return all_entries


def test_prep_all_from_bz2_shards(tmp_path):
    """bz2 shards -> prep_all (per-shard processes + take-N dev subset) ->
    packed HDF5 -> CrystalDataset, with exact fp64 value parity."""
    in_dir, out_dir = str(tmp_path / "alexandria"), str(tmp_path / "alexandria_hdf5")
    shards = make_alexandria_bz2(in_dir)

    prep_all(in_dir, out_dir, num_shards=5, dev_take=3)

    assert os.path.exists(os.path.join(out_dir, "alexandria_ps_000.h5"))
    assert os.path.exists(os.path.join(out_dir, "alexandria_ps_001.h5"))
    dev = read_h5(os.path.join(out_dir, "alexandria_ps_000_take3.h5"))
    assert len(dev) == 3

    back = read_h5(os.path.join(out_dir, "alexandria_ps_000.h5"))
    assert len(back) == len(shards[0])
    for j, entry in enumerate(shards[0]):
        s, e = back.offsets[j], back.offsets[j + 1]
        sites = entry["structure"]["sites"]
        np.testing.assert_array_equal(
            back.atomic_numbers[s:e],
            [Z_OF[site["species"][0]["element"]] for site in sites],
        )
        np.testing.assert_allclose(
            back.frac_coords[s:e], [site["abc"] for site in sites], rtol=0, atol=0
        )
        np.testing.assert_allclose(
            back.lattices[j], entry["structure"]["lattice"]["matrix"], rtol=0, atol=0
        )

    # CrystalDataset over both shards: z-table covers the observed zoo + MASK
    ds = CrystalDataset([
        os.path.join(out_dir, "alexandria_ps_000.h5"),
        os.path.join(out_dir, "alexandria_ps_001.h5"),
    ])
    assert len(ds) == sum(len(s) for s in shards)
    observed = {
        Z_OF[site["species"][0]["element"]]
        for shard in shards for entry in shard
        for site in entry["structure"]["sites"]
    }
    assert set(ds.z_table.zs) == observed | {2001}


def test_parse_entries_handles_oxidation_and_take():
    rng = np.random.default_rng(1)
    entries = [_entry_dict(rng, f"e{i}") for i in range(4)]
    packed = parse_entries({"entries": entries}, take=2)
    assert len(packed) == 2
    n0 = len(entries[0]["structure"]["sites"])
    assert packed.offsets[1] == n0


@pytest.mark.slow
def test_bz2_to_training_epoch_to_checkpoint(tmp_path):
    """The full seam: bz2 fixture -> prep_all -> HDF5 -> one training epoch
    on the alexandria path of the train CLI -> checkpoint on disk."""
    from arreau_tpu.cli.train_diffusion import main
    from arreau_tpu.train.checkpoint import CheckpointManager

    in_dir, out_dir = str(tmp_path / "alexandria"), str(tmp_path / "alexandria_hdf5")
    make_alexandria_bz2(in_dir, shard_sizes=(10, 6), seed=2)
    prep_all(in_dir, out_dir, num_shards=5, dev_take=3)

    ckpt_dir = str(tmp_path / "ckpt")
    loss = main([
        "--dataset", "alexandria", "--data_dir", out_dir,
        "--epochs", "1", "--val_interval", "1",
        "--batch_size", "4", "--hidden_dim", "8", "--basis_dim", "8",
        "--layers", "1", "--num_ori", "4", "--num_timesteps", "20",
        "--max_neighbors", "4", "--degree", "2",
        "--checkpoint_dir", ckpt_dir,
    ])
    assert np.isfinite(loss)
    ckpt = CheckpointManager(ckpt_dir)
    assert ckpt.has("last")
    meta = ckpt.load_meta()
    assert 2001 in meta["z_table_zs"]
