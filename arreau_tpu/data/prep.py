"""Dataset prep: Alexandria ``*.json.bz2`` -> packed HDF5 shards.

Capability parity with the reference pipeline
(/root/reference/diffusion/prep_datasets.py:38-106) without the pymatgen
dependency: the pymatgen ``ComputedStructureEntry`` dict schema is parsed
directly (``structure.lattice.matrix``, ``structure.sites[*].species[0]
.element``, ``structure.sites[*].abc``). Output is the packed columnar
layout (see data/crystal.py) instead of dataset-per-crystal; one process per
shard, plus a take-N dev subset.
"""

from __future__ import annotations

import bz2
import json
import os
from multiprocessing import Process
from typing import Optional

import numpy as np

from arreau_tpu.data.atoms import symbol_to_z
from arreau_tpu.data.crystal import PackedCrystals, write_packed_h5


def parse_entries(data: dict, take: Optional[int] = None) -> PackedCrystals:
    entries = data["entries"]
    if take is not None:
        entries = entries[:take]

    zs_list, frac_list, lattices = [], [], []
    for entry in entries:
        structure = entry["structure"]
        lattices.append(np.asarray(structure["lattice"]["matrix"], np.float64))
        sites = structure["sites"]
        zs = np.empty(len(sites), np.int64)
        frac = np.empty((len(sites), 3), np.float64)
        for i, site in enumerate(sites):
            zs[i] = symbol_to_z(site["species"][0]["element"])
            frac[i] = site["abc"]
        zs_list.append(zs)
        frac_list.append(frac)

    counts = np.array([len(z) for z in zs_list], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return PackedCrystals(
        atomic_numbers=np.concatenate(zs_list) if zs_list else np.zeros(0, np.int64),
        frac_coords=np.concatenate(frac_list) if frac_list else np.zeros((0, 3)),
        offsets=offsets,
        lattices=np.stack(lattices) if lattices else np.zeros((0, 3, 3)),
    )


def prep_shard(in_path: str, out_path: str, take: Optional[int] = None) -> None:
    with bz2.open(in_path, "rt", encoding="utf-8") as fh:
        data = json.load(fh)
    packed = parse_entries(data, take)
    write_packed_h5(out_path, packed)
    print(f"wrote {out_path}: {len(packed)} crystals, {len(packed.atomic_numbers)} atoms")


def prep_all(in_dir: str, out_dir: str, num_shards: int = 5, dev_take: int = 10) -> None:
    """One process per shard (mirrors the reference's per-shard Process fan-out)."""
    os.makedirs(out_dir, exist_ok=True)
    first = os.path.join(in_dir, "alexandria_ps_000.json.bz2")
    if os.path.exists(first):
        prep_shard(first, os.path.join(out_dir, f"alexandria_ps_000_take{dev_take}.h5"), take=dev_take)

    procs = []
    for i in range(num_shards):
        name = f"alexandria_ps_00{i}"
        in_path = os.path.join(in_dir, f"{name}.json.bz2")
        if not os.path.exists(in_path):
            continue
        p = Process(target=prep_shard, args=(in_path, os.path.join(out_dir, f"{name}.h5")))
        p.start()
        procs.append(p)
    for p in procs:
        p.join()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", default="datasets/alexandria")
    ap.add_argument("--out_dir", default="datasets/alexandria_hdf5")
    ap.add_argument("--num_shards", type=int, default=5)
    args = ap.parse_args()
    prep_all(args.in_dir, args.out_dir, args.num_shards)
