"""Crystal viewers: render dataset samples or generated crystals to PNGs.

One maintained tool covering the reference's two viewer one-offs
(exploration/view_alexandria_dataset.py:13-38 — first-N dataset samples
rendered to out/alexandria_vis/ — and exploration/view_generated_crystal.py:11-21
— a single crystal out of a generated ``crystals.h5``). Matplotlib stands in
for plotly (absent from this image); ``--show_bonds`` uses the CrystalNN-style
Voronoi bond predictor.

Usage:
  python -m arreau_tpu.exploration.view_crystals dataset \
      [--data_dir datasets/alexandria_hdf5] [--num 50] [--out_dir out/alexandria_vis]
  python -m arreau_tpu.exploration.view_crystals generated \
      [--crystal_file out/crystals.h5] [--index 0] [--shift 0.3 0.6 0.2]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def view_dataset(args) -> int:
    from arreau_tpu.inference.visualize import plot_crystal

    if args.dataset == "synthetic":
        from arreau_tpu.data.synthetic import synthetic_packed

        packed = synthetic_packed(max(args.num, 64), seed=args.seed).packed
    else:
        paths = sorted(glob.glob(os.path.join(args.data_dir, "*.h5")))
        if not paths:
            raise SystemExit(f"no HDF5 shards under {args.data_dir}")
        from arreau_tpu.data.crystal import CrystalDataset

        packed = CrystalDataset(paths[: args.max_shards]).packed

    n = min(args.num, len(packed))
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(n):
        s, e = int(packed.offsets[i]), int(packed.offsets[i + 1])
        plot_crystal(
            packed.frac_coords[s:e],
            packed.atomic_numbers[s:e],
            packed.lattices[i],
            os.path.join(args.out_dir, f"{i}.png"),
            show_bonds=args.show_bonds,
            title=f"sample {i} ({e - s} atoms)",
        )
        print(f"sample {i} -> {args.out_dir}/{i}.png")
    return n


def view_generated(args) -> int:
    from arreau_tpu.inference.io import load_sample_results
    from arreau_tpu.inference.visualize import plot_crystal

    result = load_sample_results(args.crystal_file)
    indices = args.index if args.index else [0]
    os.makedirs(args.out_dir, exist_ok=True)
    for i in indices:
        frac_x, zs, lattice = result.crystal(i)
        # optional recentring shift (reference keeps it commented; a knob here)
        frac_x = (frac_x + np.asarray(args.shift)) % 1.0
        out = os.path.join(args.out_dir, f"generated_{i}.png")
        plot_crystal(frac_x, zs, lattice, out, show_bonds=args.show_bonds,
                     title=f"generated {i} ({len(zs)} atoms)")
        print(f"crystal {i}/{result.num_crystals} -> {out}")
    return len(indices)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    d = sub.add_parser("dataset", help="render the first N dataset samples")
    d.add_argument("--dataset", default="alexandria",
                   choices=["alexandria", "synthetic"])
    d.add_argument("--data_dir", default="datasets/alexandria_hdf5")
    d.add_argument("--max_shards", type=int, default=1)
    d.add_argument("--num", type=int, default=50)
    d.add_argument("--out_dir", default="out/alexandria_vis")
    d.add_argument("--show_bonds", action="store_true")
    d.add_argument("--seed", type=int, default=0)
    d.set_defaults(fn=view_dataset)

    g = sub.add_parser("generated", help="render crystals from a sampler HDF5")
    g.add_argument("--crystal_file", default="out/crystals.h5")
    g.add_argument("--index", type=int, nargs="*", default=[0])
    g.add_argument("--shift", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    g.add_argument("--out_dir", default="out/crystal_vis")
    g.add_argument("--show_bonds", action="store_true")
    g.set_defaults(fn=view_generated)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
