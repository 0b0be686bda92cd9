"""Lattice EDA viewer: length/angle/volume/density distributions of a
crystal dataset plus rendered example cells.

Covers the reference's lattice-EDA one-offs (exploration/eda_lattice*.py,
visualize_lattices.py — the scripts whose outputs calibrated the diffusion
constants) as one maintained tool.

Usage: python -m arreau_tpu.exploration.lattice_eda [--dataset alexandria]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="datasets/alexandria_hdf5")
    p.add_argument("--out_dir", default="out/eda")
    p.add_argument("--num_render", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.dataset == "synthetic":
        from arreau_tpu.data.synthetic import synthetic_packed

        packed = synthetic_packed(2000, seed=args.seed).packed
    else:
        import glob

        from arreau_tpu.data.crystal import CrystalDataset

        paths = sorted(glob.glob(os.path.join(args.data_dir, "alexandria_ps_0*.h5")))
        packed = CrystalDataset([p_ for p_ in paths if "take" not in p_]).packed

    import jax.numpy as jnp

    from arreau_tpu.ops.lattice import matrix_to_params

    lat = np.asarray(packed.lattices)
    lengths, angles = (np.asarray(a) for a in matrix_to_params(jnp.asarray(lat)))
    vols = np.abs(np.linalg.det(lat))
    natoms = np.diff(packed.offsets)
    density = natoms / vols

    def stats(name, x):
        q = np.percentile(x, [1, 50, 99])
        print(f"{name:<10s} mean {x.mean():8.3f}  std {x.std():7.3f}  "
              f"p1 {q[0]:8.3f}  median {q[1]:8.3f}  p99 {q[2]:8.3f}")

    print(f"{len(vols)} crystals, {natoms.sum()} atoms "
          f"(atoms/crystal {natoms.mean():.1f}, max {natoms.max()})")
    stats("length_a", lengths[:, 0])
    stats("length_b", lengths[:, 1])
    stats("length_c", lengths[:, 2])
    stats("alpha", angles[:, 0])
    stats("beta", angles[:, 1])
    stats("gamma", angles[:, 2])
    stats("volume", vols)
    stats("density", density)  # atoms / A^3; reference avg 0.0554 on Alexandria

    os.makedirs(args.out_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(10, 7))
        axes[0, 0].hist(lengths.ravel(), bins=60)
        axes[0, 0].set_title("lattice lengths (A)")
        axes[0, 1].hist(angles.ravel(), bins=60)
        axes[0, 1].set_title("lattice angles (deg)")
        axes[1, 0].hist(natoms, bins=np.arange(natoms.min(), natoms.max() + 2))
        axes[1, 0].set_title("atoms per crystal")
        axes[1, 1].hist(density, bins=60)
        axes[1, 1].set_title("density (atoms/A^3)")
        fig.tight_layout()
        out = os.path.join(args.out_dir, "lattice_eda.png")
        fig.savefig(out, dpi=110)
        print(f"wrote {out}")

        from arreau_tpu.inference.visualize import plot_lattice

        rng = np.random.default_rng(args.seed)
        for i, j in enumerate(rng.choice(len(lat), size=min(args.num_render, len(lat)),
                                         replace=False)):
            plot_lattice(lat[j], os.path.join(args.out_dir, f"example_cell_{i}.png"))
        print(f"rendered {args.num_render} example cells under {args.out_dir}")
    except Exception as e:
        print(f"plots skipped: {e}")


if __name__ == "__main__":
    main()
