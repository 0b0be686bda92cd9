"""Post-processing CLI for generated crystals: load, relax, re-save,
visualize.

Capability parity with /root/reference/main_diffusion_process_results.py:20-50
(which runs MACE/ASE BFGS per crystal): loads ``crystals.h5``, relaxes ALL
crystals at once with the built-in TPU soft-sphere relaxation (MACE path
gated; see arreau_tpu/inference/relax.py), saves ``crystals_relaxed.h5`` and
optional renders.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Relax and visualize generated crystals")
    p.add_argument("--in_path", type=str, default="out/crystals.h5")
    p.add_argument("--out_path", type=str, default=None)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--sigma", type=float, default=1.5)
    p.add_argument("--visualize", type=parse_bool, default=False)
    p.add_argument("--use_mace", type=parse_bool, default=False)
    p.add_argument("--mace_model", type=str, default=None,
                   help="local MACE .model path (None = downloadable MACE-MP "
                        "foundation model); only with --use_mace")
    p.add_argument("--fmax", type=float, default=0.05,
                   help="BFGS force convergence (eV/A); only with --use_mace")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from arreau_tpu.inference.io import SampleResult, load_sample_results, save_sample_results
    from arreau_tpu.inference.relax import relax_soft_sphere, relax_with_mace

    result = load_sample_results(args.in_path)
    B = result.num_crystals
    A = int(result.num_atoms.max())

    # densify
    frac = np.zeros((B, A, 3))
    mask = np.zeros((B, A), bool)
    for i in range(B):
        f, _, _ = result.crystal(i)
        frac[i, : len(f)] = f
        mask[i, : len(f)] = True

    if args.use_mace:
        # reference-parity MACE-MP + ASE BFGS path (import-gated: raises
        # with install instructions when mace/ase are absent)
        out, energies = relax_with_mace(
            result, model_path=args.mace_model, fmax=args.fmax,
            max_steps=args.steps,
        )
        print(
            f"MACE-relaxed {B} crystals: mean final energy {energies.mean():.4f} eV"
        )
        out_path = args.out_path or args.in_path.replace(".h5", "_relaxed.h5")
        save_sample_results(out_path, out)
        print(f"saved {out_path}")
        return out

    relaxed = relax_soft_sphere(
        jnp.asarray(frac, jnp.float32),
        jnp.asarray(result.lattice, jnp.float32),
        jnp.asarray(mask),
        steps=args.steps,
        lr=args.lr,
        sigma=args.sigma,
    )
    e0 = np.asarray(relaxed.energy_history[:, 0])
    e1 = np.asarray(relaxed.energy)
    print(f"relaxed {B} crystals: mean energy {e0.mean():.4f} -> {e1.mean():.4f}")

    frac_out = np.asarray(relaxed.frac_x, np.float64)
    flat = np.concatenate([frac_out[i][mask[i]] for i in range(B)])
    out = SampleResult(
        frac_x=flat,
        atomic_numbers=result.atomic_numbers,
        lattice=result.lattice,
        idx_start=result.idx_start,
        num_atoms=result.num_atoms,
    )
    out_path = args.out_path or args.in_path.replace(".h5", "_relaxed.h5")
    save_sample_results(out_path, out)
    print(f"saved {out_path}")

    if args.visualize:
        from arreau_tpu.inference.visualize import plot_crystal

        out_dir = os.path.dirname(os.path.abspath(out_path))
        for i in range(min(B, 4)):
            f, zs, lat = out.crystal(i)
            plot_crystal(f, zs, lat, os.path.join(out_dir, f"relaxed_{i}.png"))
    return out


if __name__ == "__main__":
    main()
