"""Export a trained sampler as a self-contained StableHLO serving artifact.

Usage::

    arreau-export --checkpoint_dir checkpoints --out out/sampler.stablehlo \
        --batch_size 100 --num_atoms_per_sample 8 --sample_steps 100

Serving (only jax required)::

    from jax import export
    exp = export.deserialize(bytearray(open("sampler.stablehlo", "rb").read()))
    frac, types, lattice = exp.call(7)   # seed

See :mod:`arreau_tpu.inference.export`.
"""

from __future__ import annotations

import argparse

from arreau_tpu.cli.common import parse_bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export the sampler to StableHLO")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--tag", type=str, default="best")
    p.add_argument("--use_ema", type=parse_bool, default=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_atoms_per_sample", type=int, default=8)
    p.add_argument("--sample_steps", type=int, default=100,
                   help="strided (DDIM-family) reverse steps (default 100 — the "
                        "measured-quality serving point, BASELINE.md round-4 "
                        "ladder: better W1/min-dist than the full chain at 6.4x "
                        "its throughput); pass 0 for the full T-step chain")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--type_temperature", type=float, default=1.0)
    p.add_argument("--variable_num_atoms", type=parse_bool, default=False,
                   help="export the size-matched serving variant: the "
                        "artifact takes num_atoms int32[B] per call "
                        "(counts <= num_atoms_per_sample = pad size)")
    p.add_argument("--out", type=str, required=True, help="output artifact path")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.inference.export import export_sampler

    sidecar = export_sampler(
        args.checkpoint_dir,
        args.out,
        tag=args.tag,
        use_ema=args.use_ema,
        batch_size=args.batch_size,
        num_atoms_per_sample=args.num_atoms_per_sample,
        sample_steps=args.sample_steps or None,  # 0 -> full chain
        ddim_eta=args.ddim_eta,
        type_temperature=args.type_temperature,
        variable_num_atoms=args.variable_num_atoms,
    )
    chain = (
        f"strided S={args.sample_steps} (DDIM eta={args.ddim_eta})"
        if args.sample_steps
        else "full ancestral chain"
    )
    print(
        f"exported {args.checkpoint_dir}/{args.tag} -> {args.out} "
        f"({sidecar['bytes'] / 1e6:.2f} MB, platforms {sidecar['platforms']}, "
        f"{sidecar['batch_size']}x{sidecar['num_atoms_per_sample']} crystals/call, "
        f"serving point: {chain})"
    )


if __name__ == "__main__":
    main()
