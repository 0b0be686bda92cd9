"""Convert a reference (PyTorch Lightning) PONITA_DIFFUSION ``.ckpt`` into an
arreau_tpu checkpoint directory that ``arreau-generate`` consumes directly.

Usage::

    arreau-import-checkpoint --ckpt path/to/epoch=...-step=....ckpt \
        --out_dir checkpoints-imported
    arreau-generate --checkpoint_dir checkpoints-imported --tag best ...

See :mod:`arreau_tpu.interop.torch_import` for the parameter mapping and the
documented approximations (tanh vs erf GELU, orientation-grid resampling —
the latter is inherent to the reference, which regenerates its random S² grid
every process).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Import a reference PONITA_DIFFUSION .ckpt")
    p.add_argument("--ckpt", type=str, required=True, help="reference Lightning .ckpt path")
    p.add_argument("--out_dir", type=str, required=True, help="output checkpoint directory")
    p.add_argument("--tag", type=str, default="best", help="tag to save under (default: best)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover - torch is present in CI
        raise SystemExit(
            "importing reference checkpoints requires torch (CPU build is "
            "enough): pip install torch --index-url "
            "https://download.pytorch.org/whl/cpu"
        ) from e

    from arreau_tpu.interop.torch_import import convert_reference_checkpoint

    meta = convert_reference_checkpoint(args.ckpt, args.out_dir, tag=args.tag)
    cfg = meta["config"]
    print(
        f"imported {args.ckpt} -> {args.out_dir}/{args.tag} "
        f"(hidden {cfg['hidden_dim']}, basis {cfg['basis_dim']}, "
        f"{cfg['num_layers']} layers, {cfg['num_ori']} orientations, "
        f"{cfg['num_atomic_states']} atomic states)"
    )
    print(f"generate with: arreau-generate --checkpoint_dir {args.out_dir} --tag {args.tag}")


if __name__ == "__main__":
    main()
