"""Crystal generation CLI.

Capability parity with the reference
(/root/reference/main_diffusion_generate.py:24-115): load a self-describing
checkpoint, run the reverse sampler in batches (default 10 crystals/batch, 4
atoms each), optionally pin atom types from element symbols, save
``crystals.h5`` and optionally render PNGs / a GIF of the last batch.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Generate crystals from a trained model")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--tag", type=str, default="last", help="checkpoint tag (last/best)")
    p.add_argument("--num_crystals", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--num_atoms_per_sample", type=int, default=4)
    p.add_argument("--use_ema", type=parse_bool, default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="out")
    p.add_argument("--visualize", type=parse_bool, default=False)
    p.add_argument("--show_bonds", type=parse_bool, default=False)
    p.add_argument("--gif", type=parse_bool, default=False,
                   help="render the sampling trajectory of the last batch as a GIF")
    p.add_argument("--snapshot_every", type=int, default=10)
    p.add_argument("--type_temperature", type=float, default=1.0,
                   help="gumbel scale for D3PM type draws (1.0 = reference "
                        "semantics, 0.0 = posterior argmax)")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="strided (fewer-step) sampling: run only S reverse "
                        "steps with DDIM-family t->s updates on all three "
                        "chains (cost scales S/T). Default None = the full "
                        "T-step reference chain")
    p.add_argument("--ddim_eta", type=float, default=0.0,
                   help="strided-mode stochasticity: 0 = deterministic DDIM, "
                        "1 = ancestral posterior noise (only with "
                        "--sample_steps)")
    p.add_argument(
        "--constant_atomic_symbols",
        type=str,
        default=None,
        help="comma-separated element symbols to pin atom types (e.g. 'C,C,C,C')",
    )
    p.add_argument(
        "--data_parallel", type=parse_bool, default=True,
        help="shard each sampling batch over all visible devices (crystals "
        "are independent, so the reverse chain is embarrassingly data-"
        "parallel; requires batch_size divisible by the device count — "
        "otherwise falls back to one device with a notice)",
    )
    p.add_argument(
        "--clip_denoised", type=parse_bool, default=True,
        help="clamp the sampler's lattice-length x0-prediction to the training "
        "envelope stored in the checkpoint (standard DDPM clip_denoised; "
        "False = strict reference semantics)",
    )
    p.add_argument(
        "--quality_ref",
        type=str,
        default=None,
        help="training-data reference for the sample-quality report: a packed "
        "HDF5 path, or 'synthetic[:size[:seed]]' to regenerate the synthetic "
        "training distribution. Writes <out_dir>/quality.json.",
    )
    p.add_argument(
        "--num_atoms_dist", choices=["fixed", "ref"], default="fixed",
        help="per-crystal atom counts: 'fixed' = every crystal gets "
        "num_atoms_per_sample atoms (reference semantics — it fixes one "
        "count per run, main_diffusion_generate.py:57); 'ref' = sample "
        "counts from the --quality_ref training histogram (capped at "
        "num_atoms_per_sample, which becomes the pad size) so quality "
        "metrics compare at a matched size distribution",
    )
    return p.parse_args(argv)


def _ref_num_atoms(quality_ref: str):
    """Per-crystal atom counts of the quality reference (for --num_atoms_dist
    ref)."""
    import numpy as np

    if quality_ref.startswith("synthetic"):
        from arreau_tpu.data.synthetic import synthetic_packed

        parts = quality_ref.split(":")
        size = int(parts[1]) if len(parts) > 1 else 2000
        seed = int(parts[2]) if len(parts) > 2 else 0
        ds = synthetic_packed(size, seed=seed)
    else:
        from arreau_tpu.data.crystal import CrystalDataset

        ds = CrystalDataset([quality_ref])
    return np.asarray(ds.packed.num_atoms)


def quality_from_results(result, z_table, quality_ref: str) -> dict:
    """Compute the sample-quality report against a training reference."""
    from arreau_tpu.inference.quality import dataset_reference_stats, quality_report

    if quality_ref.startswith("synthetic"):
        from arreau_tpu.data.synthetic import synthetic_packed

        parts = quality_ref.split(":")
        size = int(parts[1]) if len(parts) > 1 else 2000
        seed = int(parts[2]) if len(parts) > 2 else 0
        ds = synthetic_packed(size, seed=seed)
    else:
        from arreau_tpu.data.crystal import CrystalDataset

        ds = CrystalDataset([quality_ref])
    ref = dataset_reference_stats(ds.packed, ds.type_indices, len(ds.z_table))
    gen_type_idx = z_table.zs_to_indices(result.atomic_numbers)
    return quality_report(
        gen_frac=result.frac_x,
        gen_types=gen_type_idx,
        gen_lattices=result.lattice,
        gen_idx_start=result.idx_start,
        gen_num_atoms=result.num_atoms,
        ref_lengths=ref["lengths"],
        ref_angles=ref["angles"],
        num_types=len(z_table),
        ref_type_mi=ref["type_mi"],
        ref_coord_hist=ref["coord_hist"],
        ref_mean_num_atoms=ref["mean_num_atoms"],
        ref_fingerprints=ref["fingerprints"],
    ) | {"ref_min_dist_violation_rate": ref["min_dist_violation_rate"]}


def load_model(checkpoint_dir: str, tag: str, use_ema: bool, return_meta: bool = False):
    """Rebuild model + params from a self-describing checkpoint."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.atoms import AtomicNumberTable
    from arreau_tpu.tasks.diffusion import DiffusionConfig, DiffusionModel
    from arreau_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(checkpoint_dir)
    meta = ckpt.load_meta()
    cfg = DiffusionConfig(**meta["config"])
    z_table = AtomicNumberTable(meta["z_table_zs"])
    model = DiffusionModel(cfg)
    if meta.get("fourier_w") is not None:
        # imported reference checkpoints carry their own fixed Fourier
        # frequencies (interop/torch_import.py) — use them so the time
        # embedding matches the training run exactly
        model.fourier_w = jnp.asarray(meta["fourier_w"], model.dtype)

    raw = ckpt.restore_raw(tag)
    if isinstance(raw, (list, tuple)):  # TrainState tuple order
        _step, params_tree, _opt, ema_tree = raw[0], raw[1], raw[2], raw[3]
    else:
        params_tree, ema_tree = raw["params"], raw.get("ema_params")
    params = ema_tree if (use_ema and ema_tree is not None) else params_tree
    params = jax.tree.map(jnp.asarray, params)
    if return_meta:
        return model, params, z_table, meta
    return model, params, z_table


def length_bounds_from_meta(meta: dict):
    """Training-envelope clamp for the lattice-length x0-prediction, widened
    by half the data range on each side so only off-manifold runaway is cut."""
    stats = meta.get("length_stats")
    if not stats:
        return None
    lo, hi = stats["min"], stats["max"]
    margin = 0.5 * max(hi - lo, 1.0)
    return (lo - margin, hi + margin)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from arreau_tpu.inference.io import concat_results, from_dense_batch, save_sample_results

    model, params, z_table, meta = load_model(
        args.checkpoint_dir, args.tag, args.use_ema, return_meta=True
    )
    length_bounds = length_bounds_from_meta(meta) if args.clip_denoised else None
    if args.clip_denoised and length_bounds is None:
        print("checkpoint has no length_stats; clip_denoised disabled")

    constant_atoms = None
    if args.constant_atomic_symbols:
        symbols = args.constant_atomic_symbols.split(",")
        idx = z_table.symbols_to_indices(symbols)
        import jax.numpy as jnp

        constant_atoms = jnp.broadcast_to(
            jnp.asarray(idx), (args.batch_size, len(symbols))
        )
        args.num_atoms_per_sample = len(symbols)

    key = jax.random.PRNGKey(args.seed)

    # The strided path only engages below T-1 (sample() falls back to the
    # dense chain otherwise) — mirror that condition so gif handling and the
    # throughput line describe the chain that actually ran.
    strided = (
        args.sample_steps is not None
        and args.sample_steps < model.config.num_timesteps - 1
    )
    if args.gif and strided:
        print("gif snapshots are not supported with --sample_steps; disabling gif")
        args.gif = False

    # size-matched generation: per-crystal atom counts drawn from the
    # training histogram (capped at the pad size) — default 'fixed' keeps
    # reference semantics (one count per run)
    draw_counts = None
    if args.num_atoms_dist == "ref":
        if not args.quality_ref:
            raise SystemExit("--num_atoms_dist ref requires --quality_ref")
        import numpy as _np

        ref_counts = _np.minimum(
            _ref_num_atoms(args.quality_ref), args.num_atoms_per_sample
        )
        _rng_counts = _np.random.default_rng(args.seed + 1)

        def draw_counts():
            import jax.numpy as jnp

            return jnp.asarray(
                _rng_counts.choice(ref_counts, size=args.batch_size), jnp.int32
            )

    def _sample(p, k, na=None):
        return model.sample(
            p,
            k,
            num_samples=args.batch_size,
            num_atoms_per_sample=args.num_atoms_per_sample,
            num_atoms=na,
            constant_atoms=constant_atoms,
            length_bounds=length_bounds,
            type_temperature=args.type_temperature,
            sample_steps=args.sample_steps,
            ddim_eta=args.ddim_eta,
        )

    # Data-parallel sampling: crystals are independent, so sharding the batch
    # axis over a 1-D device mesh scales generation linearly with no model
    # changes — GSPMD partitions the whole reverse chain (incl. the threefry
    # draws, which are counter-based per-element and therefore bitwise
    # identical to the single-device chain). Reference analog: none — the
    # reference samples on one GPU (main_diffusion_generate.py:57).
    n_dev = jax.device_count()
    if args.data_parallel and n_dev > 1:
        if args.batch_size % n_dev:
            print(
                f"batch_size {args.batch_size} not divisible by {n_dev} devices; "
                "sampling on one device (pad batch_size to enable DP)"
            )
            sample_jit = jax.jit(_sample)
        else:
            from arreau_tpu.parallel.mesh import (
                batch_sharding,
                kernel_partitioning,
                make_mesh,
                replicated_sharding,
            )

            mesh = make_mesh()
            params = jax.device_put(params, replicated_sharding(mesh))
            _sample_sharded = jax.jit(_sample, out_shardings=batch_sharding(mesh))

            def sample_jit(p, k, na=None):
                # bind the Pallas kernel-partitioning context so the conv
                # kernels shard_map over the mesh instead of hitting GSPMD
                # as opaque custom calls (parallel.mesh.kernel_partitioning)
                with kernel_partitioning(mesh):
                    return _sample_sharded(p, k, na)

            print(f"data-parallel sampling over {n_dev} devices")
    else:
        sample_jit = jax.jit(_sample)
    results = []
    snapshots = None
    remaining = args.num_crystals
    t_gen0 = None  # throughput timer starts after the first (compiling) batch
    n_timed = 0
    import time as _time
    while remaining > 0:
        key, sub = jax.random.split(key)
        na = draw_counts() if draw_counts is not None else None
        if args.gif and remaining <= args.batch_size:
            # last batch: segmented sampling with snapshots for the GIF
            batch_out, snapshots = model.sample(
                params,
                sub,
                num_samples=args.batch_size,
                num_atoms_per_sample=args.num_atoms_per_sample,
                num_atoms=na,
                constant_atoms=constant_atoms,
                snapshot_every=args.snapshot_every,
                length_bounds=length_bounds,
                type_temperature=args.type_temperature,
            )
        else:
            batch_out = sample_jit(params, sub, na)
        take = min(args.batch_size, remaining)
        trimmed = jax.tree.map(lambda x: x[:take], batch_out)
        results.append(from_dense_batch(trimmed, z_table))
        remaining -= take
        if t_gen0 is None:
            t_gen0 = _time.perf_counter()  # first batch paid for compile
        else:
            n_timed += take
        print(f"generated {args.num_crystals - remaining}/{args.num_crystals}")
    if n_timed > 0:
        dt = _time.perf_counter() - t_gen0
        n_steps = args.sample_steps if strided else model.config.num_timesteps
        print(f"sampler throughput: {n_timed / dt * 60:.0f} crystals/min "
              f"({n_steps} reverse steps, warm jit)")

    if snapshots:
        from arreau_tpu.inference.visualize import generate_gif, vis_crystal_during_sampling

        snap_dir = os.path.join(args.out_dir, "sampling_steps")
        for timestep, snap in snapshots:
            vis_crystal_during_sampling(
                z_table,
                np.asarray(snap.atom_types[0]),
                np.asarray(snap.lattice[0]),
                np.asarray(snap.frac_x[0]),
                os.path.join(snap_dir, f"step_{timestep}"),
                args.show_bonds,
            )
        generate_gif(snap_dir, os.path.join(args.out_dir, "sampling.gif"), prefix="step")
        print(f"wrote {args.out_dir}/sampling.gif")

    result = concat_results(results)
    out_path = os.path.join(args.out_dir, "crystals.h5")
    save_sample_results(out_path, result)
    print(f"saved {result.num_crystals} crystals to {out_path}")

    if args.quality_ref:
        import json

        report = quality_from_results(result, z_table, args.quality_ref)
        print("sample quality vs training data:")
        for k, v in report.items():
            print(f"  {k}: {v:.4f}")
        qpath = os.path.join(args.out_dir, "quality.json")
        with open(qpath, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {qpath}")

    if args.visualize:
        from arreau_tpu.inference.visualize import plot_crystal

        for i in range(min(result.num_crystals, 4)):
            frac, zs, lat = result.crystal(i)
            plot_crystal(
                frac, zs, lat,
                os.path.join(args.out_dir, f"crystal_{i}.png"),
                show_bonds=args.show_bonds,
            )
        print(f"rendered PNGs under {args.out_dir}")
    return result


if __name__ == "__main__":
    main()
