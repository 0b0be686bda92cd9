"""Crystal-diffusion training CLI.

Capability parity with the reference entry point
(/root/reference/main_diffusion.py:28-310): the same knob set (epochs,
warmup, batch_size, lr, weight_decay, val_interval, train_augm, dataset
selection incl. the dev subset and the eval-equivariance harness, model
shape flags, T, radius, max_neighbors, seed, profiler), 0.7/0.15/0.15 random
split, best/last checkpoints, epoch timing, optional wandb logging, and a
final test pass with the best checkpoint. Orchestration is a plain Python
loop around one jitted data-parallel train step (no Lightning).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool


def _parse_basis_bias(value: str):
    """Tri-state --basis_bias: True | False | in (quotes optional)."""
    v = value.strip().strip("'\"")
    if v in ("True", "true", "1"):
        return True
    if v in ("False", "false", "0"):
        return False
    if v == "in":
        return "in"
    raise argparse.ArgumentTypeError(
        f"--basis_bias must be True, False or in (got {value!r})"
    )


def _angle_str(m: dict) -> str:
    """Angle-loss component for the epoch printers (diffuse_angles mode)."""
    return f" angle {m['loss_angle']:.4f}" if "loss_angle" in m else ""


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the joint crystal diffusion model")
    # run parameters
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--warmup", type=int, default=10, help="warmup epochs")
    p.add_argument("--batch_size", type=int, default=100,
                   help="crystals per batch at the 16-atom bucket; other buckets scale to equal node budget")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-10)
    p.add_argument("--log", type=parse_bool, default=False, help="enable wandb logging")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel group size; devices form a "
                        "(data, model) mesh and the basis/ConvNext MLPs are "
                        "Megatron-split over the model axis")
    p.add_argument("--val_interval", type=int, default=5)
    p.add_argument("--max_steps", type=int, default=None, help="optional hard step cap (smoke runs)")
    # train settings
    p.add_argument("--train_augm", type=parse_bool, default=False,
                   help="random SO(3) rotation augmentation of the lattice")
    p.add_argument("--dataset", type=str, default="alexandria",
                   choices=["alexandria", "alexandria-dev", "eval-equivariance", "synthetic"])
    p.add_argument("--data_dir", type=str, default="datasets/alexandria_hdf5")
    # graph
    p.add_argument("--radius", type=float, default=5.0)
    p.add_argument("--max_neighbors", type=int, default=8)
    # model
    p.add_argument("--num_ori", type=int, default=16)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--basis_dim", type=int, default=256)
    p.add_argument("--degree", type=int, default=3)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--widening_factor", type=int, default=4)
    p.add_argument("--layer_scale", type=float, default=1e-6)
    p.add_argument("--multiple_readouts", type=parse_bool, default=True)
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--mask_prob", type=float, default=0.02,
                   help="D3PM per-step mask-transition probability (reference "
                        "0.02); higher unmasks atom types earlier in the "
                        "reverse chain (MI-ceiling experiment knob)")
    p.add_argument("--diffuse_angles", type=parse_bool, default=True,
                   help="VP-diffuse the lattice angles (sin/cos-encoded) "
                        "alongside the lengths. DEFAULT RECIPE since round 5: "
                        "the canonical-scale A/B (BASELINE.md r4) measured it "
                        "strictly better on every geometry metric (W1 angles "
                        "16->5.9 deg, W1 lengths 1.45->0.29 A, min-dist "
                        "violations 0.41->0.11) and it more than doubles "
                        "type-geometry MI (0.66->1.63). Pass False for strict "
                        "reference parity: the reference keeps angles fixed "
                        "at a monoclinic prior during sampling "
                        "(diffusion_loss.py:294-296), so its generated angle "
                        "marginals cannot match the data")
    p.add_argument("--angle_loss_weight", type=float, default=1.0)
    # infra
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--profiler", type=str, default=None, choices=[None, "jax"],
                   help="'jax' writes a profiler trace for the first timed epoch")
    p.add_argument("--ema", type=float, default=None, help="EMA decay (e.g. 0.99); default off like the reference diffusion run")
    p.add_argument("--synthetic_size", type=int, default=2000)
    p.add_argument("--resume", type=parse_bool, default=True,
                   help="resume from <checkpoint_dir>/last if present (preemption-safe)")
    p.add_argument("--debug_nans", type=parse_bool, default=False,
                   help="enable jax NaN checking (slow; numerics sanitizer mode)")
    p.add_argument("--compute_dtype", type=str, default=None, choices=[None, "bfloat16"],
                   help="model compute dtype; bfloat16 recommended on TPU")
    p.add_argument("--buckets", type=str, default=None,
                   help="comma-separated max-atom bucket ladder (fewer buckets = fewer compiled program variants)")
    p.add_argument("--basis_bias", type=_parse_basis_bias, default=True,
                   help="basis-MLP Dense biases: True (default) = both — the "
                        "reference shapes and the best measured sample "
                        "geometry; in = dense_in only (+1.5%% steps/s, "
                        "mildly worse geometry); False = none (+3%% steps/s, "
                        "measurably worse geometry — see BASELINE.md "
                        "ablation)")
    p.add_argument("--stacked_readout", type=parse_bool, default=True,
                   help="average the per-layer readouts as one stacked matmul "
                        "(same params/math; ablation knob)")
    return p.parse_args(argv)


EVAL_EQUIVARIANCE_TIMESTEP = 5


def build_datasets(args):
    """Returns (dataset, split indices dict, z_table, eval_timestep)."""
    from arreau_tpu.data.crystal import CrystalDataset, random_split
    from arreau_tpu.data.synthetic import synthetic_packed

    if args.dataset == "synthetic":
        ds = synthetic_packed(args.synthetic_size, seed=args.seed)
        splits = random_split(len(ds), [0.7, 0.15, 0.15], args.seed)
        return ds, {"train": splits[0], "valid": splits[1], "test": splits[2]}, ds.z_table, None
    if args.dataset == "alexandria-dev":
        paths = [os.path.join(args.data_dir, "alexandria_ps_000_take10.h5")]
        ds = CrystalDataset(paths)
        idx = np.arange(len(ds))
        return ds, {"train": idx, "valid": idx, "test": idx}, ds.z_table, None
    if args.dataset == "eval-equivariance":
        from arreau_tpu.exploration.verify_equivariance import build_equivariance_datasets

        return build_equivariance_datasets(args.data_dir)
    # full alexandria
    paths = sorted(glob.glob(os.path.join(args.data_dir, "alexandria_ps_0*.h5")))
    paths = [p for p in paths if "take" not in p]
    if not paths:
        raise FileNotFoundError(
            f"no alexandria shards under {args.data_dir}; run arreau_tpu/data/prep.py "
            "or use --dataset synthetic"
        )
    ds = CrystalDataset(paths)
    splits = random_split(len(ds), [0.7, 0.15, 0.15], args.seed)
    return ds, {"train": splits[0], "valid": splits[1], "test": splits[2]}, ds.z_table, None


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache, prefetch

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.crystal import BucketedLoader
    from arreau_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed, shard_batch
    from arreau_tpu.tasks.diffusion import DiffusionConfig, DiffusionModel, rotate_batch
    from arreau_tpu.train.checkpoint import CheckpointManager, diffusion_meta
    from arreau_tpu.train.loop import make_eval_step, make_train_step
    from arreau_tpu.train.metrics import (
        EpochTimer,
        JsonlLogger,
        MeanMetrics,
        exact_loss,
        weighted_update,
    )
    from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer
    from arreau_tpu.train.state import create_train_state

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # multi-host bring-up (no-op single-process); every host loads a disjoint
    # stride of each globally-decided batch
    host_index, num_hosts = maybe_initialize_distributed()

    dataset, splits, z_table, fixed_t = build_datasets(args)
    if args.dataset == "eval-equivariance":
        fixed_t = EVAL_EQUIVARIANCE_TIMESTEP

    cfg = DiffusionConfig(
        num_atomic_states=len(z_table),
        num_timesteps=args.num_timesteps,
        radius=args.radius,
        max_neighbors=args.max_neighbors,
        hidden_dim=args.hidden_dim,
        basis_dim=args.basis_dim,
        degree=args.degree,
        num_layers=args.layers,
        num_ori=args.num_ori,
        widening_factor=args.widening_factor,
        layer_scale=args.layer_scale if args.layer_scale != 0.0 else None,
        multiple_readouts=args.multiple_readouts,
        compute_dtype=args.compute_dtype,
        basis_bias=args.basis_bias,
        stacked_readout=args.stacked_readout,
        mask_prob=args.mask_prob,
        diffuse_angles=args.diffuse_angles,
        angle_loss_weight=args.angle_loss_weight,
    )
    model = DiffusionModel(cfg)

    mesh = make_mesh(model_size=args.model_parallel)
    n_dev = len(jax.devices())  # global device count
    n_data = n_dev // args.model_parallel  # data-parallel group count
    node_budget = args.batch_size * 16
    from arreau_tpu.data.crystal import DEFAULT_BUCKETS

    buckets = (
        tuple(int(b) for b in args.buckets.split(",")) if args.buckets else DEFAULT_BUCKETS
    )
    loaders = {
        split: BucketedLoader(
            dataset,
            idx,
            node_budget=node_budget,
            buckets=buckets,
            seed=args.seed + i,
            batch_multiple=n_data,
            host_index=host_index,
            num_hosts=num_hosts,
        )
        for i, (split, idx) in enumerate(splits.items())
    }
    steps_per_epoch = max(loaders["train"].num_batches(), 1)

    # init params from one example batch
    first_batch = next(iter(loaders["train"]))
    first_batch = jax.tree.map(jnp.asarray, first_batch)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key, first_batch)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.2f}M params | devices: {n_dev} | "
          f"steps/epoch: {steps_per_epoch} | z-table: {len(z_table)} classes")

    schedule = cosine_warmup_schedule(args.lr, args.warmup, args.epochs, steps_per_epoch)
    tx = make_optimizer(schedule, args.weight_decay, grad_clip=0.5)
    state = create_train_state(params, tx, ema_decay=args.ema)
    st_sharding = None
    if args.model_parallel > 1:
        from arreau_tpu.parallel.mesh import shard_state, state_shardings

        st_sharding = state_shardings(state, mesh)
        state = shard_state(state, mesh)

    def loss_fn(params, key, batch):
        return model.loss(params, key, batch, timestep=fixed_t)

    def train_loss_fn(params, key, batch):
        # rotation augmentation lives INSIDE the jitted step: issuing it
        # eagerly costs ~10 small dispatches per step, which dominates when
        # the device is remote (axon tunnel) or the step is ~40 ms
        if args.train_augm:
            key, k_rot = jax.random.split(key)
            batch = rotate_batch(k_rot, batch)
        return model.loss(params, key, batch, timestep=fixed_t)

    train_step = make_train_step(train_loss_fn, tx, mesh=mesh, state_sharding=st_sharding)
    eval_step = make_eval_step(loss_fn, mesh=mesh, use_ema=args.ema is not None,
                               state_sharding=st_sharding)

    def device_batches(split):
        """Collate + transfer in a prefetch thread so the next batch is staged
        on device while the current step runs (host/device overlap; the
        round-1 loop was fully synchronous)."""

        def gen():
            for host in loaders[split]:
                yield shard_batch(jax.tree.map(jnp.asarray, host), mesh)

        return prefetch(gen(), depth=2)

    # training lattice-length envelope -> checkpoint meta (generation's
    # clip_denoised stabilizer reads it; see DiffusionModel.sample)
    train_lengths = np.linalg.norm(
        dataset.packed.lattices[np.asarray(splits["train"], int)], axis=-1
    )
    length_stats = {
        "min": train_lengths.min(), "max": train_lengths.max(),
        "mean": train_lengths.mean(), "std": train_lengths.std(),
    }
    ckpt = CheckpointManager(args.checkpoint_dir, diffusion_meta(cfg, z_table, length_stats))
    if args.resume and ckpt.has("last"):
        state = ckpt.restore(state, "last")
        print(f"resumed from {ckpt.path('last')} at step {int(state.step)}")

    # optional wandb (gated: not installed in this image)
    wandb_run = None
    if args.log:
        try:
            import wandb

            wandb_run = wandb.init(
                project="arreau-tpu", name=args.experiment_name, config=vars(args)
            )
        except ImportError:
            print("wandb not available; logging to stdout only")

    timer = EpochTimer()
    # local metrics history, one JSON line per train/valid/test record —
    # always on (wandb stays optional), appended across preemption resumes
    jlog = JsonlLogger(os.path.join(args.checkpoint_dir, "metrics.jsonl"))
    # persisted across preemption resumes via the checkpoint scoreboard
    best_valid = ckpt.best_score() if args.resume else float("inf")
    global_step = int(state.step)
    profiled = False
    for epoch in range(args.epochs):
        timer.epoch_start()
        if args.profiler == "jax" and epoch == 1 and not profiled:
            jax.profiler.start_trace("profile_results")
            profiled = True
        train_metrics = MeanMetrics()
        # per-step metrics stay on device (a float() here would force a
        # device sync per step); one device_get resolves them at epoch end
        pending = []
        for batch in device_batches("train"):
            key, k_step = jax.random.split(key)
            state, metrics = train_step(state, k_step, batch)
            pending.append(metrics)
            global_step += 1
            if args.max_steps is not None and global_step >= args.max_steps:
                break
        for m in jax.device_get(pending):
            weighted_update(train_metrics, m)
        if profiled and epoch == 1:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
        dt = timer.epoch_end()
        tm = exact_loss(train_metrics.compute(), args.angle_loss_weight)
        # derive LR from the optimizer's own step count (survives resume,
        # where the in-process counter and the restored state agree via
        # global_step = state.step above)
        lr_now = float(schedule(int(state.step)))
        print(f"epoch {epoch} | train loss {tm.get('loss', float('nan')):.4f} "
              f"(coord {tm.get('loss_coord', 0):.4f} type {tm.get('loss_type', 0):.4f} "
              f"lattice {tm.get('loss_lattice', 0):.4f}{_angle_str(tm)}) | lr {lr_now:.2e} | {dt:.1f}s")
        if wandb_run:
            wandb_run.log({"epoch": epoch, "lr": lr_now, **{f"train/{k}": v for k, v in tm.items()}})
        jlog.log({"epoch": epoch, "step": int(state.step), "lr": lr_now, "epoch_s": dt,
                  **{f"train/{k}": v for k, v in tm.items()}})

        if (epoch + 1) % args.val_interval == 0 or epoch == args.epochs - 1:
            vm = MeanMetrics()
            vpending = []
            for batch in device_batches("valid"):
                key, k_eval = jax.random.split(key)
                vpending.append(eval_step(state, k_eval, batch))
            for m in jax.device_get(vpending):
                weighted_update(vm, m)
            v = exact_loss(vm.compute(), args.angle_loss_weight)
            print(f"epoch {epoch} | valid loss {v.get('loss', float('nan')):.4f} "
                  f"(coord {v.get('loss_coord', 0):.4f} type {v.get('loss_type', 0):.4f} "
                  f"lattice {v.get('loss_lattice', 0):.4f}{_angle_str(v)})")
            if wandb_run:
                wandb_run.log({f"valid/{k}": val for k, val in v.items()})
            jlog.log({"epoch": epoch, "step": int(state.step),
                      **{f"valid/{k}": val for k, val in v.items()}})
            # non-blocking: the disk write overlaps the next training epoch
            ckpt.save(state, "last", block=False)
            if v.get("loss", float("inf")) < best_valid:
                best_valid = v["loss"]
            ckpt.save_ranked(state, v.get("loss", float("inf")), step=int(state.step))
        if args.max_steps is not None and global_step >= args.max_steps:
            ckpt.save(state, "last", block=False)
            break

    ckpt.wait()  # commit any in-flight async save before the final test
    print(timer.summary())

    # final test with the best checkpoint (reference trainer.test(ckpt_path='best'))
    if ckpt.has("best"):
        state = ckpt.restore(state, "best")
    tmets = MeanMetrics()
    tpending = []
    for batch in device_batches("test"):
        key, k_eval = jax.random.split(key)
        tpending.append(eval_step(state, k_eval, batch))
    for m in jax.device_get(tpending):
        weighted_update(tmets, m)
    t = exact_loss(tmets.compute(), args.angle_loss_weight)
    print(f"test loss {t.get('loss', float('nan')):.4f} "
          f"(coord {t.get('loss_coord', 0):.4f} type {t.get('loss_type', 0):.4f} "
          f"lattice {t.get('loss_lattice', 0):.4f}{_angle_str(t)})")
    if wandb_run:
        wandb_run.log({f"test/{k}": v for k, v in t.items()})
        wandb_run.finish()
    jlog.log({"step": int(state.step), **{f"test/{k}": v for k, v in t.items()}})
    return t.get("loss")


if __name__ == "__main__":
    main()
