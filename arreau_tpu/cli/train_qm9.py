"""QM9 training CLI.

Capability parity with /root/reference/main_qm9.py: DimeNet split (seed 42),
target selection, z-scored MAE training with MAE metrics in original units,
EMA 0.99, SO(3) augmentation, best/last checkpoints. Reads the raw gdb9
``.xyz`` directory when given (``--root``); falls back to synthetic
molecules so the pipeline runs offline.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool, parse_opt_float


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train Ponita on QM9 scalar regression")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_interval", type=int, default=5)
    p.add_argument("--train_augm", type=parse_bool, default=True)
    p.add_argument("--target", type=str, default="alpha")
    p.add_argument("--root", type=str, default=None, help="path to gdb9 xyz dir")
    p.add_argument("--synthetic_size", type=int, default=2000)
    p.add_argument("--radius", type=parse_opt_float, default=None)
    p.add_argument("--max_neighbors", type=int, default=8)
    p.add_argument("--num_ori", type=int, default=-1, help="-1 = lifted point cloud, 0 = plain")
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--basis_dim", type=int, default=256)
    p.add_argument("--degree", type=int, default=3)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--widening_factor", type=int, default=4)
    p.add_argument("--layer_scale", type=float, default=0.0)
    p.add_argument("--multiple_readouts", type=parse_bool, default=True)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints-qm9")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_atoms", type=int, default=None, help="dense pad size override")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.molecules import (
        dimenet_split,
        load_qm9_xyz_dir,
        synthetic_molecules,
    )
    from arreau_tpu.parallel.mesh import make_mesh, shard_batch
    from arreau_tpu.tasks.qm9 import MoleculeBatch, QM9Config, QM9Model, rotate_molecule_batch
    from arreau_tpu.train.checkpoint import CheckpointManager
    from arreau_tpu.train.loop import make_eval_step, make_train_step
    from arreau_tpu.train.metrics import EpochTimer, JsonlLogger, MeanMetrics
    from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer
    from arreau_tpu.train.state import create_train_state

    if args.root:
        data = load_qm9_xyz_dir(args.root, args.target)
    else:
        print("no --root given; using synthetic molecules")
        data = synthetic_molecules(args.synthetic_size, seed=args.seed)
    tr, va, te = dimenet_split(len(data))
    shift = float(np.mean(data.y[tr]))
    scale = float(np.std(data.y[tr]))
    print(f"target {args.target}: shift {shift:.4f} scale {scale:.4f}")

    cfg = QM9Config(
        input_dim=data.one_hot.shape[-1],
        hidden_dim=args.hidden_dim,
        basis_dim=args.basis_dim,
        degree=args.degree,
        num_layers=args.layers,
        widening_factor=args.widening_factor,
        layer_scale=args.layer_scale if args.layer_scale != 0.0 else None,
        multiple_readouts=args.multiple_readouts,
        radius=args.radius,
        max_neighbors=args.max_neighbors,
        lifted=args.num_ori == -1,
    )
    model = QM9Model(cfg, shift, scale)
    mesh = make_mesh()
    rng = np.random.default_rng(args.seed)

    max_atoms = args.max_atoms or data.pos.shape[1]

    def batches(idx, shuffle):
        order = rng.permutation(idx) if shuffle else idx
        bs = args.batch_size
        for s in range(0, len(order) - bs + 1, bs):
            chunk = order[s : s + bs]
            yield MoleculeBatch(
                pos=jnp.asarray(data.pos[chunk, :max_atoms], jnp.float32),
                one_hot=jnp.asarray(data.one_hot[chunk, :max_atoms], jnp.float32),
                mask=jnp.asarray(data.mask[chunk, :max_atoms]),
                y=jnp.asarray(data.y[chunk], jnp.float32),
            )

    first = next(batches(tr, False))
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key, first)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    steps_per_epoch = max(len(tr) // args.batch_size, 1)
    print(f"qm9 model: {n_params/1e6:.2f}M params | steps/epoch {steps_per_epoch}")

    schedule = cosine_warmup_schedule(args.lr, args.warmup, args.epochs, steps_per_epoch)
    tx = make_optimizer(schedule, args.weight_decay, grad_clip=0.5)
    state = create_train_state(params, tx, ema_decay=0.99)
    def train_loss_fn(params, key, batch):
        # augmentation inside the jitted step: eager rotation costs ~10
        # dispatches/step, which dominates with a remote (tunneled) device
        if args.train_augm:
            key, k_rot = jax.random.split(key)
            batch = rotate_molecule_batch(k_rot, batch)
        return model.loss(params, key, batch)

    train_step = make_train_step(train_loss_fn, tx, mesh=mesh)
    eval_step = make_eval_step(model.loss, mesh=mesh, use_ema=True)
    ckpt = CheckpointManager(args.checkpoint_dir, {"config": vars(args), "shift": shift, "scale": scale})

    timer = EpochTimer()
    jlog = JsonlLogger(os.path.join(args.checkpoint_dir, "metrics.jsonl"))
    best = float("inf")
    global_step = 0
    for epoch in range(args.epochs):
        timer.epoch_start()
        tm = MeanMetrics()
        pending = []  # device scalars; one device_get at epoch end (no per-step sync)
        for batch in batches(tr, True):
            batch = shard_batch(batch, mesh)
            key, k_step = jax.random.split(key)
            state, metrics = train_step(state, k_step, batch)
            pending.append(metrics)
            global_step += 1
            if args.max_steps and global_step >= args.max_steps:
                break
        for m in jax.device_get(pending):
            tm.update(m)
        dt = timer.epoch_end()
        t = tm.compute()
        print(f"epoch {epoch} | train MAE {t.get('mae', float('nan')):.6f} | {dt:.1f}s")
        if (epoch + 1) % args.val_interval == 0 or epoch == args.epochs - 1:
            vm = MeanMetrics()
            vpending = []
            for batch in batches(va, False):
                key, k_eval = jax.random.split(key)
                vpending.append(eval_step(state, k_eval, shard_batch(batch, mesh)))
            for m in jax.device_get(vpending):
                vm.update(m)
            v = vm.compute().get("mae", float("nan"))
            print(f"epoch {epoch} | valid MAE {v:.6f}")
            jlog.log({"epoch": epoch, "step": global_step, "valid/mae": v})
            ckpt.save(state, "last", block=False)
            if v < best:
                best = v
                ckpt.save(state, "best")
        if args.max_steps and global_step >= args.max_steps:
            break
    ckpt.wait()
    print(timer.summary())

    if ckpt.has("best"):
        state = ckpt.restore(state, "best")
    tmets = MeanMetrics()
    tpending = []
    for batch in batches(te, False):
        key, k_eval = jax.random.split(key)
        tpending.append(eval_step(state, k_eval, shard_batch(batch, mesh)))
    for m in jax.device_get(tpending):
        tmets.update(m)
    test_mae = tmets.compute().get("mae", float("nan"))
    print(f"test MAE {test_mae:.6f}")
    jlog.log({"step": global_step, "test/mae": test_mae})
    return test_mae


if __name__ == "__main__":
    main()
