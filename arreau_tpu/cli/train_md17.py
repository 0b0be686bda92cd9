"""MD17 energy/force training CLI.

Capability parity with /root/reference/main_md17.py: rMD17 npz input with
Kcal->meV transform, shift = train energy mean, scale = RMS train force,
loss = E-MSE/lambda_F + F-MSE, SO(3) augmentation, EMA 0.99, test-time
rotation-repeat averaging. Synthetic-molecule fallback (with analytic
forces) keeps the pipeline runnable offline.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool, parse_opt_float


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train Ponita on MD17 energy+force")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_interval", type=int, default=5)
    p.add_argument("--train_augm", type=parse_bool, default=True)
    p.add_argument("--npz", type=str, default=None, help="path to an rMD17 npz file")
    p.add_argument("--target", type=str, default="aspirin")
    p.add_argument("--lambda_F", type=float, default=500.0)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--train_size", type=int, default=950)
    p.add_argument("--val_size", type=int, default=50)
    p.add_argument("--synthetic_size", type=int, default=1200)
    p.add_argument("--radius", type=parse_opt_float, default=None)
    p.add_argument("--max_neighbors", type=int, default=8)
    p.add_argument("--num_ori", type=int, default=-1)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--basis_dim", type=int, default=256)
    p.add_argument("--degree", type=int, default=3)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--widening_factor", type=int, default=4)
    p.add_argument("--layer_scale", type=float, default=0.0)
    p.add_argument("--multiple_readouts", type=parse_bool, default=True)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints-md17")
    p.add_argument("--max_steps", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.molecules import load_rmd17_npz, synthetic_molecules
    from arreau_tpu.parallel.mesh import make_mesh, shard_batch
    from arreau_tpu.tasks.md17 import (
        KCAL_TO_MEV,
        MD17Batch,
        MD17Config,
        MD17Model,
        rotate_md17_batch,
    )
    from arreau_tpu.train.checkpoint import CheckpointManager
    from arreau_tpu.train.loop import make_train_step
    from arreau_tpu.train.metrics import EpochTimer, JsonlLogger, MeanMetrics
    from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer
    from arreau_tpu.train.state import create_train_state

    if args.npz:
        data = load_rmd17_npz(args.npz)
        # Kcal/mol -> meV like the reference transform
        data = data._replace(y=data.y * KCAL_TO_MEV, forces=data.forces * KCAL_TO_MEV)
    else:
        print("no --npz given; using synthetic molecules with analytic forces")
        data = synthetic_molecules(args.synthetic_size, seed=args.seed, with_forces=True)

    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(data))
    tr = perm[: args.train_size]
    va = perm[args.train_size : args.train_size + args.val_size]
    te = perm[args.train_size + args.val_size :]

    shift = float(np.mean(data.y[tr]))
    scale = float(np.sqrt(np.mean(data.forces[tr] ** 2)))
    print(f"md17 shift {shift:.3f} scale {scale:.3f}")

    cfg = MD17Config(
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
        lambda_F=args.lambda_F,
        lifted=args.num_ori == -1,
    )
    model = MD17Model(cfg, shift, scale)
    mesh = make_mesh()

    def batches(idx, shuffle):
        order = rng.permutation(idx) if shuffle else idx
        bs = args.batch_size
        for s in range(0, len(order) - bs + 1, bs):
            chunk = order[s : s + bs]
            yield MD17Batch(
                pos=jnp.asarray(data.pos[chunk], jnp.float32),
                one_hot=jnp.asarray(data.one_hot[chunk], jnp.float32),
                mask=jnp.asarray(data.mask[chunk]),
                energy=jnp.asarray(data.y[chunk], jnp.float32),
                force=jnp.asarray(data.forces[chunk], jnp.float32),
            )

    first = next(batches(tr, False))
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key, first)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    steps_per_epoch = max(len(tr) // args.batch_size, 1)
    print(f"md17 model: {n_params/1e6:.2f}M params | steps/epoch {steps_per_epoch}")

    schedule = cosine_warmup_schedule(args.lr, args.warmup, args.epochs, steps_per_epoch)
    tx = make_optimizer(schedule, args.weight_decay, grad_clip=0.5)
    state = create_train_state(params, tx, ema_decay=0.99)
    def train_loss_fn(params, key, batch):
        # augmentation inside the jitted step (see train_qm9.py)
        if args.train_augm:
            key, k_rot = jax.random.split(key)
            batch = rotate_md17_batch(k_rot, batch)
        return model.loss(params, key, batch)

    train_step = make_train_step(train_loss_fn, tx, mesh=mesh)

    def eval_step_fn(state, key, batch):
        params_eval = state.ema_params if state.ema_params is not None else state.params
        _, metrics = model.loss(params_eval, key, batch)
        return metrics

    eval_step = jax.jit(eval_step_fn)
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
        print(f"epoch {epoch} | train E-MAE {t.get('mae_energy', 0):.4f} "
              f"F-MAE {t.get('mae_force', 0):.4f} | {dt:.1f}s")
        if (epoch + 1) % args.val_interval == 0 or epoch == args.epochs - 1:
            vm = MeanMetrics()
            vpending = []
            for batch in batches(va, False):
                key, k_eval = jax.random.split(key)
                vpending.append(eval_step(state, k_eval, batch))
            for m in jax.device_get(vpending):
                vm.update(m)
            v = vm.compute()
            vf = v.get("mae_force", float("nan"))
            print(f"epoch {epoch} | valid E-MAE {v.get('mae_energy', 0):.4f} F-MAE {vf:.4f}")
            jlog.log({"epoch": epoch, "step": global_step,
                      "valid/mae_energy": v.get("mae_energy"), "valid/mae_force": vf})
            ckpt.save(state, "last", block=False)
            if vf < best:
                best = vf
                ckpt.save(state, "best")
        if args.max_steps and global_step >= args.max_steps:
            break
    ckpt.wait()
    print(timer.summary())

    # test with rotation-repeat averaging
    if ckpt.has("best"):
        state = ckpt.restore(state, "best")
    params_eval = state.ema_params if state.ema_params is not None else state.params
    e_maes, f_maes = [], []
    for batch in batches(te, False):
        key, k_eval = jax.random.split(key)
        results = model.test_repeats(params_eval, k_eval, batch, repeats=args.repeats)
        e_maes.append([float(r[0]) for r in results])
        f_maes.append([float(r[1]) for r in results])
    if e_maes:
        e_avg = np.mean(e_maes, axis=0)
        f_avg = np.mean(f_maes, axis=0)
        for r in range(args.repeats):
            print(f"test MAE x{r+1}: energy {e_avg[r]:.4f} force {f_avg[r]:.4f}")
        return float(f_avg[-1])
    return None


if __name__ == "__main__":
    main()
