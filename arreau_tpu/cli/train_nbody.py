"""N-body training CLI.

Capability parity with /root/reference/main_nbody.py:33-229: same knob set
(epochs, warmup, batch_size, lr, weight_decay, seed, val_interval,
train_augm default True, max_training_samples 3000, nbody_small dataset,
model shape flags), MSE metric, best/last checkpoints. The dataset is
generated on demand by the bundled JAX simulator if the npz artifacts are
absent.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool, parse_opt_bool, parse_opt_float


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train Ponita on charged N-body dynamics")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_interval", type=int, default=5)
    p.add_argument("--train_augm", type=parse_bool, default=True)
    p.add_argument("--max_training_samples", type=int, default=3000)
    p.add_argument("--generate_train", type=int, default=10000,
                   help="trajectories to simulate for the train file when the dataset "
                        "is absent (valid/test get 1/5 each: the reference "
                        "nbody_small 10k/2k/2k convention, trained on a 3k subset)")
    p.add_argument("--dataset", type=str, default="nbody_small")
    p.add_argument("--data_dir", type=str, default="datasets/nbody")
    p.add_argument("--model", type=str, default="ponita", choices=("ponita", "egnn"),
                   help="'egnn' trains the runnable EGNN baseline (the reference "
                        "vendors broken baselines and hard-codes their curves; "
                        "see models/egnn.py)")
    p.add_argument("--radius", type=parse_opt_float, default=None)
    p.add_argument("--num_ori", type=int, default=16)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--basis_dim", type=int, default=256)
    p.add_argument("--degree", type=int, default=3)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--widening_factor", type=int, default=4)
    p.add_argument("--layer_scale", type=float, default=0.0)
    p.add_argument("--multiple_readouts", type=parse_bool, default=True)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints-nbody")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--scan_epoch", type=parse_opt_bool, default=None,
                   help="run each epoch as one jitted lax.scan over its "
                        "batches (the 30 tiny steps/epoch are host-dispatch-"
                        "bound otherwise). Default (None): auto — on when "
                        "running on a single device. True forces the scan "
                        "path (single-device execution, no DP). NOTE: "
                        "--max_steps always forces the per-batch loop, "
                        "overriding scan_epoch")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.nbody import load_or_generate
    from arreau_tpu.parallel.mesh import make_mesh, shard_batch
    from arreau_tpu.tasks.nbody import NBodyBatch, NBodyConfig, NBodyModel, rotate_nbody_batch
    from arreau_tpu.train.checkpoint import CheckpointManager
    from arreau_tpu.train.loop import make_eval_step, make_train_step
    from arreau_tpu.train.metrics import EpochTimer, JsonlLogger, MeanMetrics
    from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer
    from arreau_tpu.train.state import create_train_state

    splits = {
        split: load_or_generate(
            args.data_dir, split, num_train=max(args.generate_train, args.max_training_samples),
            dataset_name=args.dataset, seed=43,
            max_samples=args.max_training_samples if split == "train" else None,
        )
        for split in ("train", "valid", "test")
    }

    if args.model == "egnn":
        from arreau_tpu.models.egnn import EGNNConfig, EGNNNBody

        model = EGNNNBody(EGNNConfig(hidden_dim=args.hidden_dim, num_layers=args.layers))
    else:
        cfg = NBodyConfig(
            hidden_dim=args.hidden_dim,
            basis_dim=args.basis_dim,
            degree=args.degree,
            num_layers=args.layers,
            num_ori=args.num_ori,
            widening_factor=args.widening_factor,
            layer_scale=args.layer_scale if args.layer_scale != 0.0 else None,
            multiple_readouts=args.multiple_readouts,
            radius=args.radius,
        )
        model = NBodyModel(cfg)
    mesh = make_mesh()

    def batches(split, shuffle, rng):
        ex = splits[split]
        idx = rng.permutation(len(ex)) if shuffle else np.arange(len(ex))
        bs = args.batch_size
        for s in range(0, len(idx) - bs + 1, bs):
            chunk = idx[s : s + bs]
            yield NBodyBatch(
                pos=jnp.asarray(ex.loc0[chunk], jnp.float32),
                vel=jnp.asarray(ex.vel0[chunk], jnp.float32),
                charges=jnp.asarray(ex.charges[chunk], jnp.float32),
                target_pos=jnp.asarray(ex.loc_end[chunk], jnp.float32),
            )

    rng = np.random.default_rng(args.seed)
    first = next(batches("train", False, rng))
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key, first)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    steps_per_epoch = max(len(splits["train"]) // args.batch_size, 1)
    print(f"nbody model: {n_params/1e6:.2f}M params | steps/epoch {steps_per_epoch}")

    schedule = cosine_warmup_schedule(args.lr, args.warmup, args.epochs, steps_per_epoch)
    tx = make_optimizer(schedule, args.weight_decay, grad_clip=0.5)
    state = create_train_state(params, tx, ema_decay=0.99)
    train_step = make_train_step(model.loss, tx, mesh=mesh)
    eval_step = make_eval_step(model.loss, mesh=mesh, use_ema=True)

    ckpt = CheckpointManager(args.checkpoint_dir, {"config": vars(args)})
    timer = EpochTimer()
    jlog = JsonlLogger(os.path.join(args.checkpoint_dir, "metrics.jsonl"))
    best = float("inf")
    global_step = 0

    # Single-device fast path: an epoch is only ~30 batch-100 steps, so the
    # per-batch python dispatch dominates wall time. Run the whole epoch as
    # one jitted lax.scan over device-resident splits instead (the full
    # nbody_small dataset is <2 MB).
    auto_scan = jax.device_count() == 1 and jax.process_count() == 1
    use_scan = (
        (auto_scan if args.scan_epoch is None else args.scan_epoch)
        and args.max_steps is None
    )
    if args.scan_epoch is True and args.max_steps is not None:
        print(
            "NOTE: --scan_epoch=True is ignored because --max_steps requires "
            "the per-batch loop (the scanned epoch cannot stop mid-epoch)."
        )
    if use_scan:
        from functools import partial

        from arreau_tpu.train.state import apply_gradients

        bs = args.batch_size

        def device_split(name):
            ex = splits[name]
            return tuple(
                jnp.asarray(a, jnp.float32)
                for a in (ex.loc0, ex.vel0, ex.charges, ex.loc_end)
            )

        def scan_steps(state, key, idx, arrays, augment, train):
            pos, vel, ch, tgt = arrays

            def body(carry, batch_idx):
                state, key = carry
                key, k_rot, k_step = jax.random.split(key, 3)
                batch = NBodyBatch(pos[batch_idx], vel[batch_idx], ch[batch_idx], tgt[batch_idx])
                if augment:
                    batch = rotate_nbody_batch(k_rot, batch)
                if train:
                    (_, metrics), grads = jax.value_and_grad(model.loss, has_aux=True)(
                        state.params, k_step, batch
                    )
                    state = apply_gradients(state, grads, tx)
                else:
                    params = state.ema_params if state.ema_params is not None else state.params
                    _, metrics = model.loss(params, k_step, batch)
                return (state, key), metrics

            (state, _), ms = jax.lax.scan(body, (state, key), idx)
            return state, jax.tree.map(jnp.mean, ms)

        @partial(jax.jit, donate_argnums=(0,))
        def train_epoch_fn(state, key, arrays):
            kp, key = jax.random.split(key)
            idx = jax.random.permutation(kp, arrays[0].shape[0])
            idx = idx[: steps_per_epoch * bs].reshape(steps_per_epoch, bs)
            return scan_steps(state, key, idx, arrays, augment=args.train_augm, train=True)

        @jax.jit
        def eval_epoch_fn(state, key, arrays):
            nb = arrays[0].shape[0] // bs
            idx = jnp.arange(nb * bs).reshape(nb, bs)
            _, ms = scan_steps(state, key, idx, arrays, augment=False, train=False)
            return ms

        train_arrays = device_split("train")
        valid_arrays = device_split("valid")
        test_arrays = device_split("test")

    log_every = 1 if args.epochs <= 500 else args.val_interval
    for epoch in range(args.epochs):
        timer.epoch_start()
        if use_scan:
            key, k_ep = jax.random.split(key)
            state, t = train_epoch_fn(state, k_ep, train_arrays)
            t = {k: float(v) for k, v in t.items()}
            global_step += steps_per_epoch
        else:
            tm = MeanMetrics()
            pending = []  # device scalars; one device_get at epoch end
            for batch in batches("train", True, rng):
                batch = shard_batch(batch, mesh)
                key, k_rot, k_step = jax.random.split(key, 3)
                if args.train_augm:
                    batch = rotate_nbody_batch(k_rot, batch)
                state, metrics = train_step(state, k_step, batch)
                pending.append(metrics)
                global_step += 1
                if args.max_steps and global_step >= args.max_steps:
                    break
            for m in jax.device_get(pending):
                tm.update(m)
            t = tm.compute()
        dt = timer.epoch_end()
        if epoch % log_every == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch} | train MSE {t.get('mse', float('nan')):.6f} | {dt:.1f}s", flush=True)

        if (epoch + 1) % args.val_interval == 0 or epoch == args.epochs - 1:
            if use_scan:
                key, k_eval = jax.random.split(key)
                v = float(eval_epoch_fn(state, k_eval, valid_arrays).get("mse", float("nan")))
            else:
                vm = MeanMetrics()
                for batch in batches("valid", False, rng):
                    key, k_eval = jax.random.split(key)
                    vm.update(eval_step(state, k_eval, shard_batch(batch, mesh)))
                v = vm.compute().get("mse", float("nan"))
            print(f"epoch {epoch} | valid MSE {v:.6f}", flush=True)
            jlog.log({"epoch": epoch, "step": global_step,
                      "train/mse": t.get("mse"), "epoch_s": dt, "valid/mse": v})
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
    if use_scan:
        key, k_eval = jax.random.split(key)
        test_mse = float(eval_epoch_fn(state, k_eval, test_arrays).get("mse", float("nan")))
    else:
        tmets = MeanMetrics()
        for batch in batches("test", False, rng):
            key, k_eval = jax.random.split(key)
            tmets.update(eval_step(state, k_eval, shard_batch(batch, mesh)))
        test_mse = tmets.compute().get("mse", float("nan"))
    print(f"test MSE {test_mse:.6f}")
    jlog.log({"step": global_step, "test/mse": test_mse})
    return test_mse


if __name__ == "__main__":
    main()
