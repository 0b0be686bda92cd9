"""MNIST-superpixels training CLI (2D R^2 x S^1 sanity task).

Capability parity with /root/reference/main_mnist.py: 10-class graph
classification with accuracy metrics, SO(2) augmentation, Sparsify threshold,
EMA 0.99. Reads raw MNIST idx files when ``--data_dir`` has them; synthetic
shape classes otherwise.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from arreau_tpu.cli.common import parse_bool, parse_opt_float


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train Ponita on MNIST point clouds (2D)")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_interval", type=int, default=5)
    p.add_argument("--train_augm", type=parse_bool, default=True)
    p.add_argument("--data_dir", type=str, default=None, help="dir with raw MNIST idx files")
    p.add_argument("--synthetic_size", type=int, default=2000)
    p.add_argument("--num_nodes", type=int, default=75)
    p.add_argument("--radius", type=parse_opt_float, default=10.0)
    p.add_argument("--max_neighbors", type=int, default=8)
    p.add_argument("--num_ori", type=int, default=10)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--basis_dim", type=int, default=128)
    p.add_argument("--degree", type=int, default=3)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--widening_factor", type=int, default=4)
    p.add_argument("--layer_scale", type=float, default=0.0)
    p.add_argument("--multiple_readouts", type=parse_bool, default=True)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints-mnist")
    p.add_argument("--max_steps", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.mnist import load_mnist_superpixels, synthetic_superpixels
    from arreau_tpu.parallel.mesh import make_mesh, shard_batch
    from arreau_tpu.tasks.mnist import Mnist2DBatch, MnistConfig, MnistModel, rotate_mnist_batch
    from arreau_tpu.train.checkpoint import CheckpointManager
    from arreau_tpu.train.loop import make_eval_step, make_train_step
    from arreau_tpu.train.metrics import EpochTimer, JsonlLogger, MeanMetrics
    from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer
    from arreau_tpu.train.state import create_train_state

    if args.data_dir:
        train_data = load_mnist_superpixels(args.data_dir, "train", args.num_nodes)
        test_data = load_mnist_superpixels(args.data_dir, "test", args.num_nodes)
        n_val = len(test_data) // 2
        data = {"train": train_data,
                "valid": type(test_data)(*(a[:n_val] for a in test_data)),
                "test": type(test_data)(*(a[n_val:] for a in test_data))}
    else:
        print("no --data_dir given; using synthetic stroke images -> SLIC superpixels")
        full = synthetic_superpixels(args.synthetic_size, seed=args.seed, num_nodes=args.num_nodes)
        n = len(full)
        cut1, cut2 = int(n * 0.8), int(n * 0.9)
        data = {"train": type(full)(*(a[:cut1] for a in full)),
                "valid": type(full)(*(a[cut1:cut2] for a in full)),
                "test": type(full)(*(a[cut2:] for a in full))}

    cfg = MnistConfig(
        hidden_dim=args.hidden_dim,
        basis_dim=args.basis_dim,
        degree=args.degree,
        num_layers=args.layers,
        num_ori=args.num_ori,
        widening_factor=args.widening_factor,
        layer_scale=args.layer_scale if args.layer_scale != 0.0 else None,
        multiple_readouts=args.multiple_readouts,
        radius=args.radius,
        max_neighbors=args.max_neighbors,
    )
    model = MnistModel(cfg)
    mesh = make_mesh()
    rng = np.random.default_rng(args.seed)

    def batches(split, shuffle):
        ex = data[split]
        idx = rng.permutation(len(ex)) if shuffle else np.arange(len(ex))
        bs = args.batch_size
        for s in range(0, len(idx) - bs + 1, bs):
            chunk = idx[s : s + bs]
            yield Mnist2DBatch(
                pos=jnp.asarray(ex.pos[chunk], jnp.float32),
                value=jnp.asarray(ex.value[chunk], jnp.float32),
                mask=jnp.asarray(ex.mask[chunk]),
                label=jnp.asarray(ex.label[chunk]),
            )

    first = next(batches("train", False))
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key, first)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    steps_per_epoch = max(len(data["train"]) // args.batch_size, 1)
    print(f"mnist model: {n_params/1e6:.2f}M params | steps/epoch {steps_per_epoch}")

    schedule = cosine_warmup_schedule(args.lr, max(args.warmup, 1e-6), args.epochs, steps_per_epoch)
    tx = make_optimizer(schedule, args.weight_decay, grad_clip=0.5)
    state = create_train_state(params, tx, ema_decay=0.99)
    def train_loss_fn(params, key, batch):
        # augmentation inside the jitted step (see train_qm9.py)
        if args.train_augm:
            key, k_rot = jax.random.split(key)
            batch = rotate_mnist_batch(k_rot, batch)
        return model.loss(params, key, batch)

    train_step = make_train_step(train_loss_fn, tx, mesh=mesh)
    eval_step = make_eval_step(model.loss, mesh=mesh, use_ema=True)
    ckpt = CheckpointManager(args.checkpoint_dir, {"config": vars(args)})

    timer = EpochTimer()
    jlog = JsonlLogger(os.path.join(args.checkpoint_dir, "metrics.jsonl"))
    best = 0.0
    global_step = 0
    for epoch in range(args.epochs):
        timer.epoch_start()
        tm = MeanMetrics()
        pending = []  # device scalars; one device_get at epoch end (no per-step sync)
        for batch in batches("train", True):
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
        print(f"epoch {epoch} | train acc {t.get('accuracy', 0):.4f} "
              f"nll {t.get('loss', 0):.4f} | {dt:.1f}s")
        if (epoch + 1) % args.val_interval == 0 or epoch == args.epochs - 1:
            vm = MeanMetrics()
            vpending = []
            for batch in batches("valid", False):
                key, k_eval = jax.random.split(key)
                vpending.append(eval_step(state, k_eval, shard_batch(batch, mesh)))
            for m in jax.device_get(vpending):
                vm.update(m)
            v = vm.compute().get("accuracy", 0.0)
            print(f"epoch {epoch} | valid acc {v:.4f}")
            jlog.log({"epoch": epoch, "step": global_step, "valid/acc": v})
            ckpt.save(state, "last", block=False)
            if v > best:
                best = v
                ckpt.save(state, "best")
        if args.max_steps and global_step >= args.max_steps:
            break
    ckpt.wait()
    print(timer.summary())

    if ckpt.has("best"):
        state = ckpt.restore(state, "best")
    tmets = MeanMetrics()
    for batch in batches("test", False):
        key, k_eval = jax.random.split(key)
        tmets.update(eval_step(state, k_eval, shard_batch(batch, mesh)))
    acc = tmets.compute().get("accuracy", float("nan"))
    print(f"test accuracy {acc:.4f}")
    jlog.log({"step": global_step, "test/acc": acc})
    return acc


if __name__ == "__main__":
    main()
