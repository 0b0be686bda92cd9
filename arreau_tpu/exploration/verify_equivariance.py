"""Equivariance verification harness.

Capability parity with the reference's ``eval-equivariance`` mode
(/root/reference/exploration/verify_model_is_equivariant.py:11-77 +
main_diffusion.py:187-199): train on ONE crystal, validate on the SAME
crystal rotated 90 degrees about z, with a pinned diffusion timestep for both
— if the model is equivariant, train loss ~= valid loss.

Run directly for a self-contained check:
    python -m arreau_tpu.exploration.verify_equivariance
"""

from __future__ import annotations

import os

import numpy as np


def _rotate_packed(packed, angle_deg: float = 90.0):
    from arreau_tpu.data.crystal import PackedCrystals

    theta = np.deg2rad(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return PackedCrystals(
        atomic_numbers=packed.atomic_numbers.copy(),
        frac_coords=packed.frac_coords.copy(),  # frac coords are basis-relative
        offsets=packed.offsets.copy(),
        lattices=packed.lattices @ rot.T,
    )


def build_equivariance_datasets(data_dir: str):
    """(dataset, splits, z_table, pinned_timestep): index 0 is the original
    crystal, index 1 its rotation."""
    from arreau_tpu.data.crystal import CrystalDataset, PackedCrystals, read_h5

    take1 = os.path.join(data_dir, "alexandria_ps_000_take10.h5")
    if os.path.exists(take1):
        base = read_h5(take1)
        one = PackedCrystals(
            atomic_numbers=base.atomic_numbers[: base.offsets[1]],
            frac_coords=base.frac_coords[: base.offsets[1]],
            offsets=base.offsets[:2],
            lattices=base.lattices[:1],
        )
    else:
        from arreau_tpu.data.synthetic import synthetic_packed

        one_ds = synthetic_packed(1, seed=0, max_atoms=8, min_atoms=6)
        one = one_ds.packed
    both = one.concat(_rotate_packed(one))
    ds = CrystalDataset.from_packed(both)
    splits = {
        "train": np.array([0]),
        "valid": np.array([1]),
        "test": np.array([1]),
    }
    from arreau_tpu.cli.train_diffusion import EVAL_EQUIVARIANCE_TIMESTEP

    return ds, splits, ds.z_table, EVAL_EQUIVARIANCE_TIMESTEP


def compare_components(ckpt_dir: str, data_dir: str = "datasets/alexandria_hdf5",
                       timestep: int | None = None, n_noise: int = 64):
    """Per-component equivariance comparison on the trained model: evaluate
    the SAME parameters on the original crystal and its rotation at the
    pinned timestep, averaging each loss component over ``n_noise`` shared
    noise draws. The coordinate-score term is the only rotation-SENSITIVE
    component (type CE is rotation-insensitive by construction; the lattice
    head consumes rotation-invariant lengths), so it carries the equivariance
    evidence — reference semantics
    (/root/reference/exploration/verify_model_is_equivariant.py:54-73) with a
    quantitative per-term bound instead of a single mixed loss."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.cli.generate import load_model
    from arreau_tpu.cli.train_diffusion import EVAL_EQUIVARIANCE_TIMESTEP
    from arreau_tpu.data.crystal import pack_dense_batch

    timestep = EVAL_EQUIVARIANCE_TIMESTEP if timestep is None else timestep
    model, params, _ = load_model(ckpt_dir, "best", use_ema=False)
    ds, splits, _, _ = build_equivariance_datasets(data_dir)
    max_atoms = int(np.diff(ds.packed.offsets).max())

    def batch_for(idx):
        host = pack_dense_batch(ds, np.array([idx]), max_atoms)
        return jax.tree.map(jnp.asarray, host)

    @jax.jit
    def eval_components(batch, key):
        def one(k):
            _, m = model.loss(params, k, batch, timestep=timestep)
            return m

        ms = jax.vmap(one)(jax.random.split(key, n_noise))
        return {k: v.mean() for k, v in ms.items()}

    key = jax.random.PRNGKey(0)  # SAME noise stream for both crystals
    orig = {k: float(v) for k, v in eval_components(batch_for(0), key).items()}
    rot = {k: float(v) for k, v in eval_components(batch_for(1), key).items()}

    print(f"\nper-component equivariance check (timestep {timestep}, "
          f"{n_noise} shared noise draws):")
    print(f"{'component':<14s}{'original':>12s}{'rotated':>12s}{'rel gap':>10s}")
    for comp in ("loss_coord", "loss_type", "loss_lattice", "loss_angle", "loss"):
        a, b = orig.get(comp), rot.get(comp)
        if a is None:
            continue
        gap = abs(a - b) / max(abs(a), 1e-9)
        marker = "  <- rotation-sensitive term" if comp == "loss_coord" else ""
        print(f"{comp:<14s}{a:>12.4f}{b:>12.4f}{gap:>9.2%}{marker}")
    return orig, rot


def main():
    """Short training run; prints train/valid losses which should track each
    other closely if (and only if) the model is equivariant, then the
    per-component original-vs-rotated comparison (the coord term is the
    rotation-sensitive one)."""
    import shutil

    from arreau_tpu.cli.train_diffusion import main as train_main

    ckpt_dir = "out/eval-equivariance-ckpt"
    # fresh run every invocation: a stale scoreboard from a previous run
    # would otherwise outrank the new scores and leave no 'best' tag
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    train_main(
        [
            "--dataset", "eval-equivariance",
            "--epochs", "40",
            "--val_interval", "10",
            "--num_timesteps", "300",
            "--batch_size", "4",
            "--hidden_dim", "32",
            "--basis_dim", "32",
            "--layers", "2",
            "--num_ori", "8",
            "--log", "False",
            "--checkpoint_dir", ckpt_dir,
        ]
    )
    compare_components(ckpt_dir)


if __name__ == "__main__":
    main()
