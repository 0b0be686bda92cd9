"""Reverse-chain diagnosis: where do lattice lengths leave the data manifold?

Round-1 observation: generated lattice lengths drifted to ~44 angstrom vs the
3-8 angstrom training range. This instrument runs the reverse sampler step by
step (same math as tasks/diffusion.DiffusionModel.sample) and records, per
timestep:

  * mean/std of the chain's lattice lengths ``l_t``;
  * mean of the model's x0-prediction ``pred_lengths * num_atoms`` (what the
    posterior pulls toward);
  * the forward-marginal reference: under a perfect model the chain's
    marginal at step t should match ``q(l_t | l_0) = sqrt(abar_t) l_0 +
    sqrt(1 - abar_t) eps`` for data l_0 — mean ``sqrt(abar_t) E[l_0]``, std
    ``sqrt(abar_t Var[l_0] + (1 - abar_t))``.

The divergence point (and whether pred_x0 or the posterior arithmetic causes
it) localizes the failure. Usage:

    python -m arreau_tpu.exploration.diagnose_sampler \
        --checkpoint_dir out/r2/ckpt_conv --ref synthetic:20000:0 --out out/r2/diag.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--tag", type=str, default="best")
    p.add_argument("--ref", type=str, default="synthetic:20000:0")
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--num_atoms_per_sample", type=int, default=8)
    p.add_argument("--record_every", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="out/diag_sampler.json")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from arreau_tpu.cli.generate import load_model
    from arreau_tpu.diffusion.vp import vp_reverse_given_x0
    from arreau_tpu.diffusion.ve import ve_reverse_step
    from arreau_tpu.diffusion.d3pm import d3pm_reverse_step
    from arreau_tpu.inference.quality import lattice_params_np
    from arreau_tpu.ops.lattice import sample_bravais_angles

    model, params, z_table = load_model(args.checkpoint_dir, args.tag, use_ema=False)
    cfg = model.config

    # data reference stats
    if args.ref.startswith("synthetic"):
        from arreau_tpu.data.synthetic import synthetic_packed

        parts = args.ref.split(":")
        ds = synthetic_packed(
            int(parts[1]) if len(parts) > 1 else 2000,
            seed=int(parts[2]) if len(parts) > 2 else 0,
        )
    else:
        from arreau_tpu.data.crystal import CrystalDataset

        ds = CrystalDataset([args.ref])
    ref_lengths, _ = lattice_params_np(ds.packed.lattices)
    l0_mean, l0_var = float(ref_lengths.mean()), float(ref_lengths.var())

    B, A = args.num_samples, args.num_atoms_per_sample
    key = jax.random.PRNGKey(args.seed)
    k_ang, k_len, k_frac, key = jax.random.split(key, 4)
    # mirror the sampler's angle handling: fixed Bravais prior normally,
    # diffused sin/cos encoding when the checkpoint was trained that way
    if cfg.diffuse_angles:
        ang_enc = jax.random.normal(k_ang, (B, 6), jnp.float32)
    else:
        ang_enc = None
        angles = sample_bravais_angles(k_ang, "monoclinic", B).astype(jnp.float32)
    lengths = jax.random.normal(k_len, (B, 3), jnp.float32)
    frac = jax.random.normal(k_frac, (B, A, 3), jnp.float32) * 1.0
    types = jnp.full((B, A), cfg.num_atomic_states - 1)
    num_atoms = jnp.full((B,), A)
    atom_mask = jnp.ones((B, A), bool)

    @jax.jit
    def step(frac, types, lengths, ang_enc, t_scalar, key):
        from arreau_tpu.tasks.diffusion import _decode_angles_safe

        t = jnp.full((B,), t_scalar, jnp.int32)
        t_atom = jnp.broadcast_to(t[:, None], (B, A))
        k_lat, k_pos, k_type, k_ang2 = jax.random.split(key, 4)
        ang = _decode_angles_safe(ang_enc) if cfg.diffuse_angles else angles
        onehot = jax.nn.one_hot(types, cfg.num_atomic_states, dtype=jnp.float32)
        pred_eps, pred_logits, pred_global = model.predict_scores(
            params, frac, onehot, t, num_atoms, lengths, ang, atom_mask
        )
        pred_x0 = pred_global[:, :3] * num_atoms.astype(jnp.float32)[:, None]
        new_lengths = vp_reverse_given_x0(model.vp, k_lat, lengths, pred_x0, t)
        if cfg.diffuse_angles:
            pred_enc = jnp.clip(pred_global[:, 3:9], -1.0, 1.0)
            ang_enc = vp_reverse_given_x0(model.vp, k_ang2, ang_enc, pred_enc, t)
        new_frac = ve_reverse_step(model.ve, k_pos, frac, pred_eps, t)
        new_types = d3pm_reverse_step(model.d3pm, k_type, types, pred_logits, t_atom)
        return new_frac, new_types, new_lengths, ang_enc, pred_x0

    if ang_enc is None:
        ang_enc = jnp.zeros((B, 6), jnp.float32)  # inert jit argument
    records = []
    abar = np.asarray(model.vp.alpha_bars)
    for timestep in range(cfg.num_timesteps - 1, 0, -1):
        key, sub = jax.random.split(key)
        frac, types, lengths, ang_enc, pred_x0 = step(
            frac, types, lengths, ang_enc, timestep, sub
        )
        if timestep % args.record_every == 0 or timestep in (1, cfg.num_timesteps - 1):
            ln = np.asarray(lengths)
            px = np.asarray(pred_x0)
            ab = abar[max(timestep - 1, 0)]
            records.append(
                {
                    "t": int(timestep - 1),
                    "chain_mean": float(ln.mean()),
                    "chain_std": float(ln.std()),
                    "pred_x0_mean": float(px.mean()),
                    "pred_x0_std": float(px.std()),
                    "marginal_mean": float(np.sqrt(ab) * l0_mean),
                    "marginal_std": float(np.sqrt(ab * l0_var + (1 - ab))),
                }
            )
            r = records[-1]
            print(
                f"t={r['t']:4d} chain {r['chain_mean']:7.3f}±{r['chain_std']:6.3f} "
                f"pred_x0 {r['pred_x0_mean']:7.3f} "
                f"| marginal {r['marginal_mean']:7.3f}±{r['marginal_std']:6.3f}",
                flush=True,
            )

    import os

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"l0_mean": l0_mean, "l0_var": l0_var, "records": records}, f, indent=2)
    print(f"wrote {args.out}")
    return records


if __name__ == "__main__":
    main()
