"""VP-prior sanity check for the lattice-length diffusion.

Working replacement for the reference's (stale, import-broken)
``exploration/verify_vp_limited_mean_and_var.py``: push dataset lattice
lengths through the VP forward chain to t = T-1 and verify the terminal
marginal is ~N(0, 1) (the sampler's initialization distribution); then decode
prior draws back to lattice matrices with the monoclinic Bravais angle prior
(the sampler's init, /root/reference/diffusion/diffusion_loss.py:294-316)
and render a grid for eyeballing.

Usage: python -m arreau_tpu.exploration.vp_prior_check [--out_dir out/eda]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="out/eda")
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--num_render", type=int, default=30)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="datasets/alexandria_hdf5")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from arreau_tpu.diffusion.vp import make_vp_schedule, vp_forward
    from arreau_tpu.ops.lattice import (
        lattice_from_params,
        matrix_to_params,
        sample_bravais_angles,
    )

    # dataset lattices (synthetic fallback keeps the check self-contained)
    if args.dataset == "synthetic":
        from arreau_tpu.data.synthetic import synthetic_packed

        lattices = jnp.asarray(synthetic_packed(2000, seed=args.seed).packed.lattices,
                               jnp.float32)
    else:
        import glob

        from arreau_tpu.data.crystal import CrystalDataset

        paths = sorted(glob.glob(os.path.join(args.data_dir, "alexandria_ps_0*.h5")))
        lattices = jnp.asarray(
            CrystalDataset([p_ for p_ in paths if "take" not in p_]).packed.lattices,
            jnp.float32,
        )

    lengths, _ = matrix_to_params(lattices)
    # the model diffuses PER-ATOM-NORMALIZED lengths; the raw check uses the
    # z-scored lengths so the terminal marginal target is N(0,1)
    mu, sd = lengths.mean(), lengths.std()
    h0 = (lengths - mu) / sd

    sched = make_vp_schedule(args.num_timesteps)
    key = jax.random.PRNGKey(args.seed)
    t = jnp.full((h0.shape[0],), args.num_timesteps - 1, jnp.int32)
    h_T, _ = vp_forward(sched, key, h0, t)

    m, s = float(h_T.mean()), float(h_T.std())
    print(f"terminal marginal at t={args.num_timesteps - 1}: "
          f"mean {m:+.4f} (want ~0), std {s:.4f} (want ~1), "
          f"abar_T {float(sched.alpha_bars[args.num_timesteps - 1]):.2e}")
    ok = abs(m) < 0.05 and abs(s - 1) < 0.05
    print("PASS" if ok else "FAIL: terminal marginal far from N(0,1)")

    # decode prior draws -> lattices, render a grid
    os.makedirs(args.out_dir, exist_ok=True)
    kd, ka = jax.random.split(jax.random.PRNGKey(args.seed + 1))
    n = args.num_render
    prior = jax.random.normal(kd, (n, 3)) * sd + mu  # un-z-score prior draws
    prior = jnp.maximum(prior, 0.5)
    angles = sample_bravais_angles(ka, "monoclinic", n)
    mats = np.asarray(lattice_from_params(prior, angles))

    try:
        from arreau_tpu.inference.visualize import plot_lattice

        for i in range(min(n, 6)):
            plot_lattice(mats[i], os.path.join(args.out_dir, f"vp_prior_lattice_{i}.png"))
        print(f"rendered {min(n, 6)} prior lattices under {args.out_dir}")
    except Exception as e:  # matplotlib optional in some environments
        print(f"render skipped: {e}")

    vols = np.abs(np.linalg.det(mats))
    print(f"prior-decoded volumes: mean {vols.mean():.1f} A^3, "
          f"range [{vols.min():.1f}, {vols.max():.1f}]")
    return ok


if __name__ == "__main__":
    main()
