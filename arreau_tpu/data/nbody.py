"""Charged-particle / spring N-body simulator and dataset, JAX-native.

Capability parity with the reference's bundled generator
(/root/reference/n_body_system/dataset/synthetic_sim.py:150-299,
generate_dataset.py) and ``NBodyDataset`` (dataset_nbody.py:6-124): same
physics (Coulomb or spring pair forces, leapfrog with dt=1e-3, force clamp
at 0.1/dt, initial speed normalization, the same first-frame-overwritten
sampling quirk) and the same npz artifact schema (loc/vel/edges/charges per
split, ``nbody_small`` frame pair 30 -> 40).

TPU-first difference: all trajectories integrate **simultaneously** as one
``lax.scan`` over time on [S, n, 3] arrays — thousands of simulations per
second instead of the reference's per-trajectory Python loops.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DT = 1e-3
MAX_F = 0.1 / DT


class NBodyExamples(NamedTuple):
    """Dense batch layout consumed by the nbody task."""

    loc0: np.ndarray  # [S, n, 3] position at frame_0
    vel0: np.ndarray  # [S, n, 3] velocity at frame_0
    charges: np.ndarray  # [S, n]
    loc_end: np.ndarray  # [S, n, 3] position at frame_T

    def __len__(self):
        return len(self.loc0)


def _pair_forces(loc, coupling, power):
    """Net force per particle: sum_j coupling[i,j] (r_i - r_j) / |r_ij|^power.

    power=3 is Coulomb (coupling = q_i q_j), power=0 with negative coupling is
    the spring model. Forces are clamped elementwise at +-MAX_F like the
    reference."""
    diff = loc[..., :, None, :] - loc[..., None, :, :]  # [S, i, j, 3]
    dist_sqr = jnp.sum(diff**2, axis=-1)
    n = loc.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    if power == 0:
        inv = jnp.ones_like(dist_sqr)
    else:
        inv = jnp.where(eye[None], 0.0, dist_sqr ** (-power / 2.0))
    size = coupling * jnp.where(eye[None], 0.0, inv)
    force = jnp.sum(size[..., None] * diff, axis=-2)
    return jnp.clip(force, -MAX_F, MAX_F)


def simulate_charged(
    key: jax.Array,
    num_sims: int,
    n_balls: int = 5,
    T: int = 5000,
    sample_freq: int = 100,
    loc_std: float = 1.0,
    vel_norm: float = 0.5,
    interaction_strength: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Integrate ``num_sims`` charged 5-body systems at once.

    Returns (loc [S, T_save, n, 3], vel [S, T_save, n, 3],
    edges [S, n, n], charges [S, n]) with T_save = T // sample_freq - 1,
    matching the reference's saved-frame semantics (the initial frame is
    overwritten by the first sampled one)."""
    loc_std = loc_std * (float(n_balls) / 5.0) ** (1.0 / 3.0)
    k_q, k_loc, k_vel = jax.random.split(key, 3)
    # charges in {-1, +1} with prob 1/2 each (charge_prob = [.5, 0, .5])
    charges = jnp.where(jax.random.bernoulli(k_q, 0.5, (num_sims, n_balls)), 1.0, -1.0)
    coupling = interaction_strength * charges[:, :, None] * charges[:, None, :]

    loc = jax.random.normal(k_loc, (num_sims, n_balls, 3)) * loc_std
    vel = jax.random.normal(k_vel, (num_sims, n_balls, 3))
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel = vel * vel_norm / speed

    # initial half-step kick
    vel = vel + DT * _pair_forces(loc, coupling, 3)

    def step(carry, _):
        loc, vel = carry
        loc = loc + DT * vel
        vel = vel + DT * _pair_forces(loc, coupling, 3)
        return (loc, vel), (loc, vel)

    # integrate in sample_freq-sized chunks, keeping one frame per chunk
    num_frames = T // sample_freq - 1

    def chunk(carry, _):
        (loc, vel), _ = jax.lax.scan(step, carry, None, length=sample_freq)
        # the reference samples velocity BEFORE the force kick of the sampled
        # step; undo the last kick for the recorded frame (exact, determinstic)
        vel_sample = vel - DT * _pair_forces(loc, coupling, 3)
        return (loc, vel), (loc, vel_sample)

    (_, _), (locs, vels) = jax.lax.scan(chunk, (loc, vel), None, length=num_frames)
    # [T_save, S, n, 3] -> [S, T_save, n, 3]
    locs = jnp.swapaxes(locs, 0, 1)
    vels = jnp.swapaxes(vels, 0, 1)
    return (
        np.asarray(locs),
        np.asarray(vels),
        np.asarray(coupling),
        np.asarray(charges),
    )


def generate_nbody_npz(
    out_dir: str,
    num_train: int = 10000,
    num_valid: int = 2000,
    num_test: int = 2000,
    n_balls: int = 5,
    T: int = 5000,
    sample_freq: int = 100,
    seed: int = 43,
    suffix: str = "_charged5_initvel1small",
) -> None:
    """Write the reference npz artifact schema (loc_/vel_/edges_/charges_ per
    split, frames axis second, coordinate axis before particles)."""
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    for split, num in (("train", num_train), ("valid", num_valid), ("test", num_test)):
        key, sub = jax.random.split(key)
        loc, vel, edges, charges = simulate_charged(sub, num, n_balls, T, sample_freq)
        # reference layout: [S, T_save, 3, n]
        np.save(os.path.join(out_dir, f"loc_{split}{suffix}.npy"), loc.transpose(0, 1, 3, 2))
        np.save(os.path.join(out_dir, f"vel_{split}{suffix}.npy"), vel.transpose(0, 1, 3, 2))
        np.save(os.path.join(out_dir, f"edges_{split}{suffix}.npy"), edges)
        np.save(os.path.join(out_dir, f"charges_{split}{suffix}.npy"), charges[..., None])
        print(f"nbody {split}: {num} sims -> {out_dir}")


FRAME_PAIRS = {"nbody": (6, 8), "nbody_small": (30, 40), "nbody_small_out_dist": (20, 30)}


def load_nbody_split(
    data_dir: str,
    split: str,
    dataset_name: str = "nbody_small",
    max_samples: int | None = None,
    suffix: str = "_charged5_initvel1small",
) -> NBodyExamples:
    """Load a split from the npz artifacts into the dense task layout."""
    name = "valid" if split == "val" else split
    loc = np.load(os.path.join(data_dir, f"loc_{name}{suffix}.npy"))
    vel = np.load(os.path.join(data_dir, f"vel_{name}{suffix}.npy"))
    charges = np.load(os.path.join(data_dir, f"charges_{name}{suffix}.npy"))
    if max_samples is not None:
        loc, vel, charges = loc[:max_samples], vel[:max_samples], charges[:max_samples]
    f0, fT = FRAME_PAIRS[dataset_name]
    # reference layout [S, T, 3, n] -> dense [S, n, 3]
    return NBodyExamples(
        loc0=loc[:, f0].transpose(0, 2, 1),
        vel0=vel[:, f0].transpose(0, 2, 1),
        charges=charges[..., 0],
        loc_end=loc[:, fT].transpose(0, 2, 1),
    )


def load_or_generate(
    data_dir: str, split: str, num_train: int = 3000, seed: int = 43, **kw
) -> NBodyExamples:
    """Load the split, generating a small dataset first if absent."""
    suffix = kw.get("suffix", "_charged5_initvel1small")
    probe = os.path.join(data_dir, f"loc_train{suffix}.npy")
    if not os.path.exists(probe):
        generate_nbody_npz(
            data_dir,
            num_train=num_train,
            num_valid=max(num_train // 5, 100),
            num_test=max(num_train // 5, 100),
            seed=seed,
        )
    return load_nbody_split(data_dir, split, **kw)
