"""MD17 energy + force task: graph-level energy with forces as the negative
position gradient.

Capability parity with the reference ``PONITA_MD17``
(/root/reference/lightning_wrappers/md17.py:14-257 + main_md17.py): Kcal->meV
unit transform, one-hot z features, energy shift = train mean, scale = RMS of
train forces, loss = E-MSE / lambda_F + F-MSE/3, SO(3) augmentation of pos
(forces co-rotate automatically through the gradient), and test-time
averaging over random-rotation repeats. Where the reference needs
``enable_grad`` + ``create_graph`` + ``inference_mode=False`` gymnastics,
forces here are one ``jax.grad`` over the energy function, traced inside the
same jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from arreau_tpu.models.point_cloud import (
    PointCloudConfig,
    PointCloudInputs,
    PonitaPointCloud,
)
from arreau_tpu.ops.grids import random_so3_matrix
from arreau_tpu.ops.radius import radius_neighbor_list

KCAL_TO_MEV = 43.3634


class MD17Batch(NamedTuple):
    pos: jax.Array  # [B, A, 3]
    one_hot: jax.Array  # [B, A, F]
    mask: jax.Array  # [B, A]
    energy: jax.Array  # [B]
    force: jax.Array  # [B, A, 3]


@dataclass(frozen=True)
class MD17Config:
    input_dim: int = 9
    hidden_dim: int = 128
    basis_dim: int = 256
    degree: int = 3
    num_layers: int = 5
    widening_factor: int = 4
    layer_scale: Optional[float] = None
    multiple_readouts: bool = True
    radius: Optional[float] = None
    max_neighbors: int = 8
    lambda_F: float = 500.0
    lifted: bool = True

    def pc_config(self) -> PointCloudConfig:
        return PointCloudConfig(
            hidden_dim=self.hidden_dim,
            basis_dim=self.basis_dim,
            degree=self.degree,
            num_layers=self.num_layers,
            widening_factor=self.widening_factor,
            layer_scale=self.layer_scale,
            multiple_readouts=self.multiple_readouts,
            radius=self.radius,
            output_dim_scalar=1,
            output_dim_vec=0,
            lifted=self.lifted,
            graph_pooling=True,
            expected_degree=float(self.max_neighbors),
        )


def rotate_md17_batch(key: jax.Array, batch: MD17Batch) -> MD17Batch:
    rot = random_so3_matrix(key, (batch.pos.shape[0],)).astype(batch.pos.dtype)
    r = lambda x: jnp.einsum("bij,bnj->bni", rot, x)
    return batch._replace(pos=r(batch.pos), force=r(batch.force))


class MD17Model:
    def __init__(self, config: MD17Config, shift: float = 0.0, scale: float = 1.0,
                 dtype=jnp.float32):
        self.config = config
        self.shift = shift
        self.scale = scale
        self.dtype = dtype
        self.model = PonitaPointCloud(config.pc_config())

    def _build_inputs(self, pos, batch: MD17Batch) -> PointCloudInputs:
        B, A, _ = pos.shape
        neighbors = radius_neighbor_list(
            pos, batch.mask,
            radius=self.config.radius or 1000.0,
            max_neighbors=self.config.max_neighbors,
            loop=False,
        )
        return PointCloudInputs(
            pos=pos.astype(self.dtype),
            scalar=batch.one_hot.astype(self.dtype),
            vec=jnp.zeros((B, A, 0, 3), self.dtype),
            neighbors=neighbors,
            node_mask=batch.mask,
        )

    def init(self, key, batch: MD17Batch):
        return self.model.init(key, self._build_inputs(batch.pos, batch))

    def predict_energy(self, params, pos, batch: MD17Batch) -> jax.Array:
        out = self.model.apply(params, self._build_inputs(pos, batch))
        return out.scalar[..., 0]  # [B] (z-scored units)

    def predict_energy_and_force(self, params, batch: MD17Batch):
        """Energy + force = -dE/dpos, both in z-scored units."""

        def total_energy(pos):
            return self.predict_energy(params, pos, batch).sum()

        energy = self.predict_energy(params, batch.pos, batch)
        force = -jax.grad(total_energy)(batch.pos)
        force = jnp.where(batch.mask[..., None], force, 0.0)
        return energy, force

    def loss(self, params, key, batch: MD17Batch):
        energy, force = self.predict_energy_and_force(params, batch)
        e_target = (batch.energy - self.shift) / self.scale
        f_target = batch.force / self.scale

        e_mse = jnp.mean((energy - e_target) ** 2)
        n_atoms = jnp.maximum(batch.mask.sum(), 1)
        f_sq = jnp.sum((force - f_target) ** 2, axis=-1)
        f_mse = jnp.where(batch.mask, f_sq, 0.0).sum() / n_atoms / 3.0
        loss = e_mse / self.config.lambda_F + f_mse

        e_mae = jnp.mean(jnp.abs(energy * self.scale + self.shift - batch.energy))
        f_abs = jnp.abs(force * self.scale - batch.force).mean(axis=-1)
        f_mae = jnp.where(batch.mask, f_abs, 0.0).sum() / n_atoms
        return loss, {"loss": loss, "mae_energy": e_mae, "mae_force": f_mae}

    def test_repeats(self, params, key, batch: MD17Batch, repeats: int = 5):
        """Average predictions over random-rotation repeats (reference
        test_step md17.py:153-186); returns per-repeat-averaged (E, F) MAEs."""
        keys = jax.random.split(key, repeats)
        energies, forces = [], []
        for r in range(repeats):
            rot = random_so3_matrix(keys[r], (batch.pos.shape[0],)).astype(batch.pos.dtype)
            rb = batch._replace(pos=jnp.einsum("bij,bnj->bni", rot, batch.pos))
            e, f = self.predict_energy_and_force(params, rb)
            # un-rotate the forces back into the original frame
            f = jnp.einsum("bji,bnj->bni", rot, f)
            energies.append(e)
            forces.append(f)
        results = []
        n_atoms = jnp.maximum(batch.mask.sum(), 1)
        for r in range(repeats):
            e_avg = jnp.mean(jnp.stack(energies[: r + 1]), axis=0)
            f_avg = jnp.mean(jnp.stack(forces[: r + 1]), axis=0)
            e_mae = jnp.mean(jnp.abs(e_avg * self.scale + self.shift - batch.energy))
            f_abs = jnp.abs(f_avg * self.scale - batch.force).mean(axis=-1)
            f_mae = jnp.where(batch.mask, f_abs, 0.0).sum() / n_atoms
            results.append((e_mae, f_mae))
        return results
