"""N-body trajectory prediction task: Ponita fiber bundle predicting the
displacement vector of each charged particle.

Capability parity with the reference ``PONITA_NBODY``
(/root/reference/lightning_wrappers/nbody.py:10-149 + main_nbody.py:15-30):
scalar input = charge, vector input = velocity, node-level vector head;
``pred_pos = pos + vec_out``; MSE against the final positions; fully
connected graph (radius 1000, self-loops) built per batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from arreau_tpu.models.ponita import FiberBundleInputs, PonitaConfig, PonitaFiberBundle
from arreau_tpu.ops.grids import cached_grid_s2, random_so3_matrix
from arreau_tpu.ops.radius import radius_neighbor_list


class NBodyBatch(NamedTuple):
    pos: jax.Array  # [B, n, 3]
    vel: jax.Array  # [B, n, 3]
    charges: jax.Array  # [B, n]
    target_pos: jax.Array  # [B, n, 3]


@dataclass(frozen=True)
class NBodyConfig:
    hidden_dim: int = 128
    basis_dim: int = 256
    degree: int = 3
    num_layers: int = 5
    num_ori: int = 16
    widening_factor: int = 4
    layer_scale: Optional[float] = None
    multiple_readouts: bool = True
    radius: Optional[float] = None  # None => fully connected, no windowing
    n_balls: int = 5

    def ponita_config(self) -> PonitaConfig:
        return PonitaConfig(
            hidden_dim=self.hidden_dim,
            basis_dim=self.basis_dim,
            degree=self.degree,
            num_layers=self.num_layers,
            widening_factor=self.widening_factor,
            layer_scale=self.layer_scale,
            multiple_readouts=self.multiple_readouts,
            radius=self.radius,
            num_ori=self.num_ori,
            output_dim_scalar=0,
            output_dim_vec=1,
            output_dim_global_scalar=0,
            output_dim_global_vec=0,
            output_dim_edge_scalar=0,
            num_edge_scalar_features=0,
            expected_degree=float(self.n_balls),
            remat=False,
        )


def rotate_nbody_batch(key: jax.Array, batch: NBodyBatch) -> NBodyBatch:
    """Random SO(3) augmentation of pos, vel and target (reference
    ``RandomRotate(["pos", "vec", "y"])``, nbody.py:26)."""
    B = batch.pos.shape[0]
    rot = random_so3_matrix(key, (B,)).astype(batch.pos.dtype)
    r = lambda x: jnp.einsum("bij,bnj->bni", rot, x)
    return NBodyBatch(r(batch.pos), r(batch.vel), batch.charges, r(batch.target_pos))


class NBodyModel:
    def __init__(self, config: NBodyConfig, dtype=jnp.float32):
        self.config = config
        self.dtype = dtype
        self.model = PonitaFiberBundle(config.ponita_config())
        self.ori_grid = jnp.asarray(cached_grid_s2(config.num_ori), dtype=dtype)

    def _build_inputs(self, batch: NBodyBatch) -> FiberBundleInputs:
        B, n, _ = batch.pos.shape
        mask = jnp.ones((B, n), bool)
        neighbors = radius_neighbor_list(
            batch.pos, mask, radius=self.config.radius or 1000.0,
            max_neighbors=n, loop=True,
        )
        return FiberBundleInputs(
            scalar=batch.charges[..., None].astype(self.dtype),
            vec=batch.vel[:, :, None, :],
            neighbors=neighbors,
            atom_mask=mask,
            lattice=jnp.zeros((B, 3, 3), self.dtype),
            ori_grid=self.ori_grid,
        )

    def init(self, key: jax.Array, batch: NBodyBatch):
        return self.model.init(key, self._build_inputs(batch))

    def predict_positions(self, params, batch: NBodyBatch) -> jax.Array:
        out = self.model.apply(params, self._build_inputs(batch))
        return batch.pos + out.node_vec[:, :, 0, :]

    def loss(self, params, key: jax.Array, batch: NBodyBatch):
        pred = self.predict_positions(params, batch)
        mse = jnp.mean((pred - batch.target_pos) ** 2)
        return mse, {"loss": mse, "mse": mse}
