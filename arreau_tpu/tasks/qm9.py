"""QM9 scalar regression task (graph-level target, z-scored MAE loss).

Capability parity with the reference ``PONITA_QM9``
(/root/reference/lightning_wrappers/qm9.py:13-173 + main_qm9.py): point-cloud
Ponita (lifted, num_ori = -1 by default), graph pooling, loss = MAE on the
z-scored target, metric = MAE in original units, SO(3) rotation
augmentation of positions.
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


class MoleculeBatch(NamedTuple):
    pos: jax.Array  # [B, A, 3]
    one_hot: jax.Array  # [B, A, F]
    mask: jax.Array  # [B, A]
    y: jax.Array  # [B]


@dataclass(frozen=True)
class QM9Config:
    input_dim: int = 5
    hidden_dim: int = 128
    basis_dim: int = 256
    degree: int = 3
    num_layers: int = 5
    widening_factor: int = 4
    layer_scale: Optional[float] = None
    multiple_readouts: bool = True
    radius: Optional[float] = None  # None => fully connected (capped at K)
    max_neighbors: int = 8
    lifted: bool = True  # num_ori = -1 mode

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


def rotate_molecule_batch(key: jax.Array, batch: MoleculeBatch) -> MoleculeBatch:
    rot = random_so3_matrix(key, (batch.pos.shape[0],)).astype(batch.pos.dtype)
    return batch._replace(pos=jnp.einsum("bij,bnj->bni", rot, batch.pos))


class QM9Model:
    def __init__(self, config: QM9Config, shift: float = 0.0, scale: float = 1.0,
                 dtype=jnp.float32):
        self.config = config
        self.shift = shift
        self.scale = scale
        self.dtype = dtype
        self.model = PonitaPointCloud(config.pc_config())

    def _build_inputs(self, batch: MoleculeBatch) -> PointCloudInputs:
        B, A, _ = batch.pos.shape
        neighbors = radius_neighbor_list(
            batch.pos, batch.mask,
            radius=self.config.radius or 1000.0,
            max_neighbors=self.config.max_neighbors,
            loop=False,  # lifted orientations need distinct endpoints
        )
        return PointCloudInputs(
            pos=batch.pos.astype(self.dtype),
            scalar=batch.one_hot.astype(self.dtype),
            vec=jnp.zeros((B, A, 0, 3), self.dtype),
            neighbors=neighbors,
            node_mask=batch.mask,
        )

    def init(self, key, batch: MoleculeBatch):
        return self.model.init(key, self._build_inputs(batch))

    def predict(self, params, batch: MoleculeBatch) -> jax.Array:
        out = self.model.apply(params, self._build_inputs(batch))
        return out.scalar[..., 0]

    def loss(self, params, key, batch: MoleculeBatch):
        pred = self.predict(params, batch)
        target = (batch.y - self.shift) / self.scale
        mae_scaled = jnp.mean(jnp.abs(pred - target))
        mae = jnp.mean(jnp.abs(pred * self.scale + self.shift - batch.y))
        return mae_scaled, {"loss": mae_scaled, "mae": mae}
