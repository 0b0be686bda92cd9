"""MNIST-superpixels graph classification (2D sanity task, R^2 x S^1 grid).

Capability parity with the reference ``PONITA_MNIST``
(/root/reference/lightning_wrappers/mnist.py:10-161 + main_mnist.py): 1
scalar input (gray value), 10-class graph classification with cross-entropy,
SO(2) rotation augmentation, Sparsify (drop dim pixels) handled by masking.
The dense layout replaces the Sparsify/RemoveDuplicatePoints PyG transforms:
dim nodes are masked out instead of filtered, keeping shapes static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from arreau_tpu.models.ponita import FiberBundleInputs, PonitaConfig, PonitaFiberBundle
from arreau_tpu.ops.grids import random_so2_matrix, uniform_grid_s1
from arreau_tpu.ops.radius import radius_neighbor_list


class Mnist2DBatch(NamedTuple):
    pos: jax.Array  # [B, N, 2]
    value: jax.Array  # [B, N] gray values
    mask: jax.Array  # [B, N]
    label: jax.Array  # [B]


@dataclass(frozen=True)
class MnistConfig:
    hidden_dim: int = 64
    basis_dim: int = 128
    degree: int = 3
    num_layers: int = 4
    num_ori: int = 10
    widening_factor: int = 4
    layer_scale: Optional[float] = None
    multiple_readouts: bool = True
    radius: Optional[float] = 10.0
    max_neighbors: int = 8
    num_classes: int = 10
    sparsify_threshold: float = 0.5

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
            output_dim_vec=0,
            output_dim_global_scalar=self.num_classes,
            output_dim_global_vec=0,
            output_dim_edge_scalar=0,
            num_edge_scalar_features=0,
            expected_degree=float(self.max_neighbors),
            remat=False,
        )


def rotate_mnist_batch(key: jax.Array, batch: Mnist2DBatch) -> Mnist2DBatch:
    rot = random_so2_matrix(key, (batch.pos.shape[0],)).astype(batch.pos.dtype)
    return batch._replace(pos=jnp.einsum("bij,bnj->bni", rot, batch.pos))


class MnistModel:
    def __init__(self, config: MnistConfig, dtype=jnp.float32):
        self.config = config
        self.dtype = dtype
        self.model = PonitaFiberBundle(config.ponita_config())
        self.ori_grid = uniform_grid_s1(config.num_ori).astype(dtype)

    def _build_inputs(self, batch: Mnist2DBatch) -> FiberBundleInputs:
        B, N, _ = batch.pos.shape
        # Sparsify: mask out pixels at/below the gray threshold
        mask = batch.mask & (batch.value > self.config.sparsify_threshold)
        # guarantee at least one active node per graph (all-dim digits)
        mask = mask.at[:, 0].set(mask[:, 0] | ~mask.any(axis=1))
        neighbors = radius_neighbor_list(
            batch.pos, mask, self.config.radius or 100.0,
            self.config.max_neighbors, loop=True,
        )
        return FiberBundleInputs(
            scalar=batch.value[..., None].astype(self.dtype),
            vec=jnp.zeros((B, N, 0, 2), self.dtype),
            neighbors=neighbors,
            atom_mask=mask,
            lattice=jnp.zeros((B, 2, 2), self.dtype),
            ori_grid=self.ori_grid,
        )

    def init(self, key, batch: Mnist2DBatch):
        return self.model.init(key, self._build_inputs(batch))

    def logits(self, params, batch: Mnist2DBatch) -> jax.Array:
        out = self.model.apply(params, self._build_inputs(batch))
        return out.global_scalar  # [B, 10]

    def loss(self, params, key, batch: Mnist2DBatch):
        logits = self.logits(params, batch)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, batch.label[:, None], axis=-1).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == batch.label)
        return nll, {"loss": nll, "accuracy": acc}
