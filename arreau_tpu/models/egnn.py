"""EGNN baseline (E(n)-equivariant GNN) for the N-body comparison.

The reference vendors (broken, non-runnable) EGNN/GNN/SE(3)-Transformer
baselines for its N-body comparison plots
(/root/reference/n_body_system/model.py, post_process.py — SURVEY.md C34).
This is a clean, runnable JAX re-implementation of the EGNN layer (Satorras
et al. 2021) on the dense fixed-degree batch layout, used to reproduce the
baseline MSE curves the reference hard-codes (best GNN MSE ~= 0.0064).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EGNNConfig:
    hidden_dim: int = 64
    num_layers: int = 4


class EGNNLayer(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, h, pos, vel_feat, edge_mask):
        """h: [B, N, C]; pos: [B, N, 3]; edge_mask: [B, N, N] (dense all-pairs)."""
        B, N, C = h.shape
        diff = pos[:, :, None, :] - pos[:, None, :, :]
        dist_sqr = jnp.sum(diff**2, axis=-1, keepdims=True)

        h_i = jnp.broadcast_to(h[:, :, None, :], (B, N, N, C))
        h_j = jnp.broadcast_to(h[:, None, :, :], (B, N, N, C))
        edge_in = jnp.concatenate([h_i, h_j, dist_sqr], axis=-1)
        m = nn.Dense(self.hidden_dim, name="edge_1")(edge_in)
        m = nn.silu(m)
        m = nn.Dense(self.hidden_dim, name="edge_2")(m)
        m = nn.silu(m)
        m = jnp.where(edge_mask[..., None], m, 0.0)

        # coordinate update: x_i += sum_j (x_i - x_j) * phi_x(m_ij) + phi_v(h_i) * v_i
        # (the velocity term is the EGNN-vel variant Satorras et al. use for
        # N-body — the target displacement is dominated by v*dt, which the
        # position-difference basis alone cannot express and the model would
        # otherwise memorize instead of generalize)
        coord_w = nn.Dense(1, use_bias=False, name="coord",
                           kernel_init=nn.initializers.variance_scaling(0.001, "fan_in", "truncated_normal"))(m)
        denom = jnp.sqrt(dist_sqr + 1.0)
        pos_delta = jnp.where(edge_mask[..., None], diff / denom * coord_w, 0.0).sum(axis=2)
        if vel_feat is not None:
            vel, h_init = vel_feat
            pos_delta = pos_delta + nn.Dense(1, name="vel_gate")(
                jnp.concatenate([h, h_init], axis=-1)
            ) * vel

        agg = m.sum(axis=2)
        node_in = jnp.concatenate([h, agg], axis=-1)
        upd = nn.Dense(self.hidden_dim, name="node_1")(node_in)
        upd = nn.silu(upd)
        upd = nn.Dense(C, name="node_2")(upd)
        return h + upd, pos + pos_delta


class EGNN(nn.Module):
    """EGNN predicting final positions for the N-body task."""

    config: EGNNConfig

    @nn.compact
    def __call__(self, pos, vel, charges):
        B, N, _ = pos.shape
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        h = nn.Dense(self.config.hidden_dim, name="embed")(
            jnp.concatenate([charges[..., None], speed], axis=-1)
        )
        edge_mask = ~jnp.eye(N, dtype=bool)[None].repeat(B, axis=0)
        x = pos
        h0 = h
        for i in range(self.config.num_layers):
            h, x = EGNNLayer(self.config.hidden_dim, name=f"layer_{i}")(
                h, x, (vel, h0), edge_mask
            )
        return x


class EGNNNBody:
    """Same interface as tasks.nbody.NBodyModel, for baseline comparisons."""

    def __init__(self, config: EGNNConfig = EGNNConfig()):
        self.model = EGNN(config)

    def init(self, key, batch):
        return self.model.init(key, batch.pos, batch.vel, batch.charges)

    def predict_positions(self, params, batch):
        return self.model.apply(params, batch.pos, batch.vel, batch.charges)

    def loss(self, params, key, batch):
        pred = self.predict_positions(params, batch)
        mse = jnp.mean((pred - batch.target_pos) ** 2)
        return mse, {"loss": mse, "mse": mse}
