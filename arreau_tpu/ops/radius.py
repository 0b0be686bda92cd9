"""Non-periodic fixed-capacity radius graph for dense point-cloud batches.

TPU-native replacement for ``torch_cluster.radius_graph`` (used by the
reference's non-PBC tasks: N-body, QM9, MD17, MNIST — e.g.
/root/reference/main_nbody.py:18, position_orientation_graph.py:58): instead
of a dynamic edge list, every node gets exactly K receiver-major neighbor
slots (the K nearest within the radius), with masks — same static-shape
NeighborList contract as the PBC builder so one backbone consumes both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arreau_tpu.ops.pbc import NeighborList

SELF_EDGE_EPS_SQR = 1e-12


def radius_neighbor_list(
    pos: jax.Array,
    mask: jax.Array,
    radius: float,
    max_neighbors: int,
    loop: bool = True,
) -> NeighborList:
    """Fixed-degree radius graph on a dense batch of point clouds.

    Args:
      pos: ``[B, N, D]`` positions (D = 2 or 3).
      mask: ``[B, N]`` node validity.
      radius: cutoff (use a large value for fully-connected).
      max_neighbors: per-node degree K.
      loop: keep self-edges (the reference's tasks use loop=True).

    Returns a :class:`NeighborList` with ``image`` fixed to 0 (no periodic
    images) and ``direction = pos_src - pos_receiver``.
    """
    B, N, D = pos.shape
    dtype = pos.dtype
    diff = pos[:, None, :, :] - pos[:, :, None, :]  # [B, recv, src, D]
    dist_sqr = jnp.sum(diff**2, axis=-1)

    valid = mask[:, None, :] & mask[:, :, None]
    valid &= dist_sqr <= radius * radius
    if not loop:
        eye = jnp.eye(N, dtype=bool)
        valid &= ~eye[None]

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    cand = jnp.where(valid, dist_sqr, big)

    k = min(max_neighbors, N)
    neg_topk, src = jax.lax.top_k(-cand, k)
    topk_sqr = -neg_topk
    slot_mask = topk_sqr < big

    direction = jnp.take_along_axis(diff, src[..., None], axis=2)
    # double-where keeps the sqrt gradient finite on masked slots (tasks like
    # MD17 differentiate energies through this neighbor list)
    safe_sqr = jnp.where(slot_mask, jnp.maximum(topk_sqr, 0.0), 1.0)
    dist = jnp.where(slot_mask, jnp.sqrt(safe_sqr), 0.0)
    direction = jnp.where(slot_mask[..., None], direction, 0.0)
    src = jnp.where(slot_mask, src, 0).astype(jnp.int32)
    return NeighborList(
        src=src,
        image=jnp.zeros_like(src),
        dist=dist,
        direction=direction,
        mask=slot_mask,
    )
