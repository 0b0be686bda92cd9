"""Periodic-boundary geometry kernels: min-image distances and the PBC radius
graph, designed TPU-first.

The reference builds a dynamic edge list every step with data-dependent shapes
(/root/reference/diffusion/diffusion_helpers.py:328-564). XLA requires static
shapes, so we re-design the graph representation entirely:

  * crystals are batched **dense**: ``[B, A]`` atoms with a validity mask;
  * the neighbor list is **receiver-major with fixed degree K**
    (``K = max_neighbors``): for every atom we keep the K nearest candidate
    (atom, image) pairs within the cutoff radius, as ``src`` indices into the
    crystal's atom axis plus a per-slot mask.

With this layout, message aggregation in the GNN becomes a gather +
masked dense reduction over the K axis — no scatter at all — which maps
directly onto the TPU's vector/matrix units, and the whole graph build is a
single fused elementwise + top-k program over ``[B, A, A*27]`` distances.

Semantics vs the reference ``radius_graph_pbc``:
  * same 27-image candidate set, same radius cut, same self-edge removal
    (distance^2 > 1e-4 rather than excluding the zero image only);
  * the per-atom cap keeps the K **nearest** neighbors (the reference sorts by
    distance and keeps the top ``max_neighbors`` too; tie order may differ);
  * the reference returns *all* in-radius edges when no atom exceeds the cap.
    We always return exactly K slots per atom, masked — downstream math is
    identical because masked slots contribute zero.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

# 27 lattice-image offsets in {-1, 0, 1}^3, same ordering as the reference's
# SUPERCELLS table (itertools.product, /root/reference/diffusion/diffusion_helpers.py:10).
SUPERCELLS = np.array(list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.float64)
NUM_IMAGES = 27
SELF_EDGE_EPS_SQR = 1e-4


class NeighborList(NamedTuple):
    """Fixed-degree receiver-major PBC neighbor list for a dense crystal batch.

    Attributes (B = crystals, A = max atoms per crystal, K = max neighbors):
      src:       [B, A, K] int32 — source atom index j (within the crystal) for
                 each neighbor slot of receiver atom i.
      image:     [B, A, K] int32 — index into SUPERCELLS for the periodic image
                 of the source atom. ``SUPERCELLS[image] @ L`` is the offset
                 added to atom j's cartesian position.
      dist:      [B, A, K] — |r_j + offset - r_i|.
      direction: [B, A, K, 3] — r_j + offset - r_i (points from the receiver to
                 the sender, matching the reference's ``neighbor_direction``
                 == pos_source_image - pos_target).
      mask:      [B, A, K] bool — slot validity (in radius, not self, both atoms
                 real).
    """

    src: jax.Array
    image: jax.Array
    dist: jax.Array
    direction: jax.Array
    mask: jax.Array


def min_distance_pbc(
    cart1: jax.Array,
    cart2: jax.Array,
    lattice: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Min-image squared distance and vector between paired atom sets.

    Args:
      cart1, cart2: ``[..., A, 3]`` cartesian coords (same atom count, paired
        elementwise like the reference's ``min_distance_sqr_pbc``,
        /root/reference/diffusion/diffusion_helpers.py:254-325).
      lattice: ``[..., 3, 3]`` row-basis lattices.

    Returns:
      (min_dist_sqr ``[..., A]``, min_vector ``[..., A, 3]``) where the vector
      points from cart2's closest image to cart1 (cart1 - (cart2 + offset)),
      matching the reference's ``return_vector`` output.
    """
    supercells = jnp.asarray(SUPERCELLS, dtype=cart1.dtype)
    # [..., 27, 3] cartesian offsets of each image.
    offsets = jnp.einsum("ci,...ij->...cj", supercells, lattice)
    # [..., A, 27, 3]
    diff = cart1[..., :, None, :] - (cart2[..., :, None, :] + offsets[..., None, :, :])
    dist_sqr = jnp.sum(diff**2, axis=-1)
    min_idx = jnp.argmin(dist_sqr, axis=-1)
    min_sqr = jnp.take_along_axis(dist_sqr, min_idx[..., None], axis=-1)[..., 0]
    min_vec = jnp.take_along_axis(diff, min_idx[..., None, None], axis=-2)[..., 0, :]
    return min_sqr, min_vec


def pbc_neighbor_list(
    cart: jax.Array,
    lattice: jax.Array,
    atom_mask: jax.Array,
    radius: float,
    max_neighbors: int,
    remove_self_edges: bool = True,
) -> NeighborList:
    """Build the fixed-degree PBC radius graph for a dense crystal batch.

    Args:
      cart: ``[B, A, 3]`` cartesian coordinates (padded atoms arbitrary).
      lattice: ``[B, 3, 3]`` row-basis lattices.
      atom_mask: ``[B, A]`` bool validity of each atom slot.
      radius: cutoff radius.
      max_neighbors: fixed per-atom degree K.
      remove_self_edges: drop (i, i, image) candidates with near-zero distance
        (the reference's ``mask_not_same``, distance^2 <= 1e-4).

    Returns a :class:`NeighborList`. Fully jit-compatible; cost is one
    ``[B, A, A*27]`` distance tensor plus a top-K reduction.
    """
    B, A, _ = cart.shape
    dtype = cart.dtype
    supercells = jnp.asarray(SUPERCELLS, dtype=dtype)
    offsets = jnp.einsum("ci,bij->bcj", supercells, lattice)  # [B, 27, 3]

    # Candidate positions: [B, A_src, 27, 3] = r_j + image offset.
    pos_images = cart[:, :, None, :] + offsets[:, None, :, :]
    # Pairwise difference receiver i vs candidate (j, c): [B, A_i, A_j, 27, 3].
    diff = pos_images[:, None, :, :, :] - cart[:, :, None, None, :]
    dist_sqr = jnp.sum(diff**2, axis=-1)  # [B, A, A, 27]

    valid = atom_mask[:, None, :, None] & atom_mask[:, :, None, None]  # both real
    valid &= dist_sqr <= radius * radius
    if remove_self_edges:
        valid &= dist_sqr > SELF_EDGE_EPS_SQR

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    cand = jnp.where(valid, dist_sqr, big).reshape(B, A, A * NUM_IMAGES)

    k = min(max_neighbors, A * NUM_IMAGES)
    # top-k smallest distances via negated top_k (sorted ascending by distance).
    neg_topk, flat_idx = jax.lax.top_k(-cand, k)
    topk_sqr = -neg_topk  # [B, A, K]
    src = (flat_idx // NUM_IMAGES).astype(jnp.int32)
    image = (flat_idx % NUM_IMAGES).astype(jnp.int32)
    mask = topk_sqr < big

    # Gather direction vectors for the selected slots.
    flat_diff = diff.reshape(B, A, A * NUM_IMAGES, 3)
    direction = jnp.take_along_axis(flat_diff, flat_idx[..., None], axis=2)
    # double-where keeps the sqrt gradient finite on masked slots
    safe_sqr = jnp.where(mask, topk_sqr, 1.0)
    dist = jnp.where(mask, jnp.sqrt(safe_sqr), 0.0)
    direction = jnp.where(mask[..., None], direction, 0.0)
    src = jnp.where(mask, src, 0)
    image = jnp.where(mask, image, 0)
    return NeighborList(src=src, image=image, dist=dist, direction=direction, mask=mask)
