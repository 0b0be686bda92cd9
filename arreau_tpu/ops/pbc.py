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


# Selection work (candidate distances) is chunked over receiver atoms so the
# [B, A, A*27] tensor never exceeds this many elements in HBM at once. At the
# 256-atom bucket (B=16) the unchunked tensor is ~28M floats (plus the x3
# direction variant the round-1 code also materialized); chunking caps the
# live footprint regardless of bucket size.
MAX_SELECT_ELEMS = 1 << 22


def _select_chunk_size(B: int, A: int, max_elems: int) -> int:
    """Largest divisor Ac of A with B * Ac * A * 27 <= max_elems (min 1)."""
    per_receiver = B * A * NUM_IMAGES
    best = 1
    for ac in range(1, A + 1):
        if A % ac == 0 and ac * per_receiver <= max_elems:
            best = ac
    return best


def _topk_smallest(cand: jax.Array, k: int, big) -> tuple[jax.Array, jax.Array]:
    """K smallest values (+ int32 indices) along the last axis.

    Matches ``lax.top_k(-cand, k)`` exactly — ascending values, ties broken
    toward the lower index (``argmin`` returns the first minimum) — but runs
    as K VPU argmin passes instead of a full O(n log n) sort: the sort
    lowering was ~1.1 ms/step at the canonical shape plus ~1.2 ms of
    float-key bitcast fusions, for K=8 of 432 candidates.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, cand.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(cand, axis=-1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(cand, i[..., None], axis=-1)[..., 0])
        idxs.append(i)
        cand = jnp.where(iota == i[..., None], big, cand)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def pbc_neighbor_list(
    cart: jax.Array,
    lattice: jax.Array,
    atom_mask: jax.Array,
    radius: float,
    max_neighbors: int,
    remove_self_edges: bool = True,
    max_select_elems: int = MAX_SELECT_ELEMS,
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
      max_select_elems: cap on live candidate-distance elements; receivers are
        processed in ``lax.map`` chunks beyond it (large-A buckets).

    Returns a :class:`NeighborList`. Fully jit-compatible.

    Two-phase TPU design (the reference's dynamic-shape edge builder,
    diffusion_helpers.py:328-564, has no counterpart structure):

      1. **Selection** (non-differentiable): candidate distances via the
         MXU-friendly expansion ``|x - p|^2 = |x|^2 + |p|^2 - 2 x.p`` and a
         top-K over ``A*27`` candidates, chunked over receiver atoms. Only
         int32 indices and the slot mask leave this phase, so ``lax.map``
         holds no float residuals for the backward pass.
      2. **Recompute** (differentiable): exact ``dist``/``direction`` for the
         K selected slots only, gathered from positions — gradients flow to
         ``cart`` and ``lattice`` through K slots per atom, never through the
         ``[B, A, A*27]`` candidate tensor.
    """
    B, A, _ = cart.shape
    dtype = cart.dtype
    supercells = jnp.asarray(SUPERCELLS, dtype=dtype)
    offsets = jnp.einsum("ci,bij->bcj", supercells, lattice)  # [B, 27, 3]

    # Candidate positions [B, A*27, 3] = r_j + image offset (flat (j, c) axis).
    pos_images = (cart[:, :, None, :] + offsets[:, None, :, :]).reshape(
        B, A * NUM_IMAGES, 3
    )
    k = min(max_neighbors, A * NUM_IMAGES)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    # ---- phase 1: selection (indices + mask only; no gradients) ----
    # Center coordinates per crystal: the |x|^2 + |p|^2 - 2 x.p expansion
    # cancels catastrophically in f32 when |x|^2 >> d^2, so shrink |x| first.
    # Final validity is re-decided on exact distances in phase 2; selection
    # noise only perturbs tie order near the radius boundary.
    center = jnp.mean(jax.lax.stop_gradient(cart), axis=1, keepdims=True)
    sel_cart = jax.lax.stop_gradient(cart) - center
    sel_pos = jax.lax.stop_gradient(pos_images) - center
    pp = jnp.sum(sel_pos**2, axis=-1)  # [B, A*27]
    cand_mask = jnp.repeat(atom_mask, NUM_IMAGES, axis=1)  # [B, A*27] sender real

    def select(recv_cart, recv_mask):
        """[B, Ac, 3], [B, Ac] -> (flat_idx [B, Ac, K] int32, mask [B, Ac, K])."""
        xx = jnp.sum(recv_cart**2, axis=-1)  # [B, Ac]
        dots = jnp.einsum("bai,bni->ban", recv_cart, sel_pos)  # [B, Ac, A*27]
        dist_sqr = xx[:, :, None] + pp[:, None, :] - 2.0 * dots
        valid = cand_mask[:, None, :] & recv_mask[:, :, None]
        valid &= dist_sqr <= radius * radius
        if remove_self_edges:
            valid &= dist_sqr > SELF_EDGE_EPS_SQR
        cand = jnp.where(valid, dist_sqr, big)
        vals, flat_idx = _topk_smallest(cand, k, big)
        return flat_idx, vals < big

    ac = _select_chunk_size(B, A, max_select_elems)
    if ac == A:
        flat_idx, mask = select(sel_cart, atom_mask)
    else:
        g = A // ac
        chunk_cart = sel_cart.reshape(B, g, ac, 3).swapaxes(0, 1)  # [G, B, Ac, 3]
        chunk_mask = atom_mask.reshape(B, g, ac).swapaxes(0, 1)
        flat_idx, mask = jax.lax.map(
            lambda args: select(*args), (chunk_cart, chunk_mask)
        )  # [G, B, Ac, K]
        flat_idx = flat_idx.swapaxes(0, 1).reshape(B, A, k)
        mask = mask.swapaxes(0, 1).reshape(B, A, k)

    # ---- phase 2: exact differentiable dist/direction on selected slots ----
    flat_sel = jnp.where(mask, flat_idx, 0).reshape(B, A * k)
    gathered = jnp.take_along_axis(pos_images, flat_sel[..., None], axis=1)
    direction = gathered.reshape(B, A, k, 3) - cart[:, :, None, :]
    dist_sqr_sel = jnp.sum(jax.lax.stop_gradient(direction) ** 2, axis=-1)
    # Re-decide validity on the exact distances: the matmul-expansion error in
    # phase 1 (~1e-4 A^2 in f32 at large cells) is comparable to
    # SELF_EDGE_EPS_SQR, so the radius and self-edge cuts must be exact here.
    mask &= dist_sqr_sel <= radius * radius
    if remove_self_edges:
        mask &= dist_sqr_sel > SELF_EDGE_EPS_SQR

    src = jnp.where(mask, flat_idx // NUM_IMAGES, 0)
    image = jnp.where(mask, flat_idx % NUM_IMAGES, 0)
    direction = jnp.where(mask[..., None], direction, 0.0)
    # double-where keeps the sqrt gradient finite on masked slots
    safe_sqr = jnp.where(mask, jnp.sum(direction**2, axis=-1), 1.0)
    dist = jnp.where(mask, jnp.sqrt(safe_sqr), 0.0)
    return NeighborList(src=src, image=image, dist=dist, direction=direction, mask=mask)
