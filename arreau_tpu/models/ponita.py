"""PonitaFiberBundle — SE(3)-equivariant backbone on an R^3 x S^2 grid,
re-designed for dense static-shape TPU batches.

Capability parity with the reference model
(/root/reference/ponita/models/ponita.py:29-162, transforms at
/root/reference/ponita/transforms/position_orientation_graph.py:65-89 and
invariants.py:59-91): scalar/vector features are lifted onto a shared
orientation grid, per-edge rotation-invariant attributes feed polynomial-basis
kernel MLPs, N ConvNext-wrapped separable fiber-bundle convolutions exchange
messages, and per-layer linear readouts are averaged then split into
node-scalar / node-vector / global-scalar / global-vector heads plus
per-layer edge readouts.

TPU-first differences:
  * the graph is a fixed-degree receiver-major neighbor list on a dense
    ``[B, A]`` batch (no PyG Batch, no scatter);
  * the lifting transform and invariant computation are fused into the
    forward pass as plain jnp (no transform objects mutating a graph);
  * LazyLinear is replaced by explicit-dim Dense layers;
  * the data-dependent "callibrate" init hack is replaced by a
    variance-correcting kernel init (see blocks.FiberBundleConv).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from arreau_tpu.models.blocks import (
    BasisMLP,
    ConvNextBlock,
    MultiBasisMLP,
    scalar_to_sphere,
    sphere_to_scalar,
    sphere_to_vec,
    vec_to_sphere,
)
from arreau_tpu.ops.pbc import NeighborList
from arreau_tpu.ops.windowing import polynomial_cutoff

_EPS = 1e-8


@dataclass(frozen=True)
class PonitaConfig:
    hidden_dim: int = 200
    basis_dim: int = 256
    degree: int = 3
    num_layers: int = 5
    widening_factor: int = 4
    layer_scale: Optional[float] = 1e-6
    multiple_readouts: bool = True
    radius: Optional[float] = 5.0
    num_ori: int = 16
    output_dim_scalar: int = 0
    output_dim_vec: int = 0
    output_dim_global_scalar: int = 0
    output_dim_global_vec: int = 0
    output_dim_edge_scalar: int = 0
    # number of extra per-edge scalar invariants appended to the spatial
    # invariants (the diffusion task appends [dist, 3 lattice cosines]).
    num_edge_scalar_features: int = 4
    expected_degree: float = 8.0
    remat: bool = True  # rematerialize each interaction layer (saves HBM)
    # compute dtype for the Dense layers ("bfloat16" halves HBM traffic and
    # doubles MXU rate on TPU; params and LayerNorm stay float32). None = f32.
    compute_dtype: Optional[str] = None
    # fused Pallas spatial conv: None = auto (on when running on TPU and no
    # edge readouts are configured), True/False = force.
    use_pallas: Optional[bool] = None
    # fold the fiber mixing into the Pallas kernel too (measured slower on
    # v5e than the split kernel + XLA einsum — see blocks.FiberBundleConv)
    fuse_fiber: bool = False
    # fold the ConvNext MLP tail + readout into a Pallas kernel (measured
    # slower on v5e — VPU/MXU serialization; see blocks.ConvNextBlock)
    fuse_convnext: bool = False
    # Average the per-layer readouts as ONE stacked matmul
    # concat_i(x_i) @ vstack_i(W_i) instead of num_layers narrow
    # [.., C] @ [C, ~13] dots whose 13-wide output pads the MXU 10x (the
    # identity sum_i x_i W_i + b_i == concat(x) vstack(W) + sum(b), exact
    # same parameters/math in both autodiff directions).
    stacked_readout: bool = True
    # Set True if anything differentiates through atom positions (forces,
    # geometry relaxation): disables the dead-cotangent shortcuts (window
    # cotangent skip, fused basis backward) that are only valid for
    # params-only gradients. PonitaPointCloud force paths set this.
    position_grads: bool = False
    # biases in the basis-MLP Dense layers: True = both (reference layer
    # shapes / older checkpoints), "in" = dense_in only (keeps the constant
    # kernel component; drops the slow [B',O,E,D] dense_out bias-grad loop
    # fusion, ~0.8 ms/step), False = none (fastest, but the kernel basis is
    # pinned to 0 at attr=0 — measured to degrade sample geometry).
    basis_bias: "bool | str" = True


class FiberBundleInputs(NamedTuple):
    """Dense inputs to the backbone.

    scalar:    [B, A, F_s] per-atom scalar features.
    vec:       [B, A, V, 3] per-atom vector features.
    neighbors: fixed-degree NeighborList over the dense batch.
    atom_mask: [B, A] validity.
    lattice:   [B, 3, 3] (only used for the lattice-cosine edge features; may
               be zeros when num_edge_scalar_features == 0).
    ori_grid:  [O, 3] orientation grid (unit vectors).
    """

    scalar: jax.Array
    vec: jax.Array
    neighbors: NeighborList
    atom_mask: jax.Array
    lattice: jax.Array
    ori_grid: jax.Array


class PonitaOutputs(NamedTuple):
    node_scalar: Optional[jax.Array]  # [B, A, out_s]
    node_vec: Optional[jax.Array]  # [B, A, out_v, 3]
    global_scalar: Optional[jax.Array]  # [B, out_gs]
    global_vec: Optional[jax.Array]  # [B, out_gv, 3]
    edge_scalar: tuple  # per-layer [B, A, K, out_e]


def fiber_bundle_invariants(
    neighbors: NeighborList, ori_grid: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """R^3 x S^2 separable invariants over the dense neighbor list.

    Returns (spatial_attr ``[B, A, K, O, 2]``, fiber_attr ``[O, O, 1]``,
    dists ``[B, A, K]``). Same math as the reference's
    ``invariant_attr_r3s2_fiber_bundle``
    (/root/reference/ponita/geometry/invariants.py:10-36): the parallel and
    orthogonal components of each edge direction w.r.t. each grid orientation,
    and the pairwise orientation inner products.
    """
    direction = neighbors.direction  # [B, A, K, D]
    inv1 = jnp.einsum("bakd,od->bako", direction, ori_grid)[..., None]
    if ori_grid.shape[-1] == 2:
        # 2D (R^2 x S^1): the orthogonal component keeps its SIGN (chirality
        # matters for SO(2); reference invariant_attr_r2s1_fiber_bundle,
        # geometry/invariants.py:49-76: inv2 = -rel_x ori_y + rel_y ori_x).
        inv2 = (
            -direction[..., None, 0] * ori_grid[None, None, None, :, 1]
            + direction[..., None, 1] * ori_grid[None, None, None, :, 0]
        )[..., None]
    else:
        rej = direction[..., None, :] - inv1 * ori_grid  # [B, A, K, O, 3]
        # eps under the sqrt keeps the gradient finite on masked zero-direction
        # slots (plain norm has a NaN gradient at exactly 0).
        inv2 = jnp.sqrt(jnp.sum(rej**2, axis=-1, keepdims=True) + _EPS**2)
    spatial = jnp.concatenate([inv1, inv2], axis=-1)
    fiber = jnp.einsum("od,pd->op", ori_grid, ori_grid)[..., None]
    return spatial, fiber, neighbors.dist


def lattice_edge_scalars(
    neighbors: NeighborList, lattice: jax.Array
) -> jax.Array:
    """Per-edge scalar invariants ``[dist, cos(dir, L_row_i) i=0..2]``,
    ``[B, A, K, 4]`` — the reference's ``edge_scalar_features``
    (/root/reference/ponita/transforms/invariants.py:79-87, eq. A39 of
    MatterGen). Cosines use an epsilon-guarded norm so masked (zero) edge
    slots produce zeros instead of NaN."""
    direction = neighbors.direction
    dir_norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)  # [B,A,K,1]
    lat_norm = jnp.linalg.norm(lattice, axis=-1)  # [B, 3]
    dots = jnp.einsum("bakd,brd->bakr", direction, lattice)  # [B,A,K,3]
    denom = jnp.maximum(dir_norm * lat_norm[:, None, None, :], _EPS)
    cosines = dots / denom
    return jnp.concatenate([neighbors.dist[..., None], cosines], axis=-1)


class PonitaFiberBundle(nn.Module):
    config: PonitaConfig

    @nn.compact
    def __call__(self, inputs: FiberBundleInputs) -> PonitaOutputs:
        cfg = self.config
        nb = inputs.neighbors
        num_ori = inputs.ori_grid.shape[0]
        cdtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None

        # ---- Lift features to the sphere --------------------------------
        lifted = [scalar_to_sphere(inputs.scalar, num_ori)]
        if inputs.vec is not None and inputs.vec.shape[-2] > 0:
            lifted.append(vec_to_sphere(inputs.vec, inputs.ori_grid))
        x = jnp.concatenate(lifted, axis=-1)  # [B, A, O, F]

        # ---- Invariant attributes + kernel bases ------------------------
        spatial_attr, fiber_attr, dists = fiber_bundle_invariants(nb, inputs.ori_grid)
        if cfg.num_edge_scalar_features > 0:
            edge_scalars = lattice_edge_scalars(nb, inputs.lattice)
            edge_scalars_sphere = scalar_to_sphere(edge_scalars, num_ori)
            attr = jnp.concatenate([spatial_attr, edge_scalars_sphere], axis=-1)
        else:
            edge_scalars_sphere = None
            attr = spatial_attr

        need_messages = cfg.output_dim_edge_scalar > 0
        use_pallas = cfg.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and not need_messages
        if need_messages:
            use_pallas = False  # per-edge messages require the XLA path

        conv_src, conv_mask = nb.src, nb.mask
        conv_window = None  # separate in-kernel window (split pallas path)
        B_, A_, K_, O_, _ = attr.shape
        tile = 1
        # Production TPU path (split Pallas conv): the basis is consumed by
        # exactly the num_layers conv kernels, so MultiBasisMLP returns one
        # aliased copy per layer and its fused Pallas backward takes the
        # per-layer cotangents directly (no XLA N-way dbasis sum fusion).
        fused_basis = use_pallas and not cfg.fuse_fiber and not cfg.position_grads
        attrT = None
        if use_pallas:
            from arreau_tpu.ops.pallas_conv import make_gather_matrix, pick_tile

            # The fused kernel works on "super-crystals" of T crystals (TA =
            # T*A atoms, sized ~256 so per-program matmuls feed the MXU at
            # every bucket size) with orientation-major, k-major-edge-row
            # layouts. All layout shuffles happen on the SMALL attr/lift
            # tensors before the big MLPs (pointwise over rows,
            # layout-agnostic) — the 100x larger basis tensor is produced
            # directly in kernel layout, in both directions of autodiff.
            #
            # Under an active kernel-partitioning mesh (parallel.mesh) the
            # Pallas calls shard_map over the super-crystal axis, so tiles
            # must not fold crystals across shard boundaries: pick the tile
            # from the PER-SHARD batch (T | B/n  =>  n | B'):
            from arreau_tpu.parallel.mesh import current_kernel_partitioning

            mesh_k, axis_k = current_kernel_partitioning()
            nshard = mesh_k.shape[axis_k] if mesh_k is not None else 1
            if B_ % max(nshard, 1):
                raise ValueError(
                    f"batch {B_} not divisible by the kernel-partitioning "
                    f"data axis ({nshard} shards)"
                )
            tile = pick_tile(B_ // nshard, A_, target=128)
            Bp = B_ // tile
            d_ = attr.shape[-1]
            if fused_basis:
                # lane-major kernel layout [B', O, d, E]: with the edge axis
                # in lanes the tensor stores only its real bytes (the [..,
                # E, d] layout pads d -> 128 lanes, ~20x HBM bloat); cast
                # BEFORE the transpose so the copy moves half the bytes
                a = attr.astype(cdtype) if cdtype is not None else attr
                a = a.reshape(Bp, tile, A_, K_, O_, d_)
                attrT = a.transpose(0, 4, 5, 3, 1, 2).reshape(
                    Bp, O_, d_, K_ * tile * A_
                )
            else:
                # attr [B, A, K, O, F] -> [B', O, K, T, A, F] -> [B', O, E, F]
                attr = attr.reshape(Bp, tile, A_, K_, O_, d_)
                attr = attr.transpose(0, 4, 3, 1, 2, 5).reshape(
                    Bp, O_, K_ * tile * A_, d_
                )
            # window [B, A, K] -> k-major rows [B', 1, E, 1]
            window = polynomial_cutoff(dists, cfg.radius)
            window = window.reshape(Bp, tile, A_, K_).transpose(0, 3, 1, 2)
            window = window.reshape(Bp, 1, K_ * tile * A_, 1)
            conv_mask = make_gather_matrix(
                nb.src, nb.mask, dtype=cdtype or attr.dtype, crystals_per_tile=tile
            )
            if not cfg.fuse_fiber:
                # split kernel applies the window in-VMEM; keep basis clean
                conv_window = window.reshape(Bp, K_ * tile * A_, 1).astype(jnp.float32)
                window = None
        else:
            window = polynomial_cutoff(dists, cfg.radius)[..., None, None]

        # cast attrs to the compute dtype BEFORE the polynomial expansion: the
        # degree-3 features blow input dim 6 -> 258, so the expanded tensor is
        # the largest non-parameter intermediate — halving it halves basis-MLP
        # HBM traffic in both autodiff directions. (The fused_basis path
        # already cast before its lane-major transpose and consumes attrT,
        # not attr — skip the dead full-tensor cast there.)
        if cdtype is not None and not fused_basis:
            attr = attr.astype(cdtype)
        # NOTE: ops/pallas_basis.py offers a fully-fused basis MLP kernel, but
        # it measured ~3 ms/step SLOWER than this XLA chain at the canonical
        # shape (the [E,7]@[7,258] poly-selection matmuls pad their
        # 7-contraction to 128 on the MXU, and the in-kernel bf16 GELU VPU
        # chains cost more than XLA's fused epilogues) — kept opt-in via
        # BasisMLP(fused=True) with parity tests, not enabled here.
        # basis_bias: True = biases on both Dense layers (reference shapes),
        # "in" = dense_in only (keeps the constant kernel component while
        # dropping the expensive dense_out bias-grad reduction), False = none
        # (fastest; measured to hurt generated-crystal geometry — BASELINE.md)
        bb_in = cfg.basis_bias is True or cfg.basis_bias == "in"
        bb_out = cfg.basis_bias is True
        if fused_basis:
            kernel_bases = MultiBasisMLP(
                cfg.hidden_dim, cfg.basis_dim, cfg.degree, n_out=cfg.num_layers,
                dtype=cdtype, use_bias=bb_in, out_bias=bb_out, name="basis_fn",
            )(attrT)
        else:
            kernel_basis = BasisMLP(
                cfg.hidden_dim, cfg.basis_dim, cfg.degree, dtype=cdtype,
                use_bias=bb_in, out_bias=bb_out, name="basis_fn"
            )(attr)
            if window is not None:
                kernel_basis = kernel_basis * window.astype(kernel_basis.dtype)
            kernel_bases = (kernel_basis,) * cfg.num_layers
        fiber_kernel_basis = BasisMLP(
            cfg.hidden_dim, cfg.basis_dim, cfg.degree, dtype=cdtype,
            use_bias=bb_in, out_bias=bb_out, name="fiber_basis_fn"
        )(fiber_attr)

        # ---- Embed + interaction/readout stack --------------------------
        if use_pallas:
            # lift -> O-major super-crystal layout [B', O, T*A, F] (the whole
            # interaction stack is elementwise/last-dim over this layout)
            x = x.reshape(Bp, tile, A_, num_ori, x.shape[-1])
            x = x.transpose(0, 3, 1, 2, 4).reshape(Bp, num_ori, tile * A_, x.shape[-1])
        x = nn.Dense(cfg.hidden_dim, use_bias=False, name="x_embedder", dtype=cdtype)(x)
        if cdtype is None:
            x = x.astype(jnp.float32)

        out_total = (
            cfg.output_dim_scalar
            + cfg.output_dim_vec
            + cfg.output_dim_global_vec
            + cfg.output_dim_global_scalar
        )
        block_cls = ConvNextBlock
        if cfg.remat:
            block_cls = nn.remat(ConvNextBlock, static_argnums=())

        from arreau_tpu.models.blocks import _DenseParams

        # the fused ConvNext kernel computes the per-layer readout as its
        # epilogue (narrow [.., C] @ [C, out_total] matmuls waste the MXU as
        # standalone XLA ops); params are created HERE so the tree keeps the
        # top-level readout_i naming of the flax path
        fused_block = (cfg.fuse_convnext and use_pallas and not need_messages
                       and cdtype is not None)
        readouts = []
        edge_readouts = []
        stacked_xs, stacked_ws, stacked_bs = [], [], []
        for i in range(cfg.num_layers):
            want_readout = cfg.multiple_readouts or i == cfg.num_layers - 1
            readout_params = None
            if fused_block and want_readout:
                readout_params = _DenseParams(
                    (cfg.hidden_dim, out_total), True, name=f"readout_{i}"
                )()
            x, messages, fused_readout = block_cls(
                cfg.hidden_dim,
                widening_factor=cfg.widening_factor,
                layer_scale_init=cfg.layer_scale,
                expected_degree=cfg.expected_degree,
                dtype=cdtype,
                use_pallas=use_pallas,
                return_messages=need_messages,
                fuse_fiber=cfg.fuse_fiber,
                fuse_convnext=cfg.fuse_convnext,
                position_grads=cfg.position_grads,
                name=f"layer_{i}",
            )(x, kernel_bases[i], fiber_kernel_basis, conv_src, conv_mask,
              conv_window, readout_params)
            if want_readout:
                if fused_readout is not None:
                    readouts.append(fused_readout)
                elif cfg.stacked_readout:
                    w, b = _DenseParams(
                        (cfg.hidden_dim, out_total), True, name=f"readout_{i}"
                    )()
                    stacked_xs.append(x)
                    stacked_ws.append(w)
                    stacked_bs.append(b)
                else:
                    readouts.append(nn.Dense(out_total, name=f"readout_{i}")(x))
                if cfg.output_dim_edge_scalar > 0:
                    edge_in = jnp.concatenate([messages, edge_scalars_sphere], axis=-1)
                    edge_readouts.append(
                        nn.Dense(cfg.output_dim_edge_scalar, name=f"edge_readout_{i}")(edge_in)
                    )
        if stacked_xs:
            # sum_i (x_i @ W_i + b_i) == concat_i(x_i) @ vstack_i(W_i)
            # + sum_i b_i: one MXU-tiled L*C contraction instead of L
            # 13-column dots (fwd AND bwd: dW/dx also become single dots)
            xcat = jnp.concatenate(stacked_xs, axis=-1)
            wcat = jnp.concatenate(stacked_ws, axis=0)
            readout = (jnp.dot(xcat, wcat) + sum(stacked_bs)) / len(stacked_xs)
        else:
            readout = sum(readouts) / len(readouts)
        if use_pallas:
            # back to [B, A, O, out_total] (small head tensor) for the
            # sphere projections and per-atom outputs
            readout = readout.reshape(B_ // tile, num_ori, tile, A_, out_total)
            readout = readout.transpose(0, 2, 3, 1, 4).reshape(
                B_, A_, num_ori, out_total
            )

        # ---- Split heads and project off the sphere ---------------------
        s0 = cfg.output_dim_scalar
        s1 = s0 + cfg.output_dim_vec
        s2 = s1 + cfg.output_dim_global_vec
        r_scalar = readout[..., :s0]
        r_vec = readout[..., s0:s1]
        r_gvec = readout[..., s1:s2]
        r_gscalar = readout[..., s2:]

        amask = inputs.atom_mask[..., None]
        node_scalar = sphere_to_scalar(r_scalar) if cfg.output_dim_scalar else None
        node_vec = (
            sphere_to_vec(r_vec, inputs.ori_grid) if cfg.output_dim_vec else None
        )
        if cfg.output_dim_global_scalar:
            gs = sphere_to_scalar(r_gscalar)  # [B, A, out_gs]
            global_scalar = jnp.where(amask, gs, 0.0).sum(axis=1)
        else:
            global_scalar = None
        if cfg.output_dim_global_vec:
            gv = sphere_to_vec(r_gvec, inputs.ori_grid)  # [B, A, out_gv, 3]
            global_vec = jnp.where(amask[..., None], gv, 0.0).sum(axis=1)
        else:
            global_vec = None
        edge_scalar = tuple(sphere_to_scalar(e) for e in edge_readouts)

        return PonitaOutputs(
            node_scalar=node_scalar,
            node_vec=node_vec,
            global_scalar=global_scalar,
            global_vec=global_vec,
            edge_scalar=edge_scalar,
        )
