"""Joint crystal diffusion: noising, score prediction, loss, and the reverse
sampler — the TPU re-design of the reference's ``DiffusionLoss``
(/root/reference/diffusion/diffusion_loss.py:67-377) and the task glue in
``PONITA_DIFFUSION`` (/root/reference/lightning_wrappers/diffusion.py:29-118).

Everything here is a pure function over an immutable dense
:class:`CrystalBatch` (the reference mutates a PyG ``Batch`` in place inside
``predict_scores``; here the graph is rebuilt functionally inside the jitted
step). The whole train step — noise sampling, PBC graph rebuild, backbone
forward, three losses — compiles into one XLA program; the sampler is a
single ``lax.fori_loop`` over all T reverse steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arreau_tpu.diffusion.d3pm import (
    D3PMTables,
    d3pm_loss,
    d3pm_reverse_step,
    d3pm_sample_xt,
    d3pm_strided_reverse_step,
    make_d3pm_tables,
    make_strided_transitions,
)
from arreau_tpu.diffusion.ve import (
    VESchedule,
    make_ve_schedule,
    ve_ddim_step,
    ve_forward_pbc,
    ve_reverse_step,
)
from arreau_tpu.diffusion.vp import (
    VPSchedule,
    make_vp_schedule,
    vp_ddim_step_given_x0,
    vp_forward,
    vp_reverse_given_x0,
)
from arreau_tpu.models.ponita import FiberBundleInputs, PonitaConfig, PonitaFiberBundle
from arreau_tpu.ops.fourier import gaussian_fourier_features, make_fourier_weights
from arreau_tpu.ops.grids import cached_grid_s2
from arreau_tpu.ops.lattice import (
    decode_angles,
    encode_angles,
    frac_to_cart,
    lattice_from_params,
    matrix_to_params,
    sample_bravais_angles,
)
from arreau_tpu.ops.pbc import pbc_neighbor_list

# Diffusion constants (reference diffusion_loss.py:30-36).
POS_SIGMA_MIN = 0.001
POS_SIGMA_MAX = 1.0
LATTICE_POWER = 2
LATTICE_CLIPMAX = 0.999
# Fourier time-embedding constants (reference lightning_wrappers/diffusion.py:22-23).
FOURIER_SCALE = 16.0
T_EMB_DIM = 64
# Angle-diffusion mode: decoded noisy angles are clamped to this physical
# window before building a lattice — at high noise arctan2 of the VP state
# can leave (0, pi), where lattice_from_params degenerates (sin -> 0
# collapses the cell). Real crystal angles live well inside it.
ANGLE_CLIP = (0.2, float(np.pi) - 0.2)


def _decode_angles_safe(enc: jax.Array) -> jax.Array:
    return jnp.clip(decode_angles(enc), ANGLE_CLIP[0], ANGLE_CLIP[1])


def rotate_batch(key: jax.Array, batch: "CrystalBatch") -> "CrystalBatch":
    """Random SO(3) rotation augmentation: one rotation per crystal applied to
    the lattice rows (cartesian positions follow implicitly through
    ``frac @ L``; fractional coords are rotation-invariant lengths and stay
    fixed — matching the reference's RotateDef choice at
    /root/reference/lightning_wrappers/diffusion.py:55-58)."""
    from arreau_tpu.ops.grids import random_so3_matrix

    B = batch.lattice.shape[0]
    rot = random_so3_matrix(key, (B,)).astype(batch.lattice.dtype)
    new_lattice = jnp.einsum("brj,bij->bri", batch.lattice, rot)  # rows @ R^T
    return batch._replace(lattice=new_lattice)


class CrystalBatch(NamedTuple):
    """Immutable dense crystal batch.

    frac_x:     [B, A, 3] fractional coordinates in [0, 1).
    atom_types: [B, A] int z-table indices.
    lattice:    [B, 3, 3] row-basis lattices.
    num_atoms:  [B] int real atom counts.
    atom_mask:  [B, A] bool slot validity.
    """

    frac_x: jax.Array
    atom_types: jax.Array
    lattice: jax.Array
    num_atoms: jax.Array
    atom_mask: jax.Array


@dataclass(frozen=True)
class DiffusionConfig:
    num_atomic_states: int  # len(z_table) incl. MASK class
    num_timesteps: int = 1000
    radius: float = 5.0
    max_neighbors: int = 8
    hidden_dim: int = 200
    basis_dim: int = 256
    degree: int = 3
    num_layers: int = 5
    num_ori: int = 16
    widening_factor: int = 4
    layer_scale: Optional[float] = 1e-6
    multiple_readouts: bool = True
    coord_loss_weight: float = 1.0
    atom_type_loss_weight: float = 1.0
    lattice_loss_weight: float = 1.0
    fourier_seed: int = 1234
    # D3PM per-step mask-transition probability (reference 0.02,
    # /root/reference/diffusion/d3pm.py:33-40). Higher values unmask types
    # EARLIER in the reverse chain (while coordinates still carry more
    # noise) — the MI-ceiling experiment knob (BASELINE.md).
    mask_prob: float = 0.02
    remat: bool = False
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for TPU speed
    # Pallas conv kernels: None = auto (on when running on TPU), True/False =
    # force. Forcing True off-TPU runs the kernels in interpret mode — used
    # by the multi-device CPU tests to exercise the shard_map'd product path.
    use_pallas: Optional[bool] = None
    fuse_fiber: bool = False  # fold fiber mixing into the Pallas kernel
    # basis-MLP Dense biases (see PonitaConfig.basis_bias): True, "in", False.
    # True matches the reference layer shapes and pre-existing checkpoints.
    basis_bias: "bool | str" = True
    # per-layer readouts as one stacked matmul (PonitaConfig.stacked_readout)
    stacked_readout: bool = True
    # Beyond-parity extension: VP-diffuse the lattice ANGLES alongside the
    # lengths, as a sin/cos-encoded 6-vector with the same cosine schedule.
    # The reference never diffuses angles — its sampler draws them once from
    # a Bravais (default monoclinic) prior and keeps them fixed
    # (/root/reference/diffusion/diffusion_loss.py:294-296), so generated
    # angle marginals cannot match the data (measured W1 ~16 deg,
    # BASELINE.md). Off by default for strict reference parity.
    diffuse_angles: bool = False
    angle_loss_weight: float = 1.0

    @property
    def in_scalar_dim(self) -> int:
        # [one-hot types | t_emb | num_atoms | lengths | angles | scaled lengths]
        # (reference lightning_wrappers/diffusion.py:69-76)
        return self.num_atomic_states + T_EMB_DIM + 1 + 3 + 3 + 3

    @property
    def in_vec_dim(self) -> int:
        return 1 + 3  # fractional coords + 3 lattice rows

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
            output_dim_scalar=self.num_atomic_states,
            output_dim_vec=1,  # the coordinate score
            # lattice length scale factors (+ encoded-angle x0 when diffused)
            output_dim_global_scalar=3 + (6 if self.diffuse_angles else 0),
            output_dim_global_vec=0,
            output_dim_edge_scalar=0,
            num_edge_scalar_features=4,
            expected_degree=float(self.max_neighbors),
            remat=self.remat,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            fuse_fiber=self.fuse_fiber,
            basis_bias=self.basis_bias,
            stacked_readout=self.stacked_readout,
        )


class DiffusionModel:
    """Bundles the backbone, schedules and constants; all methods pure."""

    def __init__(self, config: DiffusionConfig, dtype=jnp.float32):
        self.config = config
        self.dtype = dtype
        self.model = PonitaFiberBundle(config.ponita_config())
        self.ve: VESchedule = make_ve_schedule(
            config.num_timesteps, POS_SIGMA_MIN, POS_SIGMA_MAX, dtype=dtype
        )
        self.vp: VPSchedule = make_vp_schedule(
            config.num_timesteps, power=LATTICE_POWER, clipmax=LATTICE_CLIPMAX, dtype=dtype
        )
        # Single source of truth for the D3PM forward process — the strided
        # sampler rebuilds transition products and must use the same type.
        self.d3pm_forward_type = "mask"
        self.d3pm: D3PMTables = make_d3pm_tables(
            config.num_timesteps, config.num_atomic_states, self.d3pm_forward_type,
            dtype=dtype, mask_prob=config.mask_prob,
        )
        # Fixed (non-trainable) Fourier frequencies, deterministic per seed —
        # reference stores them as a requires_grad=False nn.Parameter.
        self.fourier_w = make_fourier_weights(
            jax.random.PRNGKey(config.fourier_seed), T_EMB_DIM // 2, FOURIER_SCALE
        ).astype(dtype)
        self.ori_grid = jnp.asarray(cached_grid_s2(config.num_ori), dtype=dtype)
        # jitted-sampler cache: one compiled program per static sample() signature
        self._sample_jit_cache: dict = {}
        self._SAMPLE_JIT_CACHE_MAX = 16  # FIFO-evicted beyond this (ADVICE r3)

    # ---------------- init ----------------

    def init(self, key: jax.Array, batch: CrystalBatch):
        inputs = self._build_inputs(
            noisy_frac=batch.frac_x,
            noisy_types_onehot=jax.nn.one_hot(
                batch.atom_types, self.config.num_atomic_states, dtype=self.dtype
            ),
            t=jnp.ones((batch.frac_x.shape[0],), jnp.int32),
            num_atoms=batch.num_atoms,
            noisy_lengths=jnp.ones((batch.frac_x.shape[0], 3), self.dtype) * 4.0,
            angles=jnp.full((batch.frac_x.shape[0], 3), jnp.pi / 2, self.dtype),
            atom_mask=batch.atom_mask,
        )
        return self.model.init(key, inputs)

    # ---------------- forward ----------------

    def _build_inputs(
        self, noisy_frac, noisy_types_onehot, t, num_atoms, noisy_lengths, angles, atom_mask
    ) -> FiberBundleInputs:
        """Assemble backbone inputs from the noisy state (reference
        ``predict_scores``, diffusion_loss.py:112-181)."""
        cfg = self.config
        noisy_lattice = lattice_from_params(noisy_lengths, angles)

        beta_t = self.vp.betas[t][:, None]  # [B, 1]
        t_emb = gaussian_fourier_features(beta_t, self.fourier_w)  # [B, 64]

        B, A, _ = noisy_frac.shape
        safe_n = jnp.maximum(num_atoms, 1).astype(self.dtype)
        scaled_lengths = jnp.abs(noisy_lengths / safe_n[:, None])
        per_crystal = jnp.concatenate(
            [
                t_emb,
                num_atoms.astype(self.dtype)[:, None],
                noisy_lengths,
                angles,
                scaled_lengths,
            ],
            axis=-1,
        )  # [B, 64 + 1 + 3 + 3 + 3]
        scalar = jnp.concatenate(
            [
                noisy_types_onehot,
                jnp.broadcast_to(per_crystal[:, None, :], (B, A, per_crystal.shape[-1])),
            ],
            axis=-1,
        )
        vec = jnp.concatenate(
            [
                noisy_frac[:, :, None, :],
                jnp.broadcast_to(noisy_lattice[:, None, :, :], (B, A, 3, 3)),
            ],
            axis=2,
        )  # [B, A, 4, 3]

        cart = frac_to_cart(noisy_frac, noisy_lattice)
        neighbors = pbc_neighbor_list(
            cart, noisy_lattice, atom_mask, cfg.radius, cfg.max_neighbors
        )
        return FiberBundleInputs(
            scalar=scalar,
            vec=vec,
            neighbors=neighbors,
            atom_mask=atom_mask,
            lattice=noisy_lattice,
            ori_grid=self.ori_grid,
        )

    def predict_scores(
        self, params, noisy_frac, noisy_types_onehot, t, num_atoms, noisy_lengths, angles, atom_mask
    ):
        """Run the backbone on the noisy state.

        Returns (pred_frac_eps ``[B, A, 3]``, pred_type_logits ``[B, A, C]``,
        pred_global). pred_global is the whole global head — ``[B, 3]``
        normally, ``[B, 9]`` with ``diffuse_angles``. ALWAYS slice it:
        ``[:, :3]`` is the per-atom-scaled lattice-length x0, ``[:, 3:9]``
        the sin/cos-encoded angle x0. Using the tensor un-sliced as
        "lengths" silently mixes angle channels into length math on
        angle-diffused checkpoints.
        """
        inputs = self._build_inputs(
            noisy_frac, noisy_types_onehot, t, num_atoms, noisy_lengths, angles, atom_mask
        )
        out = self.model.apply(params, inputs)
        return out.node_vec[:, :, 0, :], out.node_scalar, out.global_scalar

    # ---------------- loss ----------------

    def loss(
        self,
        params,
        key: jax.Array,
        batch: CrystalBatch,
        timestep: Optional[int] = None,
    ) -> tuple[jax.Array, dict]:
        """Joint diffusion loss (reference ``DiffusionLoss.__call__``,
        diffusion_loss.py:204-274): wrapped-frac-coord MSE + D3PM hybrid +
        lattice-length MSE, weights 1/1/1."""
        cfg = self.config
        B, A, _ = batch.frac_x.shape
        k_t, k_pos, k_type, k_lat, k_ang = jax.random.split(key, 5)

        if timestep is None:
            t = jax.random.randint(k_t, (B,), 1, cfg.num_timesteps + 1)
        else:
            t = jnp.full((B,), timestep, jnp.int32)
        t_atom = jnp.broadcast_to(t[:, None], (B, A))

        # Noise the three modalities.
        noisy_frac, target_eps, _sigmas = ve_forward_pbc(
            self.ve, k_pos, batch.frac_x, t, batch.lattice
        )
        noisy_types = d3pm_sample_xt(self.d3pm, k_type, batch.atom_types, t_atom)
        lengths, angles = matrix_to_params(batch.lattice)
        noisy_lengths, _len_eps = vp_forward(self.vp, k_lat, lengths, t)
        if cfg.diffuse_angles:
            # angles ride the same VP chain as the lengths, sin/cos-encoded
            target_enc = encode_angles(angles)
            noisy_enc, _ang_eps = vp_forward(self.vp, k_ang, target_enc, t)
            angles_in = _decode_angles_safe(noisy_enc)
        else:
            angles_in = angles  # reference parity: clean angles as features

        noisy_types_onehot = jax.nn.one_hot(
            noisy_types, cfg.num_atomic_states, dtype=self.dtype
        )
        pred_eps, pred_type_logits, pred_global = self.predict_scores(
            params,
            noisy_frac,
            noisy_types_onehot,
            t,
            batch.num_atoms,
            noisy_lengths,
            angles_in,
            batch.atom_mask,
        )
        pred_lengths = pred_global[:, :3]

        # 1) wrapped fractional-coordinate score error (diffusion_loss.py:95-110)
        diff = jnp.abs(pred_eps - target_eps) % 1.0
        wrapped = jnp.minimum(diff, 1.0 - diff)
        per_atom = jnp.sum(wrapped**2, axis=-1)  # [B, A]
        n_valid = jnp.maximum(batch.atom_mask.sum(), 1)
        error_coord = jnp.where(batch.atom_mask, per_atom, 0.0).sum() / n_valid

        # 2) D3PM hybrid loss
        error_type = d3pm_loss(
            self.d3pm, batch.atom_types, pred_type_logits, noisy_types, t_atom, batch.atom_mask
        )

        # 3) lattice-length MSE against per-atom-scaled target lengths.
        # Padding examples (all-masked slots from short final loader chunks)
        # are excluded so the mean is exact over real crystals.
        example_mask = batch.atom_mask.any(axis=-1)  # [B]
        n_examples = jnp.maximum(example_mask.sum(), 1)
        safe_n = jnp.maximum(batch.num_atoms, 1).astype(self.dtype)
        target_lengths = lengths / safe_n[:, None]
        sq = jnp.mean((pred_lengths - target_lengths) ** 2, axis=-1)  # [B]
        error_lattice = jnp.where(example_mask, sq, 0.0).sum() / n_examples

        total = (
            cfg.coord_loss_weight * error_coord
            + cfg.atom_type_loss_weight * error_type
            + cfg.lattice_loss_weight * error_lattice
        )
        metrics = {
            "loss": total,
            "loss_coord": error_coord,
            "loss_type": error_type,
            "loss_lattice": error_lattice,
        }
        if cfg.diffuse_angles:
            # 4) encoded-angle x0 MSE (per-crystal, padding excluded)
            sq_ang = jnp.mean((pred_global[:, 3:9] - target_enc) ** 2, axis=-1)
            error_angle = jnp.where(example_mask, sq_ang, 0.0).sum() / n_examples
            total = total + cfg.angle_loss_weight * error_angle
            metrics["loss"] = total
            metrics["loss_angle"] = error_angle
        metrics |= {
            # real (unpadded) counts for exact crystal/atom-weighted epoch means
            "num_crystals": n_examples.astype(jnp.float32),
            "num_atoms": n_valid.astype(jnp.float32),
        }
        return total, metrics

    # ---------------- sampler ----------------

    def sample(
        self,
        params,
        key: jax.Array,
        num_samples: int,
        num_atoms_per_sample: int,
        constant_atoms: Optional[jax.Array] = None,
        lattice_type: str = "monoclinic",
        snapshot_every: Optional[int] = None,
        length_bounds: Optional[tuple[float, float]] = None,
        type_temperature: float = 1.0,
        sample_steps: Optional[int] = None,
        ddim_eta: float = 0.0,
        num_atoms: Optional[jax.Array] = None,
    ) -> CrystalBatch:
        """Jit-cached wrapper around :meth:`_sample_impl`.

        ``num_atoms``: optional ``[num_samples]`` per-crystal atom counts
        (<= ``num_atoms_per_sample``, which then acts as the static pad
        size). Beyond-parity knob for size-matched generation — the
        reference fixes a single atom count per run
        (main_diffusion_generate.py:57). Padded slots diffuse inertly and
        are dropped by the masked decode.

        The whole sampler — prior draws, the reverse ``fori_loop``, the
        strided D3PM transition products, and the final lattice decode —
        runs as ONE compiled program per static signature. Without this the
        ~20 eager setup/teardown ops (plus ~S small matmuls building strided
        transition tables) each cost a host->device round trip, which
        dominated generation latency on remote/tunneled devices (~1.4 s of
        the 1.7 s strided 100-crystal batch). Snapshot mode keeps the
        segmented host-loop path (it must pause on the host by design).
        """
        if snapshot_every is not None:
            return self._sample_impl(
                params, key, num_samples, num_atoms_per_sample, constant_atoms,
                lattice_type, snapshot_every, length_bounds, type_temperature,
                sample_steps, ddim_eta, num_atoms,
            )
        from arreau_tpu.parallel.mesh import kernel_partitioning_signature

        skey = (
            num_samples, num_atoms_per_sample, lattice_type,
            tuple(length_bounds) if length_bounds is not None else None,
            float(type_temperature), sample_steps, float(ddim_eta),
            # Pallas calls traced under an active kernel-partitioning mesh
            # embed shard_maps — a compiled program is only reusable under
            # the same partitioning
            kernel_partitioning_signature(),
        )
        fn = self._sample_jit_cache.get(skey)
        if fn is None:
            # Bounded cache: long-lived serving processes that vary the batch
            # shape would otherwise retain one compiled executable per
            # signature forever. FIFO eviction; reuse fixed signatures for
            # steady-state serving.
            if len(self._sample_jit_cache) >= self._SAMPLE_JIT_CACHE_MAX:
                self._sample_jit_cache.pop(next(iter(self._sample_jit_cache)))
            def impl(params, key, constant_atoms, num_atoms):
                return self._sample_impl(
                    params, key, num_samples, num_atoms_per_sample,
                    constant_atoms, lattice_type, None, length_bounds,
                    type_temperature, sample_steps, ddim_eta, num_atoms,
                )

            # constant_atoms/num_atoms None-ness is pytree structure, so one
            # cache entry serves all modes (jax.jit retraces on structure)
            fn = jax.jit(impl)
            self._sample_jit_cache[skey] = fn
        return fn(params, key, constant_atoms, num_atoms)

    def _sample_impl(
        self,
        params,
        key: jax.Array,
        num_samples: int,
        num_atoms_per_sample: int,
        constant_atoms: Optional[jax.Array] = None,
        lattice_type: str = "monoclinic",
        snapshot_every: Optional[int] = None,
        length_bounds: Optional[tuple[float, float]] = None,
        type_temperature: float = 1.0,
        sample_steps: Optional[int] = None,
        ddim_eta: float = 0.0,
        num_atoms: Optional[jax.Array] = None,
    ) -> CrystalBatch:
        """Full reverse diffusion as one jit-compiled ``lax.fori_loop``
        (reference ``DiffusionLoss.sample``, diffusion_loss.py:276-377).

        Returns a :class:`CrystalBatch` of generated crystals (atom types are
        z-table indices; decode with the z-table on the host). With
        ``snapshot_every`` set, returns ``(batch, [(timestep, batch), ...])``
        with intermediate states for visualization.

        ``length_bounds``: optional (lo, hi) clamp on the x0-prediction of
        the lattice lengths — the standard DDPM ``clip_denoised`` stabilizer.
        Lattice lengths are unbounded chain state AND model input features,
        so an imperfect model can enter a positive feedback loop (state
        drifts off the training marginal -> OOD prediction -> larger state;
        observed as the round-1 44-angstrom drift). Clamping pred_x0 to the
        training-data envelope breaks the loop without touching on-manifold
        trajectories. The reference has no such guard (its failure mode is
        unmeasured); pass None for strict reference semantics.

        ``type_temperature``: gumbel-noise scale for the D3PM type draws
        (1.0 = exact reference semantics, 0.0 = posterior argmax); see
        :func:`d3pm_reverse_step`.

        With ``config.diffuse_angles`` the lattice angles are chain state
        diffused alongside the lengths (``lattice_type`` is ignored): the
        prior is N(0,1) on the sin/cos encoding and each step applies the
        same x0-posterior update as the lengths.

        ``sample_steps``: beyond-parity strided sampling — run only S << T
        reverse steps on a uniformly-strided timestep subsequence, using the
        generalized (DDIM-family) t -> s updates for all three chains: VE
        coords (:func:`ve_ddim_step`), VP lengths/angles
        (:func:`vp_ddim_step_given_x0`), and D3PM types via exact strided
        transition products (:func:`d3pm_strided_reverse_step`). One model
        forward per strided step, so generation cost scales as S/T.
        ``ddim_eta`` interpolates determinism: 0.0 = deterministic DDIM
        (default), 1.0 = ancestral-posterior noise. ``None`` (default) or
        ``sample_steps >= T-1`` keeps the exact reference chain.
        """
        cfg = self.config
        B, A = num_samples, num_atoms_per_sample
        k_ang, k_len, k_frac, k_loop = jax.random.split(key, 4)

        if cfg.diffuse_angles:
            # angles are chain state like the lengths: N(0,1) prior on the
            # sin/cos encoding (the VP terminal marginal); lattice_type is
            # ignored in this mode
            angles = None
            ang_enc0 = jax.random.normal(k_ang, (B, 6), self.dtype)
        else:
            angles = sample_bravais_angles(k_ang, lattice_type, B).astype(self.dtype)
            ang_enc0 = jnp.zeros((B, 6), self.dtype)  # inert carry slot
        lengths0 = jax.random.normal(k_len, (B, 3), self.dtype)
        frac0 = jax.random.normal(k_frac, (B, A, 3), self.dtype) * POS_SIGMA_MAX
        types0 = (
            constant_atoms
            if constant_atoms is not None
            else jnp.full((B, A), cfg.num_atomic_states - 1)
        )
        if num_atoms is None:
            num_atoms = jnp.full((B,), A)
            atom_mask = jnp.ones((B, A), bool)
        else:
            num_atoms = jnp.asarray(num_atoms, jnp.int32)
            atom_mask = jnp.arange(A)[None, :] < num_atoms[:, None]

        def predict(frac, types, lengths, ang_enc, t):
            """One model forward + x0 post-processing, shared by the dense and
            strided step bodies so length clipping / angle clamping /
            constant-atom handling can never diverge between the two chains."""
            ang = _decode_angles_safe(ang_enc) if cfg.diffuse_angles else angles
            types_onehot = jax.nn.one_hot(types, cfg.num_atomic_states, dtype=self.dtype)
            pred_eps, pred_type_logits, pred_global = self.predict_scores(
                params, frac, types_onehot, t, num_atoms, lengths, ang, atom_mask
            )
            pred_lengths_scaled = pred_global[:, :3] * num_atoms.astype(self.dtype)[:, None]
            if length_bounds is not None:
                pred_lengths_scaled = jnp.clip(
                    pred_lengths_scaled, length_bounds[0], length_bounds[1]
                )
            # sin/cos x0 lives in [-1, 1] by definition — clamping the
            # prediction is exact, not a heuristic stabilizer
            pred_enc = (
                jnp.clip(pred_global[:, 3:9], -1.0, 1.0) if cfg.diffuse_angles else None
            )
            return pred_eps, pred_type_logits, pred_lengths_scaled, pred_enc

        def step(i, carry):
            frac, types, lengths, ang_enc, key = carry
            timestep = cfg.num_timesteps - 1 - i  # T-1 ... 1
            t = jnp.full((B,), timestep, jnp.int32)
            t_atom = jnp.broadcast_to(t[:, None], (B, A))
            key, k_lat, k_pos, k_type, k_ang2 = jax.random.split(key, 5)

            pred_eps, pred_type_logits, pred_lengths_scaled, pred_enc = predict(
                frac, types, lengths, ang_enc, t
            )
            lengths = vp_reverse_given_x0(self.vp, k_lat, lengths, pred_lengths_scaled, t)
            if cfg.diffuse_angles:
                ang_enc = vp_reverse_given_x0(self.vp, k_ang2, ang_enc, pred_enc, t)
            frac = ve_reverse_step(self.ve, k_pos, frac, pred_eps, t)
            types = d3pm_reverse_step(
                self.d3pm, k_type, types, pred_type_logits, t_atom,
                temperature=type_temperature,
            )
            if constant_atoms is not None:
                types = constant_atoms
            return frac, types, lengths, ang_enc, key

        def batch_of(carry):
            frac, types, lengths, ang_enc, _ = carry
            ang = _decode_angles_safe(ang_enc) if cfg.diffuse_angles else angles
            return CrystalBatch(
                frac_x=frac,
                atom_types=types,
                lattice=lattice_from_params(lengths, ang),
                num_atoms=num_atoms,
                atom_mask=atom_mask,
            )

        carry0 = (frac0, types0, lengths0, ang_enc0, k_loop)
        total = cfg.num_timesteps - 1

        if sample_steps is not None and sample_steps < 1:
            raise ValueError(f"sample_steps must be >= 1, got {sample_steps}")
        if sample_steps is not None and sample_steps < total:
            if snapshot_every is not None:
                raise ValueError("snapshots are not supported with strided sampling")
            # Uniformly-strided chain levels 0 = ts[0] < ... < ts[-1] = T-1
            # (host-side, static). Each loop iteration runs one t -> s jump.
            ts = np.unique(
                np.round(np.linspace(0, total, sample_steps + 1)).astype(np.int64)
            )
            ts_j = jnp.asarray(ts, jnp.int32)
            num_strided = ts.size - 1
            q_strided_T = make_strided_transitions(
                cfg.num_timesteps,
                cfg.num_atomic_states,
                ts,
                self.d3pm_forward_type,
                mask_prob=cfg.mask_prob,
                dtype=self.dtype,
            )

            def strided_step(k, carry):
                frac, types, lengths, ang_enc, key = carry
                idx = num_strided - 1 - k  # pairs walked high-noise -> clean
                t = jnp.full((B,), ts_j[idx + 1], jnp.int32)
                s = jnp.full((B,), ts_j[idx], jnp.int32)
                s_atom = jnp.broadcast_to(s[:, None], (B, A))
                key, k_lat, k_pos, k_type, k_ang2 = jax.random.split(key, 5)

                pred_eps, pred_type_logits, pred_lengths_scaled, pred_enc = predict(
                    frac, types, lengths, ang_enc, t
                )
                lengths = vp_ddim_step_given_x0(
                    self.vp, k_lat, lengths, pred_lengths_scaled, t, s, ddim_eta
                )
                if cfg.diffuse_angles:
                    ang_enc = vp_ddim_step_given_x0(
                        self.vp, k_ang2, ang_enc, pred_enc, t, s, ddim_eta
                    )
                frac = ve_ddim_step(self.ve, k_pos, frac, pred_eps, t, s, ddim_eta)
                types = d3pm_strided_reverse_step(
                    self.d3pm,
                    q_strided_T[idx],
                    k_type,
                    types,
                    pred_type_logits,
                    s_atom,
                    temperature=type_temperature,
                )
                if constant_atoms is not None:
                    types = constant_atoms
                return frac, types, lengths, ang_enc, key

            carry = jax.lax.fori_loop(0, num_strided, strided_step, carry0)
            return batch_of(carry)

        if snapshot_every is None:
            carry = jax.lax.fori_loop(0, total, step, carry0)
            return batch_of(carry)

        # segmented sampling: same math, paused every `snapshot_every` steps
        # so the host can record/render intermediate states (the reference's
        # per-timestep visualization, diffusion_loss.py:351-365)
        segment = jax.jit(
            lambda start, carry: jax.lax.fori_loop(
                start, jnp.minimum(start + snapshot_every, total), step, carry
            )
        )
        snapshots = []
        carry = carry0
        done = 0
        while done < total:
            carry = segment(done, carry)
            done = min(done + snapshot_every, total)
            snapshots.append((cfg.num_timesteps - 1 - done, batch_of(carry)))
        return batch_of(carry), snapshots
