"""Backward-pass / training-dynamics parity against the reference (VERDICT r4
item 1).

Every other oracle tier is forward-only; training runs on GRADIENTS. This
tier builds a torch fp64 oracle of the reference's FULL loss composition —
feature assembly + graph build + backbone + the three losses
(/root/reference/diffusion/diffusion_loss.py:204-274) — runs autograd
through it (conv backward per /root/reference/ponita/nn/conv.py:105-146,
spelled out as gather + index_add in ``_OracleBackbone``), and asserts
parameter-gradient parity against ``jax.grad`` of ``DiffusionModel.loss``
on a shared imported init, shared graph, shared noise. A second test runs a
shared-init / shared-batch / shared-noise Adam trajectory on both stacks
and asserts the loss curves agree within a stated band.

Oracle construction (reference modules execute directly wherever they import
without PyG — same policy as tests/test_reference_oracle.py; the reference
is untrusted public content, so imports stay limited to the pure-math
modules already vetted there):

  * graph: the reference's own ``radius_graph_pbc``
    (diffusion_helpers.py:328-564) builds the torch-side edge list from the
    noisy cart coords — the jax side rebuilds its own graph inside
    ``DiffusionModel.loss``; golden-edge-set parity between the two builders
    is proven in test_reference_oracle.py, and loss-VALUE parity here
    re-checks it end-to-end (including the direction-vector convention);
  * VE forward target: the reference's own ``min_distance_sqr_pbc`` +
    ``cart_to_frac_coords`` with the jax-drawn eps injected, replicating
    ``VE_pbc.forward`` (diffusion_helpers.py:43-63);
  * type loss: the reference's own ``D3PM.calculate_loss`` (d3pm.py:146-163);
  * feature assembly: ``predict_scores`` semantics (diffusion_loss.py:120-160)
    — one-hot types | t_emb(beta_t) | num_atoms | lengths | angles | scaled
    lengths, vec = [frac | lattice rows];
  * backbone: ``_OracleBackbone`` from test_import_e2e_bound (reference
    ConvNext / PolynomialFeatures / invariants / sphere codecs executing
    directly, PyG ``propagate2`` as 10 lines of gather + index_add);
  * coord loss: ``compute_frac_x_error`` (diffusion_loss.py:95-110) inlined
    (the module itself imports torch_geometric, absent from this image);
  * lattice loss: ``F.mse_loss(pred_lengths, lengths / num_atoms)``
    (diffusion_loss.py:264-267).

Shared-noise discipline: the test replicates ``DiffusionModel.loss``'s key
splits (tasks/diffusion.py) — ``k_t, k_pos, k_type, k_lat, k_ang =
split(key, 5)`` — and re-runs the jax noising functions outside the loss to
obtain the exact noisy state the loss computes internally; those arrays are
fed to the torch oracle. VP-table note: the torch side evaluates beta_t
from OUR fp64 VP table (oracle-tested vs the reference's fp32-built table
at fp32 resolution in test_reference_oracle.py) so the t-embedding input is
bit-identical; everything else runs the reference's own fp64 tables.

Documented tolerance floor: the flax backbone pins its activation stream to
f32 (models/ponita.py embedder cast) even under x64, so parity bottoms out
near f32 resolution — the same floor the forward e2e bound measured
(~1e-8 rel). Gradients are asserted at 2e-5 relative per parameter
(measured ~1e-7..1e-6); the erf-GELU leg bounds the importer's documented
tanh-GELU approximation on gradients at 5e-3.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

from diffusion import diffusion_helpers as ref_dh  # noqa: E402
from diffusion import lattice_helpers as ref_lh  # noqa: E402
from diffusion.d3pm import D3PM as RefD3PM  # noqa: E402
from torch.nn import functional as F  # noqa: E402

import test_torch_import as tti  # noqa: E402
from test_import_e2e_bound import _OracleBackbone  # noqa: E402

from arreau_tpu.diffusion.d3pm import d3pm_sample_xt  # noqa: E402
from arreau_tpu.diffusion.ve import ve_forward_pbc  # noqa: E402
from arreau_tpu.diffusion.vp import vp_forward  # noqa: E402
from arreau_tpu.interop.torch_import import convert_state_dict  # noqa: E402
from arreau_tpu.ops.lattice import matrix_to_params  # noqa: E402
from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel  # noqa: E402

H, BD, L, O, S, T = tti.H, tti.BD, tti.L, tti.O, tti.S, tti.T
B, A = 3, 6
NUM_ATOMS = np.array([4, 6, 5])


@pytest.fixture(autouse=True)
def _torch_fp64():
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def _make_model(sd_np) -> tuple[DiffusionModel, dict]:
    cfg = DiffusionConfig(
        num_atomic_states=S, num_timesteps=T, radius=5.0, max_neighbors=8,
        hidden_dim=H, basis_dim=BD, degree=3, num_layers=L, num_ori=O,
        widening_factor=4, layer_scale=1e-6, multiple_readouts=True,
        remat=False,
    )
    dmodel = DiffusionModel(cfg, dtype=jnp.float64)
    params, fourier_w, _ = convert_state_dict(sd_np, L)
    # the imported init carries its own Fourier frequencies (interop contract)
    dmodel.fourier_w = jnp.asarray(fourier_w, jnp.float64)
    dmodel.ori_grid = dmodel.ori_grid.astype(jnp.float64)
    params64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    return dmodel, params64


def _make_batch(seed=0) -> CrystalBatch:
    rng = np.random.default_rng(seed)
    lengths = rng.uniform(5.0, 8.0, (B, 3))
    angles = np.deg2rad(rng.uniform(75, 105, (B, 3)))
    from arreau_tpu.ops.lattice import lattice_from_params

    lattice = np.asarray(lattice_from_params(jnp.asarray(lengths), jnp.asarray(angles)))
    frac = rng.uniform(0, 1, (B, A, 3))
    mask = np.arange(A)[None, :] < NUM_ATOMS[:, None]
    types = rng.integers(0, S - 1, (B, A))  # never MASK in the clean data
    return CrystalBatch(
        frac_x=jnp.asarray(frac, jnp.float64),
        atom_types=jnp.asarray(types, jnp.int32),
        lattice=jnp.asarray(lattice, jnp.float64),
        num_atoms=jnp.asarray(NUM_ATOMS, jnp.int32),
        atom_mask=jnp.asarray(mask),
    )


def _pack(x, mask):
    """Dense [B, A, ...] -> packed [N, ...] over real atoms."""
    x = np.asarray(x)
    return np.concatenate([x[b, mask[b]] for b in range(x.shape[0])], axis=0)


class _TorchLossOracle:
    """The reference's whole train-step loss in torch fp64 on packed arrays."""

    def __init__(self, sd_torch, act, vp_betas, fourier_w):
        self.net = _OracleBackbone(act).double()
        stripped = {
            k[len("model."):]: v.double()
            for k, v in sd_torch.items()
            if k.startswith("model.")
        }
        missing, unexpected = self.net.load_state_dict(stripped, strict=False)
        assert not unexpected, unexpected
        self.d3pm = RefD3PM(x0_model=None, n_T=T, num_classes=S, forward_type="mask")
        self.ve = ref_dh.VE_pbc(T, sigma_min=0.001, sigma_max=1.0)
        self.vp_betas = torch.as_tensor(np.asarray(vp_betas, np.float64))
        self.fourier_w = torch.as_tensor(np.asarray(fourier_w, np.float64))

    def parameters(self):
        return self.net.parameters()

    def ve_forward(self, frac0_p, eps_p, t_atom_p, lattice0, num_atoms):
        """``VE_pbc.forward`` (diffusion_helpers.py:43-63) with eps injected."""
        sigmas = self.ve.sigmas[t_atom_p].view(-1, 1)
        frac_noisy = (frac0_p + eps_p * sigmas) % 1
        n = torch.as_tensor(num_atoms)
        cart_noisy = ref_dh.frac_to_cart_coords(frac_noisy, lattice0, n)
        cart_p = ref_dh.frac_to_cart_coords(frac0_p, lattice0, n)
        _, min_vec = ref_dh.min_distance_sqr_pbc(
            cart_noisy, cart_p, lattice0, n, "cpu", return_vector=True
        )
        return frac_noisy, ref_dh.cart_to_frac_coords(min_vec, lattice0, n)

    def loss(
        self, frac0_p, types0_p, lattice0, num_atoms, eps_p,
        noisy_types_p, noisy_lengths, t_int,
    ):
        n = torch.as_tensor(num_atoms)
        batch_vec = torch.repeat_interleave(torch.arange(len(num_atoms)), n)
        t_atom_p = torch.repeat_interleave(
            torch.as_tensor(t_int, dtype=torch.long), n
        )
        lengths, angles = ref_lh.matrix_to_params(lattice0)

        noisy_frac_p, target_eps_p = self.ve_forward(
            frac0_p, eps_p, t_atom_p, lattice0, num_atoms
        )

        # ---- predict_scores feature assembly (diffusion_loss.py:120-160) ---
        noisy_lattice = ref_lh.lattice_from_params(noisy_lengths, angles)
        beta = self.vp_betas[t_atom_p].view(-1, 1)
        proj = beta * self.fourier_w[None, :] * 2 * np.pi
        t_emb = torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)
        scaled_lengths = (noisy_lengths / n.unsqueeze(-1)).abs()
        scalar = torch.cat(
            [
                F.one_hot(noisy_types_p, S).double(),
                t_emb,
                torch.repeat_interleave(n.double().unsqueeze(-1), n, dim=0),
                torch.repeat_interleave(noisy_lengths, n, dim=0),
                torch.repeat_interleave(angles, n, dim=0),
                torch.repeat_interleave(scaled_lengths, n, dim=0),
            ],
            dim=1,
        )
        noisy_cart = ref_dh.frac_to_cart_coords(noisy_frac_p, noisy_lattice, n)
        lattice_feat = torch.repeat_interleave(noisy_lattice, n, dim=0)
        vec = torch.cat([noisy_frac_p.unsqueeze(1), lattice_feat], dim=1)

        edge_index, _offsets, _nbrs, dists, directions = ref_dh.radius_graph_pbc(
            noisy_cart, noisy_lattice, n, 5.0, 8, "cpu", remove_self_edges=True
        )
        edge_batch = batch_vec[edge_index[0]]

        logits, pred_eps, pred_lengths = self.net(
            scalar, vec, edge_index, directions, dists, noisy_lattice,
            edge_batch, self.ori_grid, batch_vec, len(num_atoms),
        )
        pred_eps = pred_eps.squeeze(1)

        # ---- the three losses (diffusion_loss.py:251-274) ------------------
        diff = torch.clamp(
            torch.remainder((pred_eps - target_eps_p).abs(), 1), min=0, max=1
        )
        wrapped = torch.min(diff, 1 - diff)
        error_frac = torch.mean(torch.sum(wrapped**2, dim=1))

        error_type = self.d3pm.calculate_loss(
            types0_p, logits, noisy_types_p, t_atom_p
        )
        target_lengths = lengths / n.unsqueeze(-1)
        error_lattice = F.mse_loss(pred_lengths, target_lengths)
        total = error_frac + error_type + error_lattice
        return total, dict(
            loss_coord=error_frac, loss_type=error_type, loss_lattice=error_lattice
        )


def _shared_noisy_state(dmodel, batch, key, t_int):
    """Replicate DiffusionModel.loss's internal noising (same key splits) to
    obtain the exact noisy state / noise draws it computes inside."""
    _k_t, k_pos, k_type, k_lat, _k_ang = jax.random.split(key, 5)
    Bb, Aa, _ = batch.frac_x.shape
    t = jnp.full((Bb,), t_int, jnp.int32)
    t_atom = jnp.broadcast_to(t[:, None], (Bb, Aa))
    eps = jax.random.normal(k_pos, batch.frac_x.shape, dtype=batch.frac_x.dtype)
    noisy_frac, target_eps, _ = ve_forward_pbc(
        dmodel.ve, k_pos, batch.frac_x, t, batch.lattice
    )
    noisy_types = d3pm_sample_xt(dmodel.d3pm, k_type, batch.atom_types, t_atom)
    lengths, _ = matrix_to_params(batch.lattice)
    noisy_lengths, _ = vp_forward(dmodel.vp, k_lat, lengths, t)
    return eps, noisy_frac, target_eps, noisy_types, noisy_lengths


def _grad_pairs(g, gt, num_layers):
    """(name, jax_grad, torch_grad) triplets via the importer's key mapping
    (interop/torch_import.py:121-166)."""
    out = []

    def dense(flax_d, prefix, bias=True):
        out.append((f"{prefix}.weight", flax_d["kernel"].T, gt[f"{prefix}.weight"]))
        if bias:
            out.append((f"{prefix}.bias", flax_d["bias"], gt[f"{prefix}.bias"]))

    for ours, theirs in (("basis_fn", "basis_fn"), ("fiber_basis_fn", "fiber_basis_fn")):
        dense(g[ours]["dense_in"], f"{theirs}.1")
        dense(g[ours]["dense_out"], f"{theirs}.3")
    out.append(("x_embedder.weight", g["x_embedder"]["kernel"].T, gt["x_embedder.weight"]))
    for i in range(num_layers):
        t_ = f"interaction_layers.{i}"
        layer = g[f"layer_{i}"]
        out.append((f"{t_}.conv.kernel.weight", layer["conv"]["kernel"].T,
                    gt[f"{t_}.conv.kernel.weight"]))
        out.append((f"{t_}.conv.fiber_kernel.weight",
                    layer["conv"]["fiber_kernel"]["kernel"].T,
                    gt[f"{t_}.conv.fiber_kernel.weight"]))
        out.append((f"{t_}.conv.bias", layer["conv"]["bias"], gt[f"{t_}.conv.bias"]))
        out.append((f"{t_}.norm.weight", layer["norm"]["scale"], gt[f"{t_}.norm.weight"]))
        out.append((f"{t_}.norm.bias", layer["norm"]["bias"], gt[f"{t_}.norm.bias"]))
        dense(layer["linear_1"], f"{t_}.linear_1")
        dense(layer["linear_2"], f"{t_}.linear_2")
        out.append((f"{t_}.layer_scale", layer["layer_scale"], gt[f"{t_}.layer_scale"]))
        dense(g[f"readout_{i}"], f"read_out_layers.{i}")
    return out


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


def _torch_grads(oracle, largs):
    for p in oracle.parameters():
        p.grad = None
    total, terms = oracle.loss(*largs)
    total.backward()
    named = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p)).numpy()
        for k, p in oracle.net.named_parameters()
    }
    return total, terms, named


def _build_case(seed=0, t_int=7):
    sd_torch = tti._make_state_dict(seed=3)
    sd_np = {k: v.numpy() for k, v in sd_torch.items()}
    dmodel, params64 = _make_model(sd_np)
    batch = _make_batch(seed)
    key = jax.random.PRNGKey(42 + seed)
    eps, noisy_frac, target_eps, noisy_types, noisy_lengths = _shared_noisy_state(
        dmodel, batch, key, t_int
    )
    mask = np.asarray(batch.atom_mask)
    largs = (
        torch.as_tensor(_pack(batch.frac_x, mask)),
        torch.as_tensor(_pack(batch.atom_types, mask), dtype=torch.long),
        torch.as_tensor(np.asarray(batch.lattice)),
        NUM_ATOMS,
        torch.as_tensor(_pack(eps, mask)),
        torch.as_tensor(_pack(noisy_types, mask), dtype=torch.long),
        torch.as_tensor(np.asarray(noisy_lengths)),
        np.full((B,), t_int),
    )
    return sd_torch, dmodel, params64, batch, key, largs, t_int


def test_parameter_gradient_parity():
    sd_torch, dmodel, params64, batch, key, largs, t_int = _build_case()

    tanh = torch.nn.GELU(approximate="tanh")
    oracle = _TorchLossOracle(
        sd_torch, tanh, dmodel.vp.betas, dmodel.fourier_w
    )
    oracle.ori_grid = torch.as_tensor(np.asarray(dmodel.ori_grid, np.float64))
    t_total, t_terms, t_grads = _torch_grads(oracle, largs)

    def jloss(p):
        return dmodel.loss(p, key, batch, timestep=t_int)

    (j_total, j_metrics), j_grads = jax.value_and_grad(jloss, has_aux=True)(params64)

    # loss-VALUE parity first (cheap diagnosis when something breaks): this
    # closes the loop on the independently-built graphs + noise injection
    assert abs(float(j_total) - float(t_total)) / abs(float(t_total)) < 1e-6
    for k_mine, k_ref in (
        ("loss_coord", "loss_coord"),
        ("loss_type", "loss_type"),
        ("loss_lattice", "loss_lattice"),
    ):
        mine, ref = float(j_metrics[k_mine]), float(t_terms[k_ref])
        assert abs(mine - ref) / max(abs(ref), 1e-12) < 1e-5, (k_mine, mine, ref)

    # parameter-gradient parity, leaf by leaf through the importer mapping
    worst = ("", 0.0)
    for name, gj, gt_ in _grad_pairs(j_grads["params"], t_grads, L):
        err = _rel(gj, gt_)
        if err > worst[1]:
            worst = (name, err)
        assert err < 2e-5, f"grad mismatch at {name}: rel {err}"
    # keep the measurement visible in -v output
    print(f"worst grad leaf: {worst[0]} rel {worst[1]:.3g}")


def test_parameter_gradient_parity_pallas_kernels():
    """The same torch-oracle gradients, now against jax.grad THROUGH the
    custom-VJP Pallas kernels (use_pallas forced on; interpret mode on CPU).
    This chains torch -> Pallas directly instead of relying on the separate
    torch->XLA and XLA->Pallas bounds. Tolerance admits the kernels' f32
    accumulation (preferred_element_type=f32) under the otherwise-fp64 run."""
    import dataclasses

    sd_torch, dmodel, params64, batch, key, largs, t_int = _build_case()
    cfg_p = dataclasses.replace(dmodel.config, use_pallas=True)
    dmodel_p = DiffusionModel(cfg_p, dtype=jnp.float64)
    dmodel_p.fourier_w = dmodel.fourier_w
    dmodel_p.ori_grid = dmodel.ori_grid

    tanh = torch.nn.GELU(approximate="tanh")
    oracle = _TorchLossOracle(sd_torch, tanh, dmodel.vp.betas, dmodel.fourier_w)
    oracle.ori_grid = torch.as_tensor(np.asarray(dmodel.ori_grid, np.float64))
    t_total, _t_terms, t_grads = _torch_grads(oracle, largs)

    (j_total, _), j_grads = jax.value_and_grad(
        lambda p: dmodel_p.loss(p, key, batch, timestep=t_int), has_aux=True
    )(params64)
    assert abs(float(j_total) - float(t_total)) / abs(float(t_total)) < 1e-5
    worst = ("", 0.0)
    for name, gj, gt_ in _grad_pairs(j_grads["params"], t_grads, L):
        err = _rel(gj, gt_)
        if err > worst[1]:
            worst = (name, err)
        assert err < 5e-4, f"pallas grad mismatch at {name}: rel {err}"
    print(f"worst pallas grad leaf: {worst[0]} rel {worst[1]:.3g}")


def test_parameter_gradient_bound_erf_gelu():
    """The importer's documented tanh-vs-erf GELU approximation, bounded on
    GRADIENTS end to end (the forward bound is 2e-3 in
    test_import_e2e_bound.py)."""
    sd_torch, dmodel, params64, batch, key, largs, t_int = _build_case(seed=1)

    erf = torch.nn.GELU()
    oracle = _TorchLossOracle(sd_torch, erf, dmodel.vp.betas, dmodel.fourier_w)
    oracle.ori_grid = torch.as_tensor(np.asarray(dmodel.ori_grid, np.float64))
    _, _, t_grads = _torch_grads(oracle, largs)

    j_grads = jax.grad(lambda p: dmodel.loss(p, key, batch, timestep=t_int)[0])(
        params64
    )
    for name, gj, gt_ in _grad_pairs(j_grads["params"], t_grads, L):
        err = _rel(gj, gt_)
        assert err < 5e-3, f"erf-GELU grad deviation at {name}: rel {err}"


@pytest.mark.slow
def test_training_trajectory_parity():
    """Shared-init Adam trajectory: 60 optimizer steps on shared batches and
    shared noise, torch fp64 vs the jax step. Reference optimizer semantics:
    torch.optim.Adam with grad-clip 0.5 (main_diffusion.py:297); weight
    decay is 0 here on both sides (the reference default is a coupled-L2
    1e-10 — main_diffusion.py:44 — numerically inert at this horizon, and
    our production optimizer is decoupled AdamW; parity of the *dynamics* is
    what this test pins)."""
    import optax

    from arreau_tpu.train.optim import make_optimizer

    sd_torch = tti._make_state_dict(seed=3)
    sd_np = {k: v.numpy() for k, v in sd_torch.items()}
    dmodel, params64 = _make_model(sd_np)

    tanh = torch.nn.GELU(approximate="tanh")
    oracle = _TorchLossOracle(sd_torch, tanh, dmodel.vp.betas, dmodel.fourier_w)
    oracle.ori_grid = torch.as_tensor(np.asarray(dmodel.ori_grid, np.float64))

    LR = 3e-4
    topt = torch.optim.Adam(oracle.parameters(), lr=LR)
    jopt = make_optimizer(LR, weight_decay=0.0, grad_clip=0.5)
    opt_state = jopt.init(params64)

    @jax.jit
    def jstep(params, opt_state, key, t_arr, batch):
        grads, metrics = jax.grad(
            lambda p: dmodel.loss(p, key, batch, timestep=t_arr),
            has_aux=True,
        )(params)
        updates, opt_state = jopt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics["loss"]

    rng = np.random.default_rng(7)
    params = params64
    losses_j, losses_t = [], []
    N_STEPS = 60
    for step in range(N_STEPS):
        batch_j = _make_batch(seed=step % 4)
        key = jax.random.PRNGKey(1000 + step)
        t_int = int(rng.integers(1, T + 1))
        eps, _nf, _te, noisy_types, noisy_lengths = _shared_noisy_state(
            dmodel, batch_j, key, t_int
        )
        mask = np.asarray(batch_j.atom_mask)
        largs = (
            torch.as_tensor(_pack(batch_j.frac_x, mask)),
            torch.as_tensor(_pack(batch_j.atom_types, mask), dtype=torch.long),
            torch.as_tensor(np.asarray(batch_j.lattice)),
            NUM_ATOMS,
            torch.as_tensor(_pack(eps, mask)),
            torch.as_tensor(_pack(noisy_types, mask), dtype=torch.long),
            torch.as_tensor(np.asarray(noisy_lengths)),
            np.full((B,), t_int),
        )
        topt.zero_grad()
        t_total, _terms = oracle.loss(*largs)
        t_total.backward()
        torch.nn.utils.clip_grad_norm_(list(oracle.parameters()), 0.5)
        topt.step()
        losses_t.append(float(t_total))

        params, opt_state, lj = jstep(
            params, opt_state, key, jnp.asarray(t_int, jnp.int32), batch_j
        )
        losses_j.append(float(lj))

    losses_j = np.asarray(losses_j)
    losses_t = np.asarray(losses_t)
    rel = np.abs(losses_j - losses_t) / np.abs(losses_t)
    # band: per-step grad parity is ~1e-6; 60 steps of Adam amplify the
    # f32-pinned-activation residual, but the trajectories must stay glued
    assert rel.max() < 1e-3, f"trajectory diverged: max rel {rel.max():.3g}"
    # and both stacks actually train (same direction, same magnitude)
    assert losses_j[-10:].mean() < losses_j[:10].mean()
    assert losses_t[-10:].mean() < losses_t[:10].mean()
