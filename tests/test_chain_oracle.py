"""Chain-level sampler parity against the reference's own reverse loop
(VERDICT r4 item 3b / Missing #4).

Single reverse steps are oracle-tested in test_reference_oracle.py; this
tier composes them: the reference's T-step ancestral loop
(/root/reference/diffusion/diffusion_loss.py:318-365 — update ordering,
lengths -> lattice rebuild each step, mod-1 wrap points, the D3PM gumbel
damping at t=1) is spelled out here in torch, executing the reference's OWN
``VP_lattice.reverse_given_x0`` / ``VE_pbc.reverse`` / ``D3PM.reverse``
modules, and driven by the SAME deterministic mock score function and the
SAME noise draws as ``DiffusionModel._sample_impl``'s ``fori_loop``. Final
states must match: this separates "our chain is the reference's chain" from
"the model is miscalibrated" when diagnosing full-chain drift.

Noise discipline: the jax sampler's key chain is replayed on the host
(split(key, 4) for the priors, then per-step split(key, 5) inside the loop
— tasks/diffusion.py ``_sample_impl``/``step``), and the resulting draws are
queued into the torch loop via monkeypatched ``torch.randn_like`` /
``torch.rand`` (the same injection technique as the single-step oracle
tests). The mock score is a pure elementwise function of the chain state, so
any divergence in trajectories is a chain-composition difference, not model
noise.
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

from arreau_tpu.data.atoms import AtomicNumberTable  # noqa: E402
from arreau_tpu.tasks.diffusion import DiffusionConfig, DiffusionModel  # noqa: E402

T_STEPS = 60
B, A, C = 4, 4, 6


def _mock_scores_jnp(frac, types_onehot, t, num_atoms, lengths, angles):
    """Deterministic state-dependent mock of predict_scores (jnp side)."""
    tn = (t / T_STEPS).astype(frac.dtype)[:, None, None]
    pred_eps = 0.1 * jnp.sin(3.0 * frac + tn)
    s = jnp.sum(frac, axis=-1, keepdims=True)  # [B, A, 1]
    cl = jnp.arange(C, dtype=frac.dtype)[None, None, :] + 1.0
    logits = jnp.sin(s * cl) + 0.3 * types_onehot
    pred_len = 0.2 * jnp.tanh(lengths) + 0.1 * jnp.cos(tn[:, :, 0])
    return pred_eps, logits, pred_len


def _mock_scores_torch(frac_p, types_onehot_p, t_atom_p, lengths, B_, A_):
    """Identical math on the packed torch layout ([N,3]/[N,C] like the
    reference loop)."""
    frac = frac_p.reshape(B_, A_, 3)
    tn = (t_atom_p.reshape(B_, A_)[:, :1].double() / T_STEPS)[:, :, None]  # [B,1,1]
    pred_eps = 0.1 * torch.sin(3.0 * frac + tn)
    s = frac.sum(dim=-1, keepdim=True)
    cl = torch.arange(C, dtype=frac.dtype)[None, None, :] + 1.0
    logits = torch.sin(s * cl) + 0.3 * types_onehot_p.reshape(B_, A_, C)
    pred_len = 0.2 * torch.tanh(lengths) + 0.1 * torch.cos(tn[:, 0, :])
    return (
        pred_eps.reshape(B_ * A_, 3),
        logits.reshape(B_ * A_, C),
        pred_len,
    )


class _Queues:
    """Pop-in-order queues for the torch loop's noise draws."""

    def __init__(self):
        self.randn = []  # consumed by torch.randn_like
        self.rand = []  # consumed by torch.rand

    def pop_randn(self, like):
        arr = self.randn.pop(0)
        t = torch.as_tensor(arr).reshape(like.shape)
        return t

    def pop_rand(self, *shape):
        arr = self.rand.pop(0)
        return torch.as_tensor(arr).reshape(*shape)


@pytest.fixture(autouse=True)
def _torch_fp64():
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def test_full_reverse_chain_matches_reference_loop(monkeypatch):
    z_table = AtomicNumberTable([1, 6, 8, 14, 26, 2001])
    assert len(z_table) == C
    cfg = DiffusionConfig(
        num_atomic_states=C, num_timesteps=T_STEPS, radius=5.0, max_neighbors=4,
        hidden_dim=8, basis_dim=8, degree=2, num_layers=1, num_ori=4, remat=False,
    )
    model = DiffusionModel(cfg, dtype=jnp.float64)
    # bypass the backbone with the deterministic mock (predict_scores is an
    # instance method; _sample_impl reads it through self)
    model.predict_scores = lambda params, frac, oh, t, n, lengths, ang, m: (
        _mock_scores_jnp(frac, oh, t, n, lengths, ang)
    )

    # Run the chain ON the reference's own tables (the single-step oracle
    # policy, test_reference_oracle.py): the reference builds its VP buffers
    # with a hardcoded fp32 arange (diffusion_helpers.py:140), so fp64-built
    # tables differ at fp32 resolution (~1e-6 per step on lengths) — table
    # parity is asserted separately; HERE the step composition is the thing
    # under test, so both chains must read identical tables.
    vp_ref = ref_dh.VP_lattice(num_steps=T_STEPS, power=2, clipmax=0.999).double()
    ve_ref = ref_dh.VE_pbc(T_STEPS, sigma_min=0.001, sigma_max=1.0)
    d3pm_ref = RefD3PM(x0_model=None, n_T=T_STEPS, num_classes=C, forward_type="mask")
    from arreau_tpu.diffusion.d3pm import D3PMTables
    from arreau_tpu.diffusion.ve import VESchedule
    from arreau_tpu.diffusion.vp import VPSchedule

    model.vp = VPSchedule(
        alpha_bars=jnp.asarray(vp_ref.alpha_bars.numpy(), jnp.float64),
        betas=jnp.asarray(vp_ref.betas.numpy(), jnp.float64),
        sigmas=jnp.asarray(vp_ref.sigmas.numpy(), jnp.float64),
    )
    model.ve = VESchedule(sigmas=jnp.asarray(ve_ref.sigmas.numpy(), jnp.float64))
    model.d3pm = D3PMTables(
        q_one_step_transposed=jnp.asarray(
            d3pm_ref.q_one_step_transposed.numpy(), jnp.float64
        ),
        q_mats=jnp.asarray(d3pm_ref.q_mats.numpy(), jnp.float64),
        hybrid_loss_coeff=float(d3pm_ref.hybrid_loss_coeff),
    )

    key = jax.random.PRNGKey(123)
    out = model._sample_impl(None, key, B, A)

    # ---- replay the sampler's key chain on the host --------------------
    from arreau_tpu.ops.lattice import sample_bravais_angles

    k_ang, k_len, k_frac, k_loop = jax.random.split(key, 4)
    angles = np.asarray(sample_bravais_angles(k_ang, "monoclinic", B))
    lengths0 = np.asarray(jax.random.normal(k_len, (B, 3), jnp.float64))
    frac0 = np.asarray(jax.random.normal(k_frac, (B, A, 3), jnp.float64)) * 1.0

    queues = _Queues()
    kk = k_loop
    for i in range(T_STEPS - 1):
        kk, k_lat, k_pos, k_type, _k_ang2 = jax.random.split(kk, 5)
        queues.randn.append(np.asarray(jax.random.normal(k_lat, (B, 3), jnp.float64)))
        queues.randn.append(
            np.asarray(jax.random.normal(k_pos, (B, A, 3), jnp.float64))
        )
        queues.rand.append(
            np.asarray(
                jax.random.uniform(
                    k_type, (B, A, C), dtype=jnp.float64, minval=0.0, maxval=1.0
                )
            )
        )

    # ---- the reference's own loop (diffusion_loss.py:318-365) ----------
    monkeypatch.setattr(torch, "randn_like", lambda x: queues.pop_randn(x))
    monkeypatch.setattr(torch, "rand", lambda *s, **kw: queues.pop_rand(*s))

    vp, ve, d3pm = vp_ref, ve_ref, d3pm_ref

    num_atoms = torch.full((B,), A)
    t_angles = torch.as_tensor(angles)
    lengths = torch.as_tensor(lengths0)
    frac_x = torch.as_tensor(frac0.reshape(B * A, 3))
    atom_types = torch.full((B * A,), C - 1)

    for timestep in reversed(range(1, T_STEPS)):
        t = torch.full((B * A,), timestep)
        timestep_vec = torch.tensor([timestep])
        score_frac, score_types, pred_len0 = _mock_scores_torch(
            frac_x, F.one_hot(atom_types, C).double(), t, lengths, B, A
        )
        pred_lengths_scaled = pred_len0 * num_atoms.unsqueeze(-1)
        lengths = vp.reverse_given_x0(lengths, pred_lengths_scaled, timestep_vec)
        lattice = ref_lh.lattice_from_params(lengths, t_angles)
        frac_x = ve.reverse(frac_x, score_frac, t, lattice, num_atoms)
        atom_types = d3pm.reverse(atom_types, score_types, t)

    assert not queues.randn and not queues.rand, "draw queues not fully consumed"

    # ---- parity --------------------------------------------------------
    # Types must match EXACTLY (same posterior logits + same gumbel draws).
    # Continuous channels tolerate the 1-ulp differences between XLA's and
    # libm's transcendentals inside the (shared-formula) mock, amplified by
    # 59 steps of state feedback — measured ~3.5e-9 absolute.
    np.testing.assert_array_equal(
        np.asarray(out.atom_types).reshape(-1), atom_types.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out.frac_x).reshape(-1, 3), frac_x.numpy(), rtol=1e-7, atol=1e-8
    )
    final_lattice = ref_lh.lattice_from_params(lengths, t_angles)
    np.testing.assert_allclose(
        np.asarray(out.lattice), final_lattice.numpy(), rtol=1e-7, atol=1e-8
    )
