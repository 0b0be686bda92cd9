"""Reference-checkpoint import: torch PONITA_DIFFUSION .ckpt -> flax params.

Builds faithful synthetic Lightning checkpoints with real torch tensors and
the reference's exact state_dict key names (lightning_wrappers/diffusion.py +
ponita/models/ponita.py:29-86), then checks the converted tree loads into the
model, matches torch module semantics numerically, and drives end-to-end
through the generate path.
"""

import argparse
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

H, BD, L, O, S, T = 8, 12, 2, 4, 5, 20
ATTR_DIM = 6  # 2 spatial invariants + 4 edge scalars (dist + 3 lattice cosines)
POLY3 = ATTR_DIM + ATTR_DIM**2 + ATTR_DIM**3  # degree-3 tensor-power features
IN_DIM = S + 64 + 1 + 3 + 3 + 3 + 4  # scalar channels + 4 lifted vec channels
OUT = S + 1 + 3  # types + coord-vec + global lengths


def _make_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(prefix, out_f, in_f, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(out_f, in_f, generator=g) * 0.2
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(out_f, generator=g) * 0.1

    lin("model.basis_fn.1", H, POLY3)
    lin("model.basis_fn.3", BD, H)
    lin("model.fiber_basis_fn.1", H, 3)  # poly features of the 1-dim fiber invariant
    lin("model.fiber_basis_fn.3", BD, H)
    lin("model.x_embedder", H, IN_DIM, bias=False)
    for i in range(L):
        t = f"model.interaction_layers.{i}"
        lin(f"{t}.conv.kernel", H, BD, bias=False)
        lin(f"{t}.conv.fiber_kernel", H, BD, bias=False)
        sd[f"{t}.conv.bias"] = torch.randn(H, generator=g) * 0.05
        sd[f"{t}.conv.callibrated"] = torch.tensor(True)  # dropped buffer
        sd[f"{t}.norm.weight"] = torch.ones(H) + torch.randn(H, generator=g) * 0.01
        sd[f"{t}.norm.bias"] = torch.randn(H, generator=g) * 0.01
        lin(f"{t}.linear_1", 4 * H, H)
        lin(f"{t}.linear_2", H, 4 * H)
        sd[f"{t}.layer_scale"] = torch.full((H,), 1e-6)
        lin(f"model.read_out_layers.{i}", OUT, H)
        lin(f"model.edge_readout_layers.{i}", 0, H + 4)  # zero-width, as in the reference
    sd["t_emb.gaussian_fourier_proj_w"] = torch.randn(32, generator=g) * 16.0
    sd["z_table_zs"] = torch.tensor([1, 6, 8, 14, 2001])
    return sd


def _reference_args():
    return argparse.Namespace(
        hidden_dim=H, basis_dim=BD, layers=L, num_ori=O, degree=3,
        num_timesteps=T, radius=5.0, max_neighbors=8, widening_factor=4,
        layer_scale=1e-6, multiple_readouts=True, lr=1e-3, epochs=10,
    )


def _write_ckpt(path, with_alien_object=True):
    """torch.save a Lightning-shaped checkpoint; optionally include an object
    whose class is NOT importable at load time (like the reference's
    AtomicNumberTable), exercising the tolerant unpickler."""
    hyper = {"args": _reference_args()}
    if with_alien_object:
        mod = types.ModuleType("reference_fake_pkg")

        class AtomicNumberTable:
            def __init__(self):
                self.zs = [1, 6, 8, 14, 2001]

        # pickle stores classes by module+qualname; point both at the fake
        # module so dumping works, then make the module unimportable
        AtomicNumberTable.__module__ = "reference_fake_pkg"
        AtomicNumberTable.__qualname__ = "AtomicNumberTable"
        mod.AtomicNumberTable = AtomicNumberTable
        sys.modules["reference_fake_pkg"] = mod
        try:
            hyper["z_table"] = AtomicNumberTable()
            torch.save(
                {"state_dict": _make_state_dict(), "hyper_parameters": hyper,
                 "epoch": 3, "global_step": 123},
                path,
            )
        finally:
            del sys.modules["reference_fake_pkg"]  # unimportable at load time
    else:
        torch.save({"state_dict": _make_state_dict(), "hyper_parameters": hyper}, path)
    return path


def test_tolerant_load_and_args(tmp_path):
    from arreau_tpu.interop.torch_import import load_reference_checkpoint

    path = _write_ckpt(str(tmp_path / "ref.ckpt"))
    sd, args = load_reference_checkpoint(path)
    assert args["hidden_dim"] == H and args["layers"] == L
    assert sd["model.x_embedder.weight"].shape == (H, IN_DIM)
    assert list(sd["z_table_zs"]) == [1, 6, 8, 14, 2001]


def test_convert_tree_matches_model_init(tmp_path):
    import jax

    from arreau_tpu.interop.torch_import import convert_state_dict

    sd = {k: v.numpy() for k, v in _make_state_dict().items()}
    params, fourier_w, z_zs = convert_state_dict(sd, L)
    assert fourier_w.shape == (32,)
    assert list(z_zs) == [1, 6, 8, 14, 2001]
    # torch Linear [out,in] -> flax [in,out]
    assert params["params"]["x_embedder"]["kernel"].shape == (IN_DIM, H)
    np.testing.assert_array_equal(
        params["params"]["layer_0"]["linear_1"]["kernel"],
        sd["model.interaction_layers.0.linear_1.weight"].T,
    )
    # zero-width edge readouts are dropped
    assert "edge_readout_0" not in params["params"]
    # structure identical to a fresh init of the corresponding model
    from arreau_tpu.interop.torch_import import config_from_reference_args
    from arreau_tpu.tasks.diffusion import DiffusionModel

    cfg = config_from_reference_args(vars(_reference_args()), num_atomic_states=S)
    model = DiffusionModel(cfg)
    import jax.numpy as jnp

    from arreau_tpu.data.crystal import CrystalBatch

    template = model.init(
        jax.random.PRNGKey(0),
        CrystalBatch(
            frac_x=jnp.zeros((1, 2, 3)), atom_types=jnp.zeros((1, 2), jnp.int32),
            lattice=jnp.broadcast_to(jnp.eye(3) * 4.0, (1, 3, 3)),
            num_atoms=jnp.full((1,), 2), atom_mask=jnp.ones((1, 2), bool),
        ),
    )
    assert jax.tree.map(lambda x: x.shape, template) == jax.tree.map(
        lambda x: tuple(x.shape), params
    )


def test_basis_mlp_numerical_parity():
    """Converted basis_fn weights reproduce the torch Sequential bit-for-bit
    (up to f32 and tanh-GELU, which both sides use here): PolynomialFeatures
    -> Linear -> GELU -> Linear -> GELU (reference ponita.py:65)."""
    import jax.numpy as jnp

    from arreau_tpu.interop.torch_import import convert_state_dict
    from arreau_tpu.models.blocks import BasisMLP

    sd_t = _make_state_dict()
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params, _, _ = convert_state_dict(sd, L)

    x = torch.randn(7, ATTR_DIM, generator=torch.Generator().manual_seed(1))

    # reference PolynomialFeatures (ponita/nn/embedding.py:4-14): tensor powers
    feats = [x]
    for _ in range(1, 3):
        feats.append(torch.einsum("...i,...j->...ij", feats[-1], x).flatten(-2, -1))
    poly = torch.cat(feats, -1)
    gelu = torch.nn.GELU(approximate="tanh")  # match this package's GELU variant
    h = gelu(poly @ sd_t["model.basis_fn.1.weight"].T + sd_t["model.basis_fn.1.bias"])
    ref_out = gelu(h @ sd_t["model.basis_fn.3.weight"].T + sd_t["model.basis_fn.3.bias"])

    ours = BasisMLP(hidden_dim=H, basis_dim=BD, degree=3).apply(
        {"params": params["params"]["basis_fn"]}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), rtol=2e-5, atol=2e-6)


def test_missing_key_fails_loudly():
    from arreau_tpu.interop.torch_import import convert_state_dict

    sd = {k: v.numpy() for k, v in _make_state_dict().items()}
    del sd["model.interaction_layers.1.norm.weight"]
    with pytest.raises(KeyError, match="interaction_layers.1.norm"):
        convert_state_dict(sd, L)


def test_import_then_generate_e2e(tmp_path):
    """Full path: reference .ckpt -> convert_reference_checkpoint -> the
    generate loader rebuilds the model (incl. the imported Fourier
    frequencies) and samples crystals."""
    import jax

    from arreau_tpu.cli.generate import load_model
    from arreau_tpu.interop.torch_import import convert_reference_checkpoint

    path = _write_ckpt(str(tmp_path / "ref.ckpt"))
    out_dir = str(tmp_path / "imported")
    meta = convert_reference_checkpoint(path, out_dir, tag="best")
    assert meta["config"]["hidden_dim"] == H
    assert len(meta["fourier_w"]) == 32

    model, params, z_table, meta2 = load_model(out_dir, "best", use_ema=False, return_meta=True)
    assert np.allclose(np.asarray(model.fourier_w), np.asarray(meta["fourier_w"]))
    batch = model.sample(
        params, jax.random.PRNGKey(0), num_samples=2, num_atoms_per_sample=3
    )
    assert batch.frac_x.shape == (2, 3, 3)
    assert np.isfinite(np.asarray(batch.lattice)).all()
    assert (np.asarray(batch.atom_types) < S).all()
