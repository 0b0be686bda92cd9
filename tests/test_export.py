"""Serving export: sampler -> StableHLO artifact -> deserialize -> same crystals.

The exported artifact must reproduce the in-process sampler exactly (same
platform, same seed) and be callable through nothing but jax.export —
the serving-host contract documented in arreau_tpu/inference/export.py.
"""

import json

import numpy as np


def _tiny_checkpoint(tmp_path):
    """Init (untrained) tiny diffusion model and save a loadable checkpoint."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.atoms import AtomicNumberTable
    from arreau_tpu.data.crystal import CrystalBatch
    from arreau_tpu.tasks.diffusion import DiffusionConfig, DiffusionModel
    from arreau_tpu.train.checkpoint import CheckpointManager, diffusion_meta
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    cfg = DiffusionConfig(
        num_atomic_states=4, num_timesteps=12, hidden_dim=8, basis_dim=8,
        num_layers=2, num_ori=4,
    )
    model = DiffusionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        CrystalBatch(
            frac_x=jnp.zeros((1, 2, 3)), atom_types=jnp.zeros((1, 2), jnp.int32),
            lattice=jnp.broadcast_to(jnp.eye(3) * 4.0, (1, 3, 3)),
            num_atoms=jnp.full((1,), 2), atom_mask=jnp.ones((1, 2), bool),
        ),
    )
    z = AtomicNumberTable([1, 6, 8, 2001])
    d = str(tmp_path / "ckpt")
    ck = CheckpointManager(d, meta=diffusion_meta(cfg, z))
    ck.save(create_train_state(params, make_optimizer(1e-3), ema_decay=0.999), "best")
    return d, model, params


def test_export_roundtrip_matches_sampler(tmp_path):
    import jax

    from arreau_tpu.inference.export import export_sampler, load_exported

    ckpt_dir, model, params = _tiny_checkpoint(tmp_path)
    out = str(tmp_path / "sampler.stablehlo")
    sidecar = export_sampler(
        ckpt_dir, out, tag="best", use_ema=False, batch_size=3,
        num_atoms_per_sample=2, sample_steps=5,
    )
    assert sidecar["batch_size"] == 3 and sidecar["bytes"] > 0
    assert json.load(open(out + ".json"))["z_table_zs"] == [1, 6, 8, 2001]

    call, sc = load_exported(out)
    frac, types, lattice = call(np.int32(7))
    assert frac.shape == (3, 2, 3) and types.shape == (3, 2) and lattice.shape == (3, 3, 3)

    # exact agreement with the in-process sampler on the same platform + seed
    ref = model.sample(
        params, jax.random.PRNGKey(7), num_samples=3, num_atoms_per_sample=2,
        sample_steps=5,
    )
    np.testing.assert_allclose(np.asarray(frac), np.asarray(ref.frac_x), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(types), np.asarray(ref.atom_types))
    np.testing.assert_allclose(np.asarray(lattice), np.asarray(ref.lattice), rtol=1e-5, atol=1e-5)


def test_export_variable_num_atoms_roundtrip(tmp_path):
    """Size-matched serving variant: the artifact takes per-crystal counts
    and reproduces the in-process sampler exactly; padded slots masked."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.inference.export import export_sampler, load_exported

    ckpt_dir, model, params = _tiny_checkpoint(tmp_path)
    out = str(tmp_path / "sampler_var.stablehlo")
    sidecar = export_sampler(
        ckpt_dir, out, tag="best", use_ema=False, batch_size=3,
        num_atoms_per_sample=4, sample_steps=5, variable_num_atoms=True,
    )
    assert sidecar["variable_num_atoms"] is True
    assert "num_atoms: int32[B]" in sidecar["calling_convention"]

    call, _ = load_exported(out)
    counts = np.asarray([2, 4, 3], np.int32)
    frac, types, lattice = call(np.int32(9), counts)
    assert frac.shape == (3, 4, 3)

    ref = model.sample(
        params, jax.random.PRNGKey(9), num_samples=3, num_atoms_per_sample=4,
        sample_steps=5, num_atoms=jnp.asarray(counts),
    )
    np.testing.assert_allclose(np.asarray(frac), np.asarray(ref.frac_x), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(types), np.asarray(ref.atom_types))
    np.testing.assert_array_equal(np.asarray(ref.num_atoms), counts)


def test_export_cli(tmp_path):
    from arreau_tpu.cli.export_sampler import main

    ckpt_dir, _, _ = _tiny_checkpoint(tmp_path)
    out = str(tmp_path / "art.bin")
    main([
        "--checkpoint_dir", ckpt_dir, "--tag", "best", "--use_ema", "False",
        "--batch_size", "2", "--num_atoms_per_sample", "2", "--out", out,
    ])
    from arreau_tpu.inference.export import load_exported

    call, sidecar = load_exported(out)
    frac, types, lattice = call(np.int32(0))
    assert frac.shape == (2, 2, 3)
    # default serving point is S=100 (BASELINE.md round-4 quality ladder)
    assert sidecar["sample_steps"] == 100

    out2 = str(tmp_path / "art_full.bin")
    main([
        "--checkpoint_dir", ckpt_dir, "--tag", "best", "--use_ema", "False",
        "--batch_size", "2", "--num_atoms_per_sample", "2", "--out", out2,
        "--sample_steps", "0",
    ])
    _, sidecar_full = load_exported(out2)
    assert sidecar_full["sample_steps"] is None  # full chain
