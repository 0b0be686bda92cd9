"""CLI and IO integration tests: train -> checkpoint -> generate -> save/load
-> visualize, plus the equivariance-mode dataset builder."""

import os

import numpy as np
import pytest

from arreau_tpu.inference.io import (
    SampleResult,
    concat_results,
    load_sample_results,
    save_sample_results,
)


TINY_TRAIN_ARGS = [
    "--dataset", "synthetic", "--synthetic_size", "60",
    "--epochs", "2", "--val_interval", "1",
    "--batch_size", "8", "--hidden_dim", "8", "--basis_dim", "8",
    "--layers", "1", "--num_ori", "4", "--num_timesteps", "20",
    "--max_neighbors", "4", "--degree", "2",
]


pytestmark = pytest.mark.slow  # full-CLI integration runs

@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from arreau_tpu.cli.train_diffusion import main

    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    loss = main(TINY_TRAIN_ARGS + ["--checkpoint_dir", ckpt_dir, "--ema", "0.99"])
    assert np.isfinite(loss)
    return ckpt_dir


def test_train_cli_model_parallel(tmp_path):
    """--model_parallel 2 e2e on the 8-device CPU mesh: the CLI builds the
    (data, model) mesh, Megatron-shards the state, binds the Pallas
    kernel-partitioning context, and trains to a finite loss."""
    from arreau_tpu.cli.train_diffusion import main

    ckpt_dir = str(tmp_path / "ckpt_tp")
    loss = main(TINY_TRAIN_ARGS + [
        "--checkpoint_dir", ckpt_dir, "--model_parallel", "2",
    ])
    assert np.isfinite(loss)


def test_train_writes_self_describing_checkpoint(trained_ckpt):
    from arreau_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(trained_ckpt)
    assert ckpt.has("last") and ckpt.has("best")
    meta = ckpt.load_meta()
    assert meta["config"]["hidden_dim"] == 8
    assert meta["z_table_zs"][-1] == 2001  # MASK rides along


def test_generate_from_checkpoint(trained_ckpt, tmp_path):
    from arreau_tpu.cli.generate import main

    out_dir = str(tmp_path / "gen")
    res = main([
        "--checkpoint_dir", trained_ckpt, "--num_crystals", "3",
        "--batch_size", "2", "--num_atoms_per_sample", "3",
        "--out_dir", out_dir, "--visualize", "True",
    ])
    assert res.num_crystals == 3
    assert len(res.atomic_numbers) == 9
    back = load_sample_results(os.path.join(out_dir, "crystals.h5"))
    np.testing.assert_allclose(back.frac_x, res.frac_x)
    np.testing.assert_array_equal(back.atomic_numbers, res.atomic_numbers)
    assert os.path.exists(os.path.join(out_dir, "crystal_0.png"))


def test_generate_constant_atoms(trained_ckpt, tmp_path):
    from arreau_tpu.cli.generate import main

    res = main([
        "--checkpoint_dir", trained_ckpt, "--num_crystals", "2",
        "--batch_size", "2", "--out_dir", str(tmp_path / "g2"),
        "--constant_atomic_symbols", "C,C,O",
    ])
    assert set(res.atomic_numbers) == {6, 8}
    assert (res.num_atoms == 3).all()


def test_sample_result_roundtrip(tmp_path):
    r1 = SampleResult(
        frac_x=np.random.rand(5, 3),
        atomic_numbers=np.array([1, 6, 8, 8, 26]),
        lattice=np.random.rand(2, 3, 3),
        idx_start=np.array([0, 2]),
        num_atoms=np.array([2, 3]),
    )
    path = str(tmp_path / "s.h5")
    save_sample_results(path, r1)
    r2 = load_sample_results(path)
    np.testing.assert_allclose(r2.frac_x, r1.frac_x)
    frac, zs, lat = r2.crystal(1)
    assert len(frac) == 3 and list(zs) == [8, 8, 26]

    cat = concat_results([r1, r1])
    assert cat.num_crystals == 4
    np.testing.assert_array_equal(cat.idx_start, [0, 2, 5, 7])


def test_equivariance_dataset_builder(tmp_path):
    from arreau_tpu.exploration.verify_equivariance import build_equivariance_datasets

    ds, splits, z_table, t = build_equivariance_datasets(str(tmp_path))
    assert len(ds) == 2
    assert t == 5
    # same atoms, rotated lattice with identical lengths/angles
    n0 = ds.packed.offsets[1]
    np.testing.assert_array_equal(
        ds.packed.atomic_numbers[:n0], ds.packed.atomic_numbers[n0:]
    )
    l0, l1 = ds.packed.lattices
    np.testing.assert_allclose(
        np.linalg.norm(l0, axis=-1), np.linalg.norm(l1, axis=-1), rtol=1e-12
    )
    assert not np.allclose(l0, l1)


def test_gif_assembly(tmp_path):
    from arreau_tpu.inference.visualize import generate_gif, plot_crystal

    d = str(tmp_path)
    for t in (20, 10):
        plot_crystal(
            np.random.rand(3, 3), np.array([6, 8, 1]), np.eye(3) * 4,
            os.path.join(d, f"step_{t}.png"),
        )
    out = os.path.join(d, "anim.gif")
    generate_gif(d, out, prefix="step")
    assert os.path.getsize(out) > 100


def test_train_resume_restores_step(tmp_path):
    """Preemption-safe resume: a second run with --resume picks up the saved
    state instead of starting from scratch."""
    from arreau_tpu.cli.train_diffusion import main

    ckpt_dir = str(tmp_path / "resume_ckpt")
    args = TINY_TRAIN_ARGS + ["--checkpoint_dir", ckpt_dir, "--buckets", "8,16,24"]
    main(args)
    # second invocation resumes from 'last' (printed + state restored);
    # it must run to completion without error and keep the checkpoint valid
    loss = main(args)
    assert np.isfinite(loss)

    from arreau_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(ckpt_dir)
    raw = ckpt.restore_raw("last")
    step = raw[0] if isinstance(raw, (list, tuple)) else raw["step"]
    assert int(np.asarray(step)) > 0


def test_cli_bool_parsers():
    """CLI boolean/optional knobs accept case-insensitive spellings and
    reject garbage with an argparse error instead of eval() surprises."""
    import pytest

    from arreau_tpu.cli.common import parse_bool, parse_opt_bool, parse_opt_float
    from arreau_tpu.cli.train_diffusion import parse_args as diffusion_args
    from arreau_tpu.cli.train_nbody import parse_args as nbody_args

    assert parse_bool("true") is True and parse_bool("False") is False
    assert parse_opt_bool("None") is None and parse_opt_bool("TRUE") is True
    assert parse_opt_float("none") is None and parse_opt_float("5.0") == 5.0

    args = diffusion_args(["--train_augm", "true", "--resume", "FALSE"])
    assert args.train_augm is True and args.resume is False
    args = nbody_args(["--radius", "None", "--scan_epoch", "false"])
    assert args.radius is None and args.scan_epoch is False
    with pytest.raises(SystemExit):
        diffusion_args(["--debug_nans", "maybe"])
    with pytest.raises(SystemExit):
        nbody_args(["--radius", "wide"])
