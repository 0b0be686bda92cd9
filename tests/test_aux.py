"""Tests for auxiliary components: relaxation, EGNN baseline, calibration,
dataset stats, MNIST data, sampler snapshots, 2D fiber bundle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arreau_tpu.data.mnist import synthetic_shapes
from arreau_tpu.data.synthetic import synthetic_packed
from arreau_tpu.exploration.dataset_stats import compute_stats
from arreau_tpu.inference.relax import relax_soft_sphere
from arreau_tpu.models.egnn import EGNNConfig, EGNNNBody
from arreau_tpu.tasks.mnist import Mnist2DBatch, MnistConfig, MnistModel
from arreau_tpu.tasks.nbody import NBodyBatch


def test_soft_sphere_relax_reduces_energy_and_separates_atoms():
    rng = np.random.default_rng(0)
    B, A = 4, 6
    lattice = jnp.asarray(np.eye(3)[None].repeat(B, 0) * 5.0)
    # start with atoms nearly overlapping
    frac = jnp.asarray(0.5 + rng.normal(scale=0.02, size=(B, A, 3)))
    mask = jnp.ones((B, A), bool)
    out = relax_soft_sphere(frac, lattice, mask, steps=100, lr=0.05)
    assert np.isfinite(np.asarray(out.frac_x)).all()
    e_hist = np.asarray(out.energy_history)
    assert (e_hist[:, -1] <= e_hist[:, 0] + 1e-9).all()
    assert e_hist[:, -1].mean() < e_hist[:, 0].mean() * 0.5


def test_egnn_baseline_learns_nbody():
    rng = np.random.default_rng(1)
    batch = NBodyBatch(
        pos=jnp.asarray(rng.normal(size=(8, 5, 3))),
        vel=jnp.asarray(rng.normal(size=(8, 5, 3))),
        charges=jnp.asarray(rng.choice([-1.0, 1.0], size=(8, 5))),
        target_pos=jnp.asarray(rng.normal(size=(8, 5, 3)) * 0.1),
    )
    model = EGNNNBody(EGNNConfig(hidden_dim=32, num_layers=2))
    params = model.init(jax.random.PRNGKey(0), batch)

    from arreau_tpu.train.loop import make_train_step
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    tx = make_optimizer(5e-3)
    state = create_train_state(params, tx)
    step = make_train_step(model.loss, tx, donate=False)
    losses = []
    key = jax.random.PRNGKey(2)
    for _ in range(40):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, batch)
        losses.append(float(m["mse"]))
    assert losses[-1] < losses[0] * 0.5


def test_egnn_equivariance():
    """EGNN predictions must rotate with the inputs (E(n) equivariance)."""
    from arreau_tpu.ops.grids import random_so3_matrix

    rng = np.random.default_rng(3)
    batch = NBodyBatch(
        pos=jnp.asarray(rng.normal(size=(2, 5, 3))),
        vel=jnp.asarray(rng.normal(size=(2, 5, 3))),
        charges=jnp.asarray(rng.choice([-1.0, 1.0], size=(2, 5))),
        target_pos=jnp.asarray(rng.normal(size=(2, 5, 3))),
    )
    model = EGNNNBody(EGNNConfig(hidden_dim=16, num_layers=2))
    params = model.init(jax.random.PRNGKey(0), batch)
    pred = model.predict_positions(params, batch)
    R = random_so3_matrix(jax.random.PRNGKey(1)).astype(pred.dtype)
    rot_batch = batch._replace(pos=batch.pos @ R.T, vel=batch.vel @ R.T)
    pred_rot = model.predict_positions(params, rot_batch)
    np.testing.assert_allclose(
        np.asarray(pred_rot), np.asarray(pred @ R.T), rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_calibration_normalizes_activations():
    from arreau_tpu.models.calibrate import calibrate_conv_kernels
    from arreau_tpu.models.ponita import PonitaConfig, PonitaFiberBundle
    from tests.test_ponita import _make_inputs

    cfg = PonitaConfig(
        hidden_dim=16, basis_dim=8, degree=2, num_layers=2, radius=4.0,
        num_ori=4, output_dim_scalar=2, output_dim_vec=0,
        output_dim_global_scalar=0, output_dim_global_vec=0,
        output_dim_edge_scalar=0, remat=False, use_pallas=False,
    )
    inputs, _ = _make_inputs(jax.random.PRNGKey(0), cfg=cfg)
    model = PonitaFiberBundle(cfg)
    params = model.init(jax.random.PRNGKey(1), inputs)
    new_params, stds = calibrate_conv_kernels(model.apply, params, inputs)
    assert any(k.endswith("__call__") for k in stds)
    # rescaled kernels differ from originals
    import flax.traverse_util as tu

    a = tu.flatten_dict(params["params"], sep="/")
    b = tu.flatten_dict(new_params["params"], sep="/")
    changed = [k for k in a if k.endswith("conv/kernel") and not np.allclose(a[k], b[k])]
    assert changed
    # model still runs
    out = model.apply(new_params, inputs)
    assert np.isfinite(np.asarray(out.node_scalar)).all()


def test_dataset_stats():
    ds = synthetic_packed(100, seed=0)
    stats = compute_stats(ds.packed)
    assert stats["num_crystals"] == 100
    assert 0 < stats["avg_density"] < 1
    assert stats["largest_system"] <= 24
    assert sum(stats["atom_histogram"].values()) == 100


def test_mnist_2d_model_runs():
    ex = synthetic_shapes(8, seed=0, num_nodes=12)
    cfg = MnistConfig(hidden_dim=16, basis_dim=16, degree=2, num_layers=2, num_ori=4, max_neighbors=4)
    model = MnistModel(cfg, dtype=jnp.float64)
    batch = Mnist2DBatch(
        pos=jnp.asarray(ex.pos, jnp.float64),
        value=jnp.asarray(ex.value, jnp.float64),
        mask=jnp.asarray(ex.mask),
        label=jnp.asarray(ex.label),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, metrics = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


@pytest.mark.slow
def test_sampler_snapshots():
    from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel

    z = synthetic_z_table()
    cfg = DiffusionConfig(
        num_atomic_states=len(z), num_timesteps=21, max_neighbors=4,
        hidden_dim=8, basis_dim=8, degree=2, num_layers=1, num_ori=4, remat=False,
    )
    model = DiffusionModel(cfg, dtype=jnp.float64)
    host = make_synthetic_batch(np.random.default_rng(0), z, 2, 4, dtype=np.float64)
    batch = jax.tree.map(jnp.asarray, host)
    params = model.init(jax.random.PRNGKey(0), batch)
    final, snaps = model.sample(
        params, jax.random.PRNGKey(1), num_samples=2, num_atoms_per_sample=3,
        snapshot_every=5,
    )
    assert len(snaps) == 4  # 20 steps / 5
    timesteps = [t for t, _ in snaps]
    assert timesteps == [15, 10, 5, 0]
    np.testing.assert_allclose(
        np.asarray(snaps[-1][1].frac_x), np.asarray(final.frac_x), rtol=1e-12
    )
    # snapshot trajectory actually changes over time
    assert not np.allclose(np.asarray(snaps[0][1].frac_x), np.asarray(final.frac_x))


def test_slic_superpixels_properties():
    """SLIC: centroids cover the image, intensities in [0,1], sparsify+dedup
    pipeline yields masked variable-size clouds."""
    import numpy as np

    from arreau_tpu.data.mnist import slic_superpixels, superpixel_examples, synthetic_digit_images

    imgs, labels = synthetic_digit_images(6, seed=3)
    pos, val = slic_superpixels(imgs[0], n_segments=75)
    assert 50 <= len(pos) <= 81
    assert (val >= 0).all() and (val <= 1).all()
    assert pos[:, 0].min() >= 0 and pos[:, 0].max() <= 27
    # bright superpixels should sit on the strokes: their sampled intensity is high
    ex = superpixel_examples(imgs, labels, num_nodes=75)
    n = ex.mask.sum(1)
    assert (n >= 3).all() and (n <= 75).all()
    # all kept nodes are bright (sparsify) and pairwise distinct (dedup)
    for s in range(len(imgs)):
        p = ex.pos[s][ex.mask[s]]
        assert (ex.value[s][ex.mask[s]] > 0.5).all()
        if len(p) > 1:
            d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
            np.fill_diagonal(d, 1.0)
            assert d.min() > 0


def test_checkpoint_ranked_retention(tmp_path):
    """Top-3 retention by score + persisted best across manager restarts
    (reference ModelCheckpoint save_top_k=3 semantics)."""
    import jax.numpy as jnp

    from arreau_tpu.train.checkpoint import CheckpointManager
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    tx = make_optimizer(1e-3)
    state = create_train_state({"w": jnp.ones((2,))}, tx)
    ck = CheckpointManager(str(tmp_path))

    assert ck.save_ranked(state, 5.0, step=1)
    assert ck.save_ranked(state, 3.0, step=2)
    assert ck.save_ranked(state, 4.0, step=3)
    assert not ck.save_ranked(state, 9.0, step=4)  # worse than all three
    assert ck.save_ranked(state, 1.0, step=5)  # new best, evicts 5.0
    ranked = ck.load_scores()["ranked"]
    assert [s for s, _ in ranked] == [1.0, 3.0, 4.0]
    assert ck.has("best") and ck.has("best-5") and not ck.has("best-1")
    assert ck.best_score() == 1.0
    # a fresh manager over the same dir sees the persisted best (resume path)
    ck2 = CheckpointManager(str(tmp_path))
    assert ck2.best_score() == 1.0
    restored = ck2.restore(state, "best")
    assert float(restored.params["w"][0]) == 1.0


def test_checkpoint_async_save_roundtrip(tmp_path):
    """Non-blocking saves commit correctly: overlapping async 'last' saves,
    then restore sees the newest state; has()/restore() are in-flight-safe."""
    import jax.numpy as jnp

    from arreau_tpu.train.checkpoint import CheckpointManager
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    tx = make_optimizer(1e-3)
    ck = CheckpointManager(str(tmp_path))
    for v in (1.0, 2.0, 3.0):
        state = create_train_state({"w": jnp.full((2,), v)}, tx)
        ck.save(state, "last", block=False)  # back-to-back without waiting
    assert ck.has("last")  # waits for the in-flight save internally
    template = create_train_state({"w": jnp.zeros((2,))}, tx)
    restored = ck.restore(template, "last")
    assert float(restored.params["w"][0]) == 3.0
    ck.wait()  # idempotent when nothing is in flight


def test_jsonl_logger(tmp_path):
    """One JSON object per line, appended across logger restarts (preemption
    resume), numpy scalars serialized; path=None is a no-op."""
    import json

    import numpy as np

    from arreau_tpu.train.metrics import JsonlLogger

    path = tmp_path / "metrics.jsonl"
    log = JsonlLogger(str(path))
    log.log({"epoch": 0, "train/loss": np.float32(1.5)})
    log2 = JsonlLogger(str(path))  # resumed run appends
    log2.log({"epoch": 1, "train/loss": 1.25, "lr": np.float64(3e-4)})
    lines = [json.loads(line) for line in path.read_text().splitlines()]
    assert lines == [
        {"epoch": 0, "train/loss": 1.5},
        {"epoch": 1, "train/loss": 1.25, "lr": 3e-4},
    ]
    JsonlLogger(None).log({"x": 1})  # no-op, no crash


def test_voronoi_bond_prediction():
    """CrystalNN-style PBC Voronoi solid-angle bonds: rock-salt coordination
    and an isolated dimer (reference semantics: pymatgen CrystalNN in
    /root/reference/diffusion/inference/predict_bonds.py:6-17)."""
    from arreau_tpu.inference.bonds import predict_bonds_voronoi

    # 8-atom cubic arrangement (rock-salt sites): every atom has 6 PBC
    # nearest neighbors -> 3 distinct partner atoms -> 12 unique pairs
    frac, types = [], []
    for x in (0, 0.5):
        for y in (0, 0.5):
            for z in (0, 0.5):
                frac.append([x, y, z])
                types.append(11 if (x + y + z) * 2 % 2 == 0 else 17)
    bonds = predict_bonds_voronoi(np.array(frac), np.eye(3) * 5.6, np.array(types))
    assert len(bonds) == 12
    degree = np.zeros(8)
    for i, j in bonds:
        assert i != j
        degree[i] += 1
        degree[j] += 1
    assert degree.tolist() == [3.0] * 8

    # dimer in a big box: exactly the one bond
    dimer = predict_bonds_voronoi(
        np.array([[0.45, 0.5, 0.5], [0.55, 0.5, 0.5]]),
        np.eye(3) * 12.0, np.array([6, 6]),
    )
    assert [tuple(map(int, b)) for b in dimer] == [(0, 1)]

    # empty input
    assert predict_bonds_voronoi(np.zeros((0, 3)), np.eye(3), None) == []


def test_view_crystals_cli(tmp_path):
    """Both viewer modes of exploration/view_crystals render PNGs (reference
    view_alexandria_dataset.py + view_generated_crystal.py equivalents)."""
    from arreau_tpu.exploration import view_crystals as vc
    from arreau_tpu.inference.io import SampleResult, save_sample_results

    ds_dir = tmp_path / "ds"
    assert vc.main([
        "dataset", "--dataset", "synthetic", "--num", "2",
        "--out_dir", str(ds_dir), "--show_bonds",
    ]) == 2
    assert sorted(p.name for p in ds_dir.iterdir()) == ["0.png", "1.png"]

    rng = np.random.default_rng(0)
    res = SampleResult(
        frac_x=rng.random((12, 3)),
        atomic_numbers=np.array([1, 6, 8] * 4),
        lattice=np.tile(np.eye(3) * 4.0, (3, 1, 1)),
        idx_start=np.array([0, 4, 8]),
        num_atoms=np.array([4, 4, 4]),
    )
    h5 = tmp_path / "crystals.h5"
    save_sample_results(str(h5), res)
    gen_dir = tmp_path / "gen"
    assert vc.main([
        "generated", "--crystal_file", str(h5), "--index", "0", "2",
        "--shift", "0.3", "0.6", "0.2", "--out_dir", str(gen_dir),
    ]) == 2
    assert sorted(p.name for p in gen_dir.iterdir()) == [
        "generated_0.png", "generated_2.png",
    ]


def test_eda_tools_run(tmp_path):
    """lattice_eda and vp_prior_check run end-to-end on synthetic data and
    produce their artifacts (vp_prior_check returns its pass/fail gate)."""
    from arreau_tpu.exploration.lattice_eda import main as eda_main
    from arreau_tpu.exploration.vp_prior_check import main as vp_main

    eda_main(["--dataset", "synthetic", "--out_dir", str(tmp_path),
              "--num_render", "1"])
    assert (tmp_path / "lattice_eda.png").exists()
    assert (tmp_path / "example_cell_0.png").exists()

    assert vp_main(["--dataset", "synthetic", "--out_dir", str(tmp_path),
                    "--num_render", "2"]) is True
    assert (tmp_path / "vp_prior_lattice_1.png").exists()
