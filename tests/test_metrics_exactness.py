"""Eval exactness: epoch metric means must be independent of batch layout
(bucket ladder, node budget, short-chunk padding) and of padding examples.

This guards the north-star metric itself — the reference selects checkpoints
on the valid loss, so a layout-biased mean is a correctness bug
(VERDICT r1, weak #4)."""

import numpy as np
import pytest

from arreau_tpu.data.crystal import BucketedLoader
from arreau_tpu.data.synthetic import synthetic_packed
from arreau_tpu.train.metrics import MeanMetrics, exact_loss, weighted_update


def _fake_metrics(batch):
    """Deterministic stand-ins with the same denominators as the real losses:
    per-atom means over valid atoms, per-crystal means over real crystals."""
    mask = np.asarray(batch.atom_mask)
    frac = np.asarray(batch.frac_x)
    example_mask = mask.any(axis=-1)
    n_atoms = max(int(mask.sum()), 1)
    n_crystals = max(int(example_mask.sum()), 1)
    per_atom = (frac**2).sum(-1)  # [B, A]
    coord = float(np.where(mask, per_atom, 0.0).sum() / n_atoms)
    lengths = np.linalg.norm(np.asarray(batch.lattice), axis=-1)  # [B, 3]
    per_crystal = (lengths**2).mean(-1)
    lat = float(np.where(example_mask, per_crystal, 0.0).sum() / n_crystals)
    return {
        "loss_coord": coord,
        "loss_type": coord * 0.5,
        "loss_lattice": lat,
        "loss": coord * 1.5 + lat,
        "num_atoms": float(n_atoms),
        "num_crystals": float(n_crystals),
    }


def _epoch_mean(loader):
    acc = MeanMetrics()
    for batch in loader:
        weighted_update(acc, _fake_metrics(batch))
    return exact_loss(acc.compute())


def test_epoch_mean_invariant_to_batch_layout():
    ds = synthetic_packed(57, seed=3)
    idx = np.arange(len(ds))

    # direct dataset-level ground truth
    packed = ds.packed
    total_atoms = int(packed.offsets[-1])
    coord_true = float((packed.frac_coords**2).sum() / total_atoms)
    lengths = np.linalg.norm(packed.lattices, axis=-1)
    lat_true = float((lengths**2).mean(-1).mean())

    results = []
    for node_budget, buckets in [
        (64, (8, 16, 24)),
        (256, (12, 24)),
        (96, (8, 12, 16, 24)),
    ]:
        loader = BucketedLoader(ds, idx, node_budget=node_budget, buckets=buckets, seed=0)
        m = _epoch_mean(loader)
        results.append(m)

    for m in results:
        np.testing.assert_allclose(m["loss_coord"], coord_true, rtol=1e-6)
        np.testing.assert_allclose(m["loss_lattice"], lat_true, rtol=1e-6)
        np.testing.assert_allclose(
            m["loss"], coord_true * 1.5 + lat_true, rtol=1e-6
        )


def test_padded_chunk_has_masked_examples():
    ds = synthetic_packed(10, seed=1, max_atoms=12, min_atoms=12)
    loader = BucketedLoader(ds, np.arange(10), node_budget=12 * 4, buckets=(12,), seed=0)
    batches = list(loader)
    # 10 crystals, batch size 4 -> 3 batches, last one has 2 padding examples
    assert len(batches) == 3
    real = sorted(int(np.asarray(b.atom_mask).any(-1).sum()) for b in batches)
    assert real == [2, 4, 4]
    for b in batches:
        pad = ~np.asarray(b.atom_mask).any(-1)
        if pad.any():
            assert (np.asarray(b.num_atoms)[pad] == 0).all()
            # identity lattice keeps matrix_to_params finite on padding slots
            pads = np.asarray(b.lattice)[pad]
            np.testing.assert_allclose(
                pads, np.broadcast_to(np.eye(3), pads.shape), atol=0
            )


@pytest.mark.slow
def test_loss_excludes_padding_examples():
    """model.loss on [real crystals] vs [real crystals + sentinel padding]
    must agree on every component (same key: threefry draws for the leading
    batch entries are a prefix of the larger draw)."""
    import jax
    import jax.numpy as jnp

    from arreau_tpu.data.crystal import pack_dense_batch
    from arreau_tpu.data.synthetic import synthetic_packed
    from arreau_tpu.tasks.diffusion import DiffusionConfig, DiffusionModel

    ds = synthetic_packed(6, seed=7, max_atoms=8, min_atoms=3)
    cfg = DiffusionConfig(
        num_atomic_states=len(ds.z_table),
        num_timesteps=20,
        hidden_dim=8,
        basis_dim=8,
        degree=1,
        num_layers=1,
        num_ori=2,
        max_neighbors=4,
    )
    model = DiffusionModel(cfg, dtype=jnp.float64)

    idx_real = np.arange(6, dtype=np.int64)
    idx_padded = np.concatenate([idx_real, [-1, -1]])
    b_real = jax.tree.map(jnp.asarray, pack_dense_batch(ds, idx_real, 8, np.float64))
    b_pad = jax.tree.map(jnp.asarray, pack_dense_batch(ds, idx_padded, 8, np.float64))

    params = model.init(jax.random.PRNGKey(0), b_real)
    key = jax.random.PRNGKey(42)
    # fixed timestep so the only randomness is the noise draws (prefix-stable)
    _, m_real = model.loss(params, key, b_real, timestep=7)
    _, m_pad = model.loss(params, key, b_pad, timestep=7)

    assert float(m_pad["num_crystals"]) == 6.0
    assert float(m_pad["num_atoms"]) == float(m_real["num_atoms"])
    for k in ("loss_coord", "loss_type", "loss_lattice", "loss"):
        # rtol allows reduction-order noise from the different batch shape
        np.testing.assert_allclose(
            float(m_real[k]), float(m_pad[k]), rtol=1e-6, err_msg=k
        )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_exact_loss_angle_weighting():
    """The recomposed loss must weight loss_angle by the training
    angle_loss_weight (it drives best-checkpoint ranking)."""
    m = {"loss_coord": 0.5, "loss_type": 1.0, "loss_lattice": 0.25,
         "loss_angle": 0.8, "loss": 999.0}
    assert exact_loss(m)["loss"] == pytest.approx(0.5 + 1.0 + 0.25 + 0.8)
    assert exact_loss(m, angle_weight=0.1)["loss"] == pytest.approx(
        0.5 + 1.0 + 0.25 + 0.08
    )
    no_angle = {"loss_coord": 0.5, "loss_type": 1.0, "loss_lattice": 0.25}
    assert exact_loss(no_angle, angle_weight=0.1)["loss"] == pytest.approx(1.75)
