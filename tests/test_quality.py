"""Sample-quality harness: metric math unit tests + a slow end-to-end
regression gate (train a small model on an easy synthetic distribution,
sample, and require generated lattice lengths to land in-distribution —
the direct gate for round-1's 44-angstrom drift failure mode)."""

import numpy as np
import pytest

from arreau_tpu.inference import quality as q


def test_wasserstein1_basics():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 20000)
    assert q.wasserstein1(a, a) == 0.0
    b = rng.normal(3, 1, 20000)
    assert abs(q.wasserstein1(a, b) - 3.0) < 0.1
    assert q.wasserstein1(a, a + 0.0) < q.wasserstein1(a, b)


def test_lattice_params_np_cubic():
    lat = np.stack([np.eye(3) * 4.0] * 5)
    lengths, angles = q.lattice_params_np(lat)
    np.testing.assert_allclose(lengths, 4.0)
    np.testing.assert_allclose(angles, 90.0)


def test_min_pairwise_distance_pbc_wraps():
    # two atoms at frac 0.02 and 0.98 in a 10A cubic cell: PBC distance 0.4
    lat = np.eye(3) * 10.0
    frac = np.array([[0.02, 0.0, 0.0], [0.98, 0.0, 0.0]])
    d = q.min_pairwise_distance(frac, lat)
    np.testing.assert_allclose(d, 0.4, atol=1e-9)


def test_violation_rate_counts_overlaps():
    lat = np.stack([np.eye(3) * 6.0] * 2)
    # crystal 0: overlapping pair; crystal 1: well separated
    frac = np.array([[0.1, 0.1, 0.1], [0.105, 0.1, 0.1], [0.1, 0.1, 0.1], [0.6, 0.6, 0.6]])
    rate = q.min_distance_violation_rate(
        frac, lat, idx_start=np.array([0, 2]), num_atoms=np.array([2, 2]), threshold=0.5
    )
    assert rate == 0.5


def test_type_geometry_mi():
    rng = np.random.default_rng(1)
    z = rng.uniform(size=50000)
    types_dep = np.minimum((z * 8).astype(int), 7)  # deterministic in z
    types_rand = rng.integers(0, 8, size=50000)  # independent of z
    mi_dep = q.type_geometry_mutual_info(types_dep, z, 9)
    mi_rand = q.type_geometry_mutual_info(types_rand, z, 9)
    assert mi_dep > 1.5  # close to ln(8) ~ 2.08
    assert mi_rand < 0.05


@pytest.mark.slow
def test_generated_lengths_land_in_distribution(tmp_path):
    """End-to-end regression gate: brief training on an easy synthetic set
    must already keep sampled lattice lengths on-manifold (no 44 A drift)."""
    from arreau_tpu.cli.generate import main as gen_main, quality_from_results
    from arreau_tpu.cli.train_diffusion import main as train_main

    ck = str(tmp_path / "ck")
    train_main([
        "--dataset=synthetic", "--synthetic_size=400", "--epochs=40",
        "--val_interval=20", "--hidden_dim=32", "--basis_dim=32", "--layers=2",
        "--num_ori=4", "--num_timesteps=50", "--batch_size=32", "--lr=3e-3",
        f"--checkpoint_dir={ck}", "--resume=False",
    ])
    result = gen_main([
        f"--checkpoint_dir={ck}", "--tag=best", "--num_crystals=16",
        "--batch_size=16", "--num_atoms_per_sample=8", "--use_ema=False",
        f"--out_dir={tmp_path}", "--quality_ref=synthetic:400:0",
    ])
    import json

    report = json.loads((tmp_path / "quality.json").read_text())
    # Data lengths are U(3, 8). This gate targets the catastrophic runaway
    # failure mode (round-1: mean 44 A; without clip_denoised this tiny
    # 40-epoch model reaches mean ~1570 A, W1 ~1560): with the stabilizer the
    # chain must stay pinned to the training envelope even when undertrained.
    # Distribution-match quality (W1, in-range fraction) of the CONVERGED
    # model is the round artifact (out/r2/quality.json), not this unit gate.
    assert report["gen_length_mean"] < 12.0, report
    assert report["w1_lengths"] < 6.0, report
    assert report["min_dist_violation_rate"] <= 0.5, report


def test_fingerprint_invariances_and_uniqueness():
    """Fingerprints are invariant to rotation, translation and atom
    permutation; distinct structures get distinct prints; uniqueness/novelty
    count as expected."""
    rng = np.random.default_rng(0)
    lattice = np.diag([4.0, 5.0, 6.0])
    frac = rng.uniform(size=(4, 3))
    types = np.array([0, 1, 1, 2])

    fp = q.structure_fingerprint(frac, types, lattice)
    # translation (same shift on every atom, mod 1)
    fp_shift = q.structure_fingerprint((frac + 0.37) % 1.0, types, lattice)
    assert fp == fp_shift
    # permutation of atoms
    perm = np.array([2, 0, 3, 1])
    assert fp == q.structure_fingerprint(frac[perm], types[perm], lattice)
    # rotation: rotate the lattice rows (cartesian rotation, frac unchanged)
    th = 0.7
    R = np.array([
        [np.cos(th), -np.sin(th), 0.0],
        [np.sin(th), np.cos(th), 0.0],
        [0.0, 0.0, 1.0],
    ])
    assert fp == q.structure_fingerprint(frac, types, lattice @ R.T)
    # a genuinely different structure differs
    fp_other = q.structure_fingerprint(rng.uniform(size=(4, 3)), types, lattice * 1.5)
    assert fp != fp_other

    # uniqueness/novelty accounting: [A, A, B] generated; reference holds {A}
    def flat(frs, lats, tys):
        frac_x = np.concatenate(frs)
        idx = np.array([0] + [len(f) for f in frs[:-1]]).cumsum()
        return frac_x, np.concatenate(tys), np.stack(lats), idx, np.array([len(f) for f in frs])

    frac_b = rng.uniform(size=(4, 3))
    gen = flat([frac, frac, frac_b], [lattice, lattice, lattice * 1.5],
               [types, types, types])
    report = q.quality_report(
        gen_frac=gen[0], gen_types=gen[1], gen_lattices=gen[2],
        gen_idx_start=gen[3], gen_num_atoms=gen[4],
        ref_lengths=np.full(3, 5.0), ref_angles=np.full(3, 90.0), num_types=3,
        ref_fingerprints=[fp],
    )
    assert report["uniqueness_frac"] == pytest.approx(2 / 3)
    assert report["novelty_frac"] == pytest.approx(1 / 3)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_coordination_histogram_rocksalt():
    """A 3x3x3 simple-cubic cell reads coordination 6 for every atom (+-x/y/z
    neighbors all distinct); the TV distance of a distribution vs itself is 0."""
    frac = []
    for x in range(3):
        for y in range(3):
            for z in range(3):
                frac.append([x / 3, y / 3, z / 3])
    frac = np.asarray(frac) % 1.0
    lattices = np.eye(3)[None] * 8.4
    idx_start = np.array([0])
    num_atoms = np.array([len(frac)])
    hist = q.coordination_histogram(frac, lattices, idx_start, num_atoms)
    assert hist.sum() == pytest.approx(1.0)
    assert hist[6] == pytest.approx(1.0)

    report = q.quality_report(
        gen_frac=frac,
        gen_types=np.zeros(len(frac), dtype=int),
        gen_lattices=lattices,
        gen_idx_start=idx_start,
        gen_num_atoms=num_atoms,
        ref_lengths=np.full(3, 5.6),
        ref_angles=np.full(3, 90.0),
        num_types=2,
        ref_coord_hist=hist,
    )
    assert report["coordination_tv_dist"] == pytest.approx(0.0)
    assert report["gen_mean_coordination"] == pytest.approx(6.0)


@pytest.mark.slow
def test_strided_sampler_quality_tracks_full_chain(tmp_path):
    """Regression gate for VERDICT r3 item 2: the strided (DDIM) sampler's
    sample quality must track the full reverse chain on the same trained
    model — the throughput headline rides on this trade-off. The measured
    canonical-scale ladder (S in {25,50,100} vs T=1000 on the converged
    checkpoint, BASELINE.md round 4) is the evidence artifact; this gate
    catches regressions in the strided math at CI scale (T=50 vs S=10)."""
    import json

    from arreau_tpu.cli.generate import main as gen_main
    from arreau_tpu.cli.train_diffusion import main as train_main

    ck = str(tmp_path / "ck")
    train_main([
        "--dataset=synthetic", "--synthetic_size=400", "--epochs=40",
        "--val_interval=20", "--hidden_dim=32", "--basis_dim=32", "--layers=2",
        "--num_ori=4", "--num_timesteps=50", "--batch_size=32", "--lr=3e-3",
        f"--checkpoint_dir={ck}", "--resume=False",
    ])
    reports = {}
    for label, extra in (
        ("full", []),
        ("s10", ["--sample_steps=10"]),
    ):
        out = tmp_path / label
        gen_main([
            f"--checkpoint_dir={ck}", "--tag=best", "--num_crystals=16",
            "--batch_size=16", "--num_atoms_per_sample=8", "--use_ema=False",
            f"--out_dir={out}", "--quality_ref=synthetic:400:0", *extra,
        ])
        reports[label] = json.loads((out / "quality.json").read_text())

    full, s10 = reports["full"], reports["s10"]
    # the strided chain must stay on the same manifold as the full chain:
    # no runaway lengths and a W1 within an additive band of the full chain
    assert s10["gen_length_mean"] < 12.0, s10
    assert s10["w1_lengths"] < full["w1_lengths"] + 2.0, (s10, full)
    assert s10["min_dist_violation_rate"] <= full["min_dist_violation_rate"] + 0.25, (s10, full)
