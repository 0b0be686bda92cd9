"""Real byte-format pinning for the side workloads: the checked-in fixtures
under tests/fixtures/ carry the GENUINE on-disk formats — gdb9 .xyz framing
incl. the '*^' exponent notation (QM9), the revised-MD17 npz key set, and the
LeCun idx image/label files — so supplying real data is guaranteed turnkey.

Format oracles: torch_geometric QM9 raw gdb9 files
(/root/reference/main_qm9.py:140-178), the rMD17 npz download
(/root/reference/main_md17.py:175), torchvision MNIST idx files
(/root/reference/main_mnist.py)."""

import os

import numpy as np

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_qm9_gdb9_xyz_fixture():
    from arreau_tpu.data.molecules import QM9_ELEMENTS, load_qm9_xyz_dir

    root = os.path.join(FIXTURES, "qm9")
    ex = load_qm9_xyz_dir(root, target="alpha")
    assert ex.pos.shape[0] == 3
    # gdb_1 methane: alpha = 13.21, 5 atoms (C + 4H)
    assert ex.y[0] == 13.21
    assert ex.mask[0].sum() == 5
    c_idx = QM9_ELEMENTS.index(6)
    assert ex.one_hot[0, 0, c_idx] == 1.0
    np.testing.assert_allclose(
        ex.pos[0, 0], [-0.0126981359, 1.0858041578, 0.0080009958], rtol=1e-6
    )
    # molecule 2 exercises the gdb9 '*^' exponent notation in coordinates
    assert ex.mask[1].sum() == 4
    np.testing.assert_allclose(ex.pos[1, 1, 0], 1.7956563e-2, rtol=1e-6)
    np.testing.assert_allclose(ex.pos[1, 1, 1], 6.8717612e-3, rtol=1e-6)
    # target selection indexes past the A,B,C rotational constants
    mu = load_qm9_xyz_dir(root, target="mu")
    np.testing.assert_allclose(mu.y, [0.0, 1.6256, 1.8511])
    cv = load_qm9_xyz_dir(root, target="Cv")
    np.testing.assert_allclose(cv.y, [6.469, 6.316, 6.002])


def test_rmd17_npz_fixture():
    from arreau_tpu.data.molecules import load_rmd17_npz

    ex = load_rmd17_npz(os.path.join(FIXTURES, "rmd17_toy.npz"))
    S, A = 10, 21
    assert ex.pos.shape == (S, A, 3)
    assert ex.forces.shape == (S, A, 3)
    assert ex.y.shape == (S,)
    assert ex.mask.all()
    # aspirin z-multiset: 9 C, 4 O, 8 H -> one-hot over sorted unique elements
    assert ex.one_hot.shape[-1] == 3  # {1, 6, 8}
    assert ex.one_hot[0].sum(0).tolist() == [8.0, 9.0, 4.0]
    assert ex.y.mean() < -400000  # rMD17 energies are raw kcal/mol totals

    lim = load_rmd17_npz(os.path.join(FIXTURES, "rmd17_toy.npz"), limit=4)
    assert lim.pos.shape[0] == 4


def test_mnist_idx_fixture():
    from arreau_tpu.data.mnist import load_mnist_idx

    ex = load_mnist_idx(os.path.join(FIXTURES, "mnist"), split="test", num_nodes=30)
    assert ex.pos.shape == (5, 30, 2)
    assert ex.label.tolist() == [3, 1, 4, 1, 5]
    # the bright stroke pixels become the superpixel nodes
    assert ex.mask.sum(1).min() > 10
    assert float(ex.value.max()) <= 1.0
    # idx coordinate convention: y flipped so images are upright
    assert ex.pos[..., 1].max() <= 27
