"""One-shot generator for the checked-in real-byte-format fixtures:

  * qm9/dsgdb9nsd_00000{1,2,3}.xyz — the genuine gdb9 xyz framing
    (natoms / 'gdb N' + 15 tab-separated scalars / atom rows with Mulliken
    charges incl. the gdb9 '*^' exponent notation / frequencies / SMILES /
    InChI), as consumed by the reference via torch_geometric QM9
    (/root/reference/main_qm9.py:140) and here by data/molecules.py.
  * rmd17_toy.npz — the revised-MD17 npz key set (nuclear_charges, coords,
    energies, forces, old_indices, old_energies, old_forces), as in the
    rMD17 download consumed at /root/reference/main_md17.py:175.
  * mnist/t10k-{images-idx3,labels-idx1}-ubyte — the LeCun idx byte framing
    (big-endian magic 0x0803/0x0801 + dims), 5 images.

Run from tests/fixtures: python gen_fixtures.py
"""

import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write_qm9():
    d = os.path.join(HERE, "qm9")
    os.makedirs(d, exist_ok=True)
    # values: [A, B, C, mu, alpha, homo, lumo, gap, r2, zpve, U0, U, H, G, Cv]
    mols = [
        (  # methane — the actual gdb_1 entry values
            1,
            [157.7118, 157.70997, 157.70699, 0.0, 13.21, -0.3877, 0.1171,
             0.5048, 35.3641, 0.044749, -40.47893, -40.476062, -40.475117,
             -40.498597, 6.469],
            [("C", -0.0126981359, 1.0858041578, 0.0080009958, -0.535689),
             ("H", 0.002150416, -0.0060313176, 0.0019761204, 0.133921),
             ("H", 1.0117308433, 1.4637511618, 0.0002765748, 0.133922),
             ("H", -0.540815069, 1.4475266138, -0.8766437152, 0.133923),
             ("H", -0.5238136345, 1.4379326443, 0.9063972942, 0.133923)],
            "1341.307 1341.3284 1341.365 1562.6731 1562.7453 3038.3205 3151.6034 3151.6788 3151.7078",
            "C\tC", "InChI=1S/CH4/h1H4\tInChI=1S/CH4/h1H4",
        ),
        (  # ammonia-like, with gdb9 *^ exponent notation in props and coords
            2,
            [293.60975, 293.54111, 191.39397, 1.6256, 9.46, -0.257,
             0.0829, 0.3399, 26.1563, "3.4358*^-2", -56.525887, -56.523026,
             -56.522082, -56.544961, 6.316],
            [("N", -0.0404260543, 1.0241077531, 0.0625637998, -0.612644),
             ("H", "1.7956563e-2", "6.8717612*^-3", "-2.7913526*^-2", 0.204216),
             ("H", 0.9175605408, 1.3858933324, 0.0009723603, 0.204214),
             ("H", -0.5202777357, 1.3911861434, -0.7226318542, 0.204214)],
            "1086.4697 1651.4551 1651.5258 3446.6684 3589.7326 3589.8249",
            "N\tN", "InChI=1S/H3N/h1H3\tInChI=1S/H3N/h1H3",
        ),
        (  # water
            3,
            [799.58812, 437.90386, 282.94545, 1.8511, 6.31, -0.2928,
             0.0687, 0.3615, 19.0002, 0.021375, -76.404702, -76.401867,
             -76.400922, -76.422349, 6.002],
            [("O", -0.0343604951, 0.9775395708, 0.0076015923, -0.589706),
             ("H", 0.0647664923, 0.020572019, 0.0015346341, 0.294853),
             ("H", 0.8717903737, 1.3007924048, 0.0006931336, 0.294853)],
            "1671.4222 3803.6305 3907.698",
            "O\tO", "InChI=1S/H2O/h1H2\tInChI=1S/H2O/h1H2",
        ),
    ]
    for gid, props, atoms, freqs, smiles, inchi in mols:
        lines = [str(len(atoms))]
        lines.append("gdb " + str(gid) + "\t" + "\t".join(str(p) for p in props))
        for sym, x, y, z, q in atoms:
            lines.append("\t".join(str(v) for v in (sym, x, y, z, q)))
        lines += [freqs, smiles, inchi]
        with open(os.path.join(d, f"dsgdb9nsd_{gid:06d}.xyz"), "w") as f:
            f.write("\n".join(lines) + "\n")


def write_rmd17():
    rng = np.random.default_rng(17)
    S, A = 10, 21  # aspirin has 21 atoms
    zs = np.array([6, 6, 6, 6, 6, 6, 6, 8, 8, 8, 8, 6, 6, 1, 1, 1, 1, 1, 1, 1, 1],
                  np.int64)
    coords = rng.normal(scale=2.0, size=(S, A, 3)).astype(np.float64)
    energies = (-406757.0 + rng.normal(scale=5.0, size=S)).astype(np.float64)
    forces = rng.normal(scale=30.0, size=(S, A, 3)).astype(np.float64)
    np.savez(
        os.path.join(HERE, "rmd17_toy.npz"),
        nuclear_charges=zs,
        coords=coords,
        energies=energies,
        forces=forces,
        old_indices=np.arange(S, dtype=np.int64),
        old_energies=energies.copy(),
        old_forces=forces.copy(),
    )


def write_mnist():
    d = os.path.join(HERE, "mnist")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(5)
    S = 5
    imgs = np.zeros((S, 28, 28), np.uint8)
    for s in range(S):  # a bright diagonal stroke per image
        for i in range(4, 24):
            imgs[s, i, min(27, i + s)] = 200 + (s * 10) % 55
            imgs[s, i, max(0, i - 1 + s)] = 120
    labels = np.array([3, 1, 4, 1, 5], np.uint8)
    with open(os.path.join(d, "t10k-images-idx3-ubyte"), "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))
        f.write(struct.pack(">III", S, 28, 28))
        f.write(imgs.tobytes())
    with open(os.path.join(d, "t10k-labels-idx1-ubyte"), "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", S))
        f.write(labels.tobytes())


if __name__ == "__main__":
    write_qm9()
    write_rmd17()
    write_mnist()
    print("fixtures written under", HERE)
