"""Native (C++) components with transparent numpy fallbacks.

The shared library is built on demand with g++ (no pybind11; plain C ABI via
ctypes). If the toolchain is unavailable the pure-numpy implementations are
used — identical results, just slower host-side.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libarreau_native.so")
_SRC = os.path.join(_HERE, "collate.cc")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO_PATH],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.collate_dense_f32.restype = ctypes.c_int
    lib.collate_dense_f32.argtypes = [
        ctypes.c_void_p,  # type_indices
        ctypes.c_void_p,  # frac_coords
        ctypes.c_void_p,  # offsets
        ctypes.c_void_p,  # lattices
        ctypes.c_void_p,  # idx
        ctypes.c_int64,  # batch
        ctypes.c_int64,  # max_atoms
        ctypes.c_void_p,  # frac_out
        ctypes.c_void_p,  # types_out
        ctypes.c_void_p,  # lattice_out
        ctypes.c_void_p,  # num_atoms_out
        ctypes.c_void_p,  # mask_out
    ]
    _lib = lib
    return _lib


def _collate_numpy(type_indices, frac_coords, offsets, lattices, idx, max_atoms, dtype):
    from arreau_tpu.tasks.diffusion import CrystalBatch

    B = len(idx)
    frac = np.zeros((B, max_atoms, 3), dtype)
    types = np.zeros((B, max_atoms), np.int32)
    lattice = np.zeros((B, 3, 3), dtype)
    num_atoms = np.zeros((B,), np.int32)
    mask = np.zeros((B, max_atoms), bool)
    for b, ci in enumerate(idx):
        if ci < 0:  # padding sentinel: empty example (identity lattice keeps codecs finite)
            lattice[b] = np.eye(3, dtype=dtype)
            continue
        start, end = offsets[ci], offsets[ci + 1]
        n = end - start
        frac[b, :n] = frac_coords[start:end]
        types[b, :n] = type_indices[start:end]
        lattice[b] = lattices[ci]
        num_atoms[b] = n
        mask[b, :n] = True
    return CrystalBatch(frac, types, lattice, num_atoms, mask)


def collate_dense(
    type_indices: np.ndarray,
    frac_coords: np.ndarray,
    offsets: np.ndarray,
    lattices: np.ndarray,
    idx: np.ndarray,
    max_atoms: int,
    dtype=np.float32,
):
    """Collate the selected crystals into one dense padded CrystalBatch."""
    lib = _load() if dtype == np.float32 else None
    if lib is None:
        return _collate_numpy(
            type_indices, frac_coords, offsets, lattices, idx, max_atoms, dtype
        )

    from arreau_tpu.tasks.diffusion import CrystalBatch

    type_indices = np.ascontiguousarray(type_indices, np.int64)
    frac_coords = np.ascontiguousarray(frac_coords, np.float64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lattices = np.ascontiguousarray(lattices, np.float64)
    idx = np.ascontiguousarray(idx, np.int64)

    B = len(idx)
    frac = np.empty((B, max_atoms, 3), np.float32)
    types = np.empty((B, max_atoms), np.int32)
    lattice = np.empty((B, 3, 3), np.float32)
    num_atoms = np.empty((B,), np.int32)
    mask = np.empty((B, max_atoms), np.uint8)

    rc = lib.collate_dense_f32(
        type_indices.ctypes.data,
        frac_coords.ctypes.data,
        offsets.ctypes.data,
        lattices.ctypes.data,
        idx.ctypes.data,
        B,
        max_atoms,
        frac.ctypes.data,
        types.ctypes.data,
        lattice.ctypes.data,
        num_atoms.ctypes.data,
        mask.ctypes.data,
    )
    if rc != 0:
        raise ValueError("collate_dense: crystal exceeds bucket max_atoms")
    return CrystalBatch(frac, types, lattice, num_atoms, mask.astype(bool))
