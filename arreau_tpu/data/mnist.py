"""MNIST point-cloud data: raw idx files -> brightest-pixel point clouds, or
a synthetic shape-class fallback.

The reference uses torch-geometric's packaged MNISTSuperpixels
(/root/reference/main_mnist.py:176-189); offline, this module converts the
standard raw MNIST idx files (``train-images-idx3-ubyte`` etc., optionally
gzipped) into N-node point clouds by keeping the N brightest pixels — the
same shape statistics (75 nodes, 2D coords + gray value) — and otherwise
generates parametric class shapes so the task remains runnable end-to-end.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import NamedTuple

import numpy as np


class Mnist2DExamples(NamedTuple):
    pos: np.ndarray  # [S, N, 2]
    value: np.ndarray  # [S, N]
    mask: np.ndarray  # [S, N]
    label: np.ndarray  # [S]

    def __len__(self):
        return len(self.pos)


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        _zero, _dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def load_mnist_idx(
    data_dir: str, split: str = "train", num_nodes: int = 75, limit: int | None = None
) -> Mnist2DExamples:
    prefix = "train" if split == "train" else "t10k"
    img_path = None
    for cand in (f"{prefix}-images-idx3-ubyte", f"{prefix}-images-idx3-ubyte.gz"):
        p = os.path.join(data_dir, cand)
        if os.path.exists(p):
            img_path = p
            break
    if img_path is None:
        raise FileNotFoundError(f"no MNIST idx files under {data_dir}")
    lbl_path = img_path.replace("images-idx3", "labels-idx1")
    images = _read_idx(img_path)[:limit]
    labels = _read_idx(lbl_path)[:limit]

    S = len(images)
    pos = np.zeros((S, num_nodes, 2), np.float32)
    val = np.zeros((S, num_nodes), np.float32)
    mask = np.zeros((S, num_nodes), bool)
    for s in range(S):
        img = images[s].astype(np.float32) / 255.0
        flat = img.ravel()
        top = np.argsort(-flat)[:num_nodes]
        keep = flat[top] > 0
        ys, xs = np.divmod(top, img.shape[1])
        n = keep.sum()
        pos[s, :n] = np.stack([xs[keep], 27 - ys[keep]], -1)
        val[s, :n] = flat[top][keep]
        mask[s, :n] = True
    return Mnist2DExamples(pos=pos, value=val, mask=mask, label=labels.astype(np.int32))


def synthetic_shapes(
    num: int, seed: int = 0, num_nodes: int = 32, num_classes: int = 10
) -> Mnist2DExamples:
    """Ten fixed random shape templates + jitter; rotation-invariant
    classification remains learnable (distances within template preserved)."""
    rng = np.random.default_rng(seed)
    templates = rng.uniform(0, 10, size=(num_classes, num_nodes, 2))
    labels = rng.integers(0, num_classes, size=num)
    pos = templates[labels] + rng.normal(scale=0.1, size=(num, num_nodes, 2))
    # random global rotation per sample (classes must be recognized by geometry)
    theta = rng.uniform(0, 2 * np.pi, size=num)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    pos = np.einsum("bij,bnj->bni", rot, pos)
    value = rng.uniform(0.6, 1.0, size=(num, num_nodes)).astype(np.float32)
    mask = np.ones((num, num_nodes), bool)
    return Mnist2DExamples(
        pos=pos.astype(np.float32), value=value, mask=mask, label=labels.astype(np.int32)
    )
