"""Backfill length_stats into the running training's checkpoint meta."""
import json
import numpy as np
from arreau_tpu.data.synthetic import synthetic_packed
from arreau_tpu.data.crystal import random_split

ds = synthetic_packed(20000, seed=0)
tr = random_split(len(ds), [0.7, 0.15, 0.15], 0)[0]
lengths = np.linalg.norm(ds.packed.lattices[tr], axis=-1)
for path in ["out/r2/ckpt_conv/meta.json"]:
    with open(path) as f:
        meta = json.load(f)
    meta["length_stats"] = {
        "min": float(lengths.min()), "max": float(lengths.max()),
        "mean": float(lengths.mean()), "std": float(lengths.std()),
    }
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    print("patched", path, meta["length_stats"])
