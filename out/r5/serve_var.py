"""Export + time the size-matched serving artifact from the converged
angle-recipe checkpoint (the r5 default recipe) on the real chip."""
import time

import numpy as np

from arreau_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from arreau_tpu.inference.export import export_sampler, load_exported

OUT = "out/r5/sampler_var.stablehlo"
sc = export_sampler(
    "out/r4/ckpt_ang_on", OUT, tag="best", use_ema=False,
    batch_size=100, num_atoms_per_sample=24, sample_steps=100,
    variable_num_atoms=True,
)
print("exported:", {k: sc[k] for k in ("bytes", "platforms", "batch_size",
                                       "num_atoms_per_sample", "sample_steps")},
      flush=True)

call, _ = load_exported(OUT)
rng = np.random.default_rng(0)
ref_counts = rng.integers(2, 25, size=5000)  # stand-in for the training histogram

def draw():
    return rng.choice(ref_counts, size=100).astype(np.int32)

out = call(np.int32(0), draw())  # compile+warm
np.asarray(out[0])
t0 = time.perf_counter()
N = 4
for i in range(1, N + 1):
    out = call(np.int32(i), draw())
np.asarray(out[0])
dt = time.perf_counter() - t0
print(f"sustained: {N * 100 / dt * 60:.0f} crystals/min at S=100, pad 24, "
      f"size-matched counts ({dt / N:.3f} s/call)", flush=True)
