"""Benchmark: train steps/sec of the canonical crystal-diffusion config on the
available accelerator. Prints ONE JSON line.

Canonical config = the reference Makefile's train target
(/root/reference/Makefile:6-7): T=1000, radius=5, max_neighbors=8,
batch_size=270, hidden_dim=200 (5 layers, 16 orientations, basis 256). The
reference publishes no steps/sec; BASELINE.md derives ~780 steps/epoch and
~30 min to convergence on an A10. ``REF_STEPS_PER_SEC`` below is the
documented estimate used for ``vs_baseline``: assuming ~20 epochs to converge
(~15.6k steps in 30 min) => ~8.6 steps/s on the A10 in fp64.

Param accounting: the bench model is ~2.31M params — the same count the
reference Makefile config implies (hidden=200; its 18 MB fp64 checkpoint =
2.31M x 8 bytes). The reference README's "1.1M" corresponds to the argparse
default hidden=128, not the Makefile train target; see BASELINE.md.
"""

from __future__ import annotations

import json
import time

REF_STEPS_PER_SEC = 8.6
BATCH = 256  # dense bucket: 256 crystals x up to 16 atoms (~ reference batch 270)
MAX_ATOMS = 16
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def main():
    from arreau_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from arreau_tpu.data.synthetic import make_synthetic_batch, synthetic_z_table
    from arreau_tpu.tasks.diffusion import CrystalBatch, DiffusionConfig, DiffusionModel
    from arreau_tpu.train.loop import make_train_step
    from arreau_tpu.train.optim import make_optimizer
    from arreau_tpu.train.state import create_train_state

    z_table = synthetic_z_table()
    cfg = DiffusionConfig(num_atomic_states=len(z_table), compute_dtype="bfloat16")
    model = DiffusionModel(cfg)

    rng = np.random.default_rng(0)
    host = make_synthetic_batch(rng, z_table, BATCH, MAX_ATOMS)
    batch = CrystalBatch(
        frac_x=jnp.asarray(host.frac_x),
        atom_types=jnp.asarray(host.atom_types),
        lattice=jnp.asarray(host.lattice),
        num_atoms=jnp.asarray(host.num_atoms),
        atom_mask=jnp.asarray(host.atom_mask),
    )

    params = model.init(jax.random.PRNGKey(0), batch)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer(3e-4)
    state = create_train_state(params, tx, ema_decay=None)
    step = make_train_step(model.loss, tx, donate=True)

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = MEASURE_STEPS / dt
    print(
        json.dumps(
            {
                "metric": f"diffusion train steps/sec (batch {BATCH}x{MAX_ATOMS}, {n_params/1e6:.2f}M params)",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
