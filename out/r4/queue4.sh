#!/bin/bash
# Round-4 TPU queue 4: serving-export refresh on the CONVERGED checkpoint +
# a 500-epoch leg to test convergence-dependence of the strided-quality win.
# Launch: bash out/r4/queue4.sh > out/r4/queue4.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. export the converged base checkpoint with the evidence-based default
# (S=100) and time the exported call
timeout 2400 python -u -m arreau_tpu.cli.export_sampler \
  --checkpoint_dir=out/r4/ckpt_base --tag=best --use_ema=False \
  --batch_size=100 --num_atoms_per_sample=8 \
  --out=out/r4/sampler_converged.stablehlo
timeout 1200 python -u - <<'PY'
import time, json
import numpy as np
from jax import export
exp = export.deserialize(bytearray(open("out/r4/sampler_converged.stablehlo", "rb").read()))
frac, types, lattice = exp.call(np.int32(0))  # compile
np.asarray(frac)
t0 = time.perf_counter(); n = 0
for s in range(1, 5):
    frac, types, lattice = exp.call(np.int32(s)); np.asarray(frac); n += frac.shape[0]
dt = time.perf_counter() - t0
print(json.dumps({"exported_serving_crystals_per_min": round(n / dt * 60, 1),
                  "batch": int(frac.shape[0]), "sample_steps": 100,
                  "checkpoint": "out/r4/ckpt_base best (converged)"}))
PY
echo STEP1_EXPORT_DONE

# 2. 500-epoch leg (same recipe, longer cosine) for the convergence-
# dependence question: does strided still beat the full chain?
timeout 8000 python -u -m arreau_tpu.cli.train_diffusion --dataset=synthetic \
  --synthetic_size=20000 --epochs=500 --val_interval=25 --hidden_dim=200 \
  --basis_dim=256 --layers=5 --num_ori=16 --num_timesteps=1000 --radius=5 \
  --max_neighbors=8 --mask_prob=0.02 --batch_size=256 --lr=3e-4 --warmup=10 \
  --compute_dtype=bfloat16 --buckets=24 \
  --checkpoint_dir=out/r4/ckpt_500 --log=False
echo STEP2_TRAIN500_DONE

timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_500 \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False \
  --out_dir=out/r4/q500_full --quality_ref=synthetic:20000:0
timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_500 \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False --sample_steps=100 \
  --out_dir=out/r4/q500_s100 --quality_ref=synthetic:20000:0
echo QUEUE4_DONE
