#!/bin/bash
# Serial TPU work queue for when the tunnel comes back (remote compiles are
# serial — never run two fresh-compile jobs concurrently). Fire with:
#   bash out/r3/tpu_queue_resume.sh > out/r3/queue_resume.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. tunnel sanity: a trivial op end-to-end
timeout 600 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. step bench: confirm 32.7 ms + measure the stacked-readout delta
timeout 1800 python -u out/r3/exp_vmem_flags.py baseline_stacked
ARREAU_STACKED_READOUT=0 timeout 1800 python -u out/r3/exp_vmem_flags.py readout_per_layer

# 3. basis-bwd kernel anatomy (v0 re-measure + pending variants)
timeout 2400 python -u out/r3/exp_basis_bwd.py v0_current v1_nogelu
timeout 2400 python -u out/r3/exp_basis_bwd.py v2_onesel v3_neither

# 4. scoped-vmem flag sweep for the 2.2 ms async-copy waits
timeout 1800 python -u out/r3/exp_vmem_flags.py vmem32 --xla_tpu_scoped_vmem_limit_kib=32768
timeout 1800 python -u out/r3/exp_vmem_flags.py vmem64 --xla_tpu_scoped_vmem_limit_kib=65536

# 5. headline bench refresh (canonical + sweep + sampler ladder)
timeout 3600 python -u bench.py --sweep --sampler

# 6. angle-diffusion experiment: same recipe as the mi002 baseline run
# (out/r3/q_mi002/quality.json is the fixed-angle comparison point for
# w1_angles_deg) but with --diffuse_angles
timeout 5000 python -u -m arreau_tpu.cli.train_diffusion --dataset=synthetic \
  --synthetic_size=20000 --epochs=300 --val_interval=25 --hidden_dim=200 \
  --basis_dim=256 --layers=5 --num_ori=16 --num_timesteps=1000 --radius=5 \
  --max_neighbors=8 --mask_prob=0.02 --diffuse_angles=True --batch_size=256 \
  --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 --buckets=24 \
  --checkpoint_dir=out/r3/ckpt_angles --log=False
timeout 2400 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r3/ckpt_angles \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False --out_dir=out/r3/q_angles \
  --quality_ref=synthetic:20000:0

# 7. strided (DDIM) sampler: throughput + quality at S=50/100 vs the full
# T=1000 chain on the same trained checkpoint (comparison: q_mi002/quality.json)
for S in 50 100; do
  timeout 2400 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r3/ckpt_mi002 \
    --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
    --num_atoms_per_sample=8 --clip_denoised=False --sample_steps=$S \
    --out_dir=out/r3/q_ddim$S --quality_ref=synthetic:20000:0
done

# 8. serving export on TPU (embeds the Mosaic kernels) + timed exported call
# vs the in-process sampler on the same chip
timeout 2400 python -u -m arreau_tpu.cli.export_sampler \
  --checkpoint_dir=out/r3/ckpt_mi002 --tag=best --use_ema=False \
  --batch_size=100 --num_atoms_per_sample=8 --sample_steps=100 \
  --out=out/r3/sampler_tpu.stablehlo
timeout 1200 python -u - <<'PY'
import time, json
import numpy as np
from jax import export
exp = export.deserialize(bytearray(open("out/r3/sampler_tpu.stablehlo", "rb").read()))
frac, types, lattice = exp.call(np.int32(0))  # compile
np.asarray(frac)
t0 = time.perf_counter(); n = 0
for s in range(1, 4):
    frac, types, lattice = exp.call(np.int32(s)); np.asarray(frac); n += frac.shape[0]
dt = time.perf_counter() - t0
print(json.dumps({"exported_serving_crystals_per_min": round(n / dt * 60, 1),
                  "batch": int(frac.shape[0]), "sample_steps": 100}))
PY

echo QUEUE_DONE
