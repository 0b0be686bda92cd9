#!/bin/bash
# Trimmed serial TPU queue (session 3d): highest-value pending items from
# tpu_queue_resume.sh. Remote compiles are serial — one job at a time.
#   bash out/r3/queue2.sh > out/r3/queue2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. tunnel sanity
timeout 600 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. serving export on TPU (embeds the Mosaic kernels) + timed exported call
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

# 2. strided (DDIM) sampler quality: S=50/100 vs the full T=1000 chain
# (comparison point: out/r3/q_mi002/quality.json)
for S in 50 100; do
  timeout 2400 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r3/ckpt_mi002 \
    --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
    --num_atoms_per_sample=8 --clip_denoised=False --sample_steps=$S \
    --out_dir=out/r3/q_ddim$S --quality_ref=synthetic:20000:0
done

# 3. scoped-vmem flag sweep for the 2.2 ms async-copy waits
timeout 1800 python -u out/r3/exp_vmem_flags.py vmem32 --xla_tpu_scoped_vmem_limit_kib=32768
timeout 1800 python -u out/r3/exp_vmem_flags.py vmem64 --xla_tpu_scoped_vmem_limit_kib=65536

# 4. headline bench refresh (canonical + sweep + sampler ladder)
timeout 3600 python -u bench.py --sweep --sampler && cp BENCH_DETAIL.json out/r3/BENCH_DETAIL_r3.json

echo QUEUE2_DONE
