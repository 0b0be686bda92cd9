#!/bin/bash
# Follow-up TPU queue: serving-export timing against the random-weights
# canonical checkpoint (out/r3/ckpt_rand — weights of the lost trained ckpts
# don't affect serving *throughput*). Waits for queue2 to drain first
# (remote compiles are serial). Fire with:
#   bash out/r3/queue3.sh > out/r3/queue3.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
  grep -q QUEUE2_DONE out/r3/queue2.log 2>/dev/null && break
  sleep 15
done

timeout 2400 python -u -m arreau_tpu.cli.export_sampler \
  --checkpoint_dir=out/r3/ckpt_rand --tag=last --use_ema=False \
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
echo QUEUE3_DONE
