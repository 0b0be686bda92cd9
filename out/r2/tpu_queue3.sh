#!/bin/bash
# Queue 3 (after queue 2): sample-quality evaluation of the converged model.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while pgrep -f tpu_queue2.sh > /dev/null; do sleep 60; done

python -u -m arreau_tpu.cli.generate \
  --checkpoint_dir=out/r2/ckpt_conv --tag=best --use_ema=False \
  --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
  --out_dir=out/r2 --quality_ref=synthetic:20000:0 \
  > out/r2/quality_run.log 2>&1

python -u -m arreau_tpu.exploration.diagnose_sampler \
  --checkpoint_dir=out/r2/ckpt_conv --tag=best --ref=synthetic:20000:0 \
  --num_samples=64 --num_atoms_per_sample=8 --record_every=50 \
  --out=out/r2/diag.json \
  > out/r2/diag_run.log 2>&1

echo QUEUE3_DONE
