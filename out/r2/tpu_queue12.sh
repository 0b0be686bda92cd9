#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 4000 python -u -m arreau_tpu.cli.train_nbody \
  --epochs=10000 --val_interval=20 --lr=1e-3 \
  --checkpoint_dir=out/r2/ckpt_nbody_lr1e3 \
  > out/r2/nbody_lr1e3.log 2>&1
rm -rf out/r2/profile_trace3
sed "s#out/r2/profile_trace2#out/r2/profile_trace3#" out/r2/profile_step2.py > out/r2/profile_step3.py
timeout 1800 python -u out/r2/profile_step3.py > out/r2/profile3.log 2>&1
echo QUEUE12_DONE
