#!/bin/bash
# TPU queue 7: rerun the EGNN N-body baseline with the velocity term.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
timeout 7000 python -u -m arreau_tpu.cli.train_nbody \
  --epochs=10000 --val_interval=20 --model=egnn --hidden_dim=64 --layers=4 \
  --checkpoint_dir=out/r2/ckpt_nbody_egnn2 \
  > out/r2/nbody_egnn2.log 2>&1
echo QUEUE7_DONE
