#!/bin/bash
# TPU queue 6: after queue5 — EGNN baseline on the same nbody data, then the
# fine step bisect for the next perf push.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for queue5 (pid $1)
while kill -0 "$1" 2>/dev/null; do sleep 30; done

timeout 7000 python -u -m arreau_tpu.cli.train_nbody \
  --epochs=10000 --val_interval=20 --model=egnn --hidden_dim=64 --layers=4 \
  --checkpoint_dir=out/r2/ckpt_nbody_egnn \
  > out/r2/nbody_egnn.log 2>&1

timeout 1200 python -u out/r2/bench_pieces2.py > out/r2/bench_pieces2.log 2>&1

echo QUEUE6_DONE
