#!/bin/bash
# Queue 4 (after queue 3): MNIST-superpixels + bench sweep/loader modes.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while pgrep -f tpu_queue3.sh > /dev/null; do sleep 60; done

python -u -m arreau_tpu.cli.train_mnist \
  --epochs=50 --synthetic_size=4000 --batch_size=96 \
  --checkpoint_dir=out/r2/ckpt_mnist \
  > out/r2/train_mnist.log 2>&1

python -u bench.py --sweep --loader > out/r2/bench_sweep.log 2>&1

echo QUEUE4_DONE
