#!/bin/bash
# Queue 2 (runs after queue 1): on-TPU kernel parity artifact + bench.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# wait for queue 1 to finish
while pgrep -f tpu_queue1.sh > /dev/null; do sleep 60; done
python -u out/r2/tpu_verify_kernel.py > out/r2/pallas_parity.log 2>&1
python -u bench.py > out/r2/bench_r2.log 2>&1
echo QUEUE2_DONE
