#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
timeout 1500 python -u out/r2/tpu_verify_kernel2.py > out/r2/pallas_parity4.log 2>&1
timeout 600 python -u bench.py > out/r2/bench_final.log 2>&1
echo QUEUE15_DONE
