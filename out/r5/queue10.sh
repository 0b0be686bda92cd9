#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5400 python -u bench.py --sweep --loader --sampler --ceiling 2>out/r5/bench_final.err
cp BENCH_DETAIL.json out/r5/BENCH_DETAIL_r5_final.json || true
echo QUEUE10_DONE
