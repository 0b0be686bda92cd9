#!/bin/bash
# round-5 TPU queue 1: verify the kernel-wrapper refactor on the real chip
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== bench (canonical step) start $(date) ==="
timeout 3000 python -u bench.py 2>out/r5/bench_verify.err
echo "=== done rc=$? $(date) ==="
