#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
timeout 1800 python -u out/r2/bench_pieces3.py > out/r2/bench_pieces3.log 2>&1
echo QUEUE8_DONE
