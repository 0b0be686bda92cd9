#!/bin/bash
# final sanity: plain bench at HEAD (the driver's contract invocation)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 2400 python -u bench.py 2>out/r5/bench_head.err
echo QUEUE18_DONE
