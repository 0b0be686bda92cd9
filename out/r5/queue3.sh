#!/bin/bash
# Round-5 TPU queue 3 (after queue2): conv-forward kernel anatomy (VERDICT
# item 4) + framework-ceiling bench row (hidden=256) + full bench refresh.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# wait for queue2 (serial remote compiles)
while ! grep -q QUEUE2_DONE out/r5/queue2.log 2>/dev/null; do sleep 60; done
timeout 3000 python -u out/r5/exp_conv_fwd.py 2>out/r5/exp_conv_fwd.err
echo STEP1_CONV_ANATOMY_DONE
timeout 3000 python -u bench.py --ceiling 2>out/r5/bench_ceiling.err
cp BENCH_DETAIL.json out/r5/BENCH_DETAIL_ceiling.json || true
echo QUEUE3_DONE
