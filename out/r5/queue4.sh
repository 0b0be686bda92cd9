#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q QUEUE3_DONE out/r5/queue3.log 2>/dev/null; do sleep 60; done
timeout 3000 python -u out/r5/exp_conv_fwd.py 2>out/r5/exp_conv_fwd2.err
echo QUEUE4_DONE
