#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q QUEUE11_DONE out/r5/queue11.log 2>/dev/null; do sleep 60; done
timeout 3000 python -u out/r5/exp_conv_fwd.py v0_full v_o2 v_o4 2>out/r5/exp_oblk.err
echo QUEUE12_DONE
