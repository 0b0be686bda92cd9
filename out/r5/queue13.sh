#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3000 python -u out/r5/exp_conv_fwd.py v_dma v0_full v_o2 v_o4 v0_full 2>out/r5/exp_oblk2.err
echo QUEUE13_DONE
