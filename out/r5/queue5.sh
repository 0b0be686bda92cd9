#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3000 python -u out/r5/exp_conv_fwd.py 2>out/r5/exp_conv_fwd4.err
echo QUEUE5_DONE
