#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q QUEUE10_DONE out/r5/queue10.log 2>/dev/null; do sleep 60; done
timeout 3000 python -u -m arreau_tpu.exploration.verify_equivariance 2>&1 | tail -20 > out/r5/equivariance_tpu.log
echo QUEUE11_DONE
