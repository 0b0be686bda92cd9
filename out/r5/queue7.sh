#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 2400 python -u /tmp/probe/tpu_cal.py 2>out/r5/cal.err
echo QUEUE7_DONE
