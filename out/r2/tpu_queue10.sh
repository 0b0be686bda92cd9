#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
rm -rf out/r2/profile_trace2
sed 's#out/r2/profile_trace#out/r2/profile_trace2#' out/r2/profile_step.py > out/r2/profile_step2.py
timeout 1800 python -u out/r2/profile_step2.py > out/r2/profile2.log 2>&1
echo QUEUE10_DONE
