#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
timeout 1800 python -u out/r2/dump_hlo.py > out/r2/dump_hlo.log 2>&1
echo QUEUE11_DONE
