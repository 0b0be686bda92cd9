#!/bin/bash
# A/B the o-block forward in the PRODUCTION step (20-step warm averages,
# one session, interleaved to cancel tunnel drift): OB=1, OB=4, OB=1, OB=4
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for ob in 1 4 1 4; do
  ARREAU_CONV_FWD_OBLK=$ob timeout 2400 python -u bench.py 2>>out/r5/bench_oblk.err
done
echo QUEUE14_DONE
