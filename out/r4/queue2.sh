#!/bin/bash
# Round-4 TPU queue 2: MFU levers (VERDICT r3 item 4) + headline refresh.
# Launch AFTER queue1 finishes: bash out/r4/queue2.sh > out/r4/queue2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for queue1 (poll its sentinel), max ~90 min
for i in $(seq 1 360); do
  grep -q QUEUE1_DONE out/r4/queue1.log && break
  sleep 15
done

# 0. tunnel sanity
timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. LN staging A/B: explicit f32 LN input copy (current) vs flax-native
# upcast inside the stat reduction (targets the 2.2 ms async-copy waits the
# r3 phase table mapped to f32 LN-stat blocks in scoped VMEM S(1))
timeout 2400 python -u out/r3/exp_vmem_flags.py ln_f32copy
ARREAU_LN_NATIVE=1 timeout 2400 python -u out/r3/exp_vmem_flags.py ln_native

# 2. profile + phase table on the winner (assume native; re-run manually if
# the A/B says otherwise)
ARREAU_LN_NATIVE=1 timeout 2400 python -u out/r3/profile_step.py out/r4/trace || true
ls out/r4/trace/plugins/profile/ 2>/dev/null || true

# 3. headline bench refresh with the winner (sweep included)
ARREAU_LN_NATIVE=1 timeout 3600 python -u bench.py --sweep 2> out/r4/bench_sweep.err
cp BENCH_DETAIL.json out/r4/BENCH_DETAIL_r4.json || true

echo QUEUE2_DONE
