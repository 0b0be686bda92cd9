#!/bin/bash
# Round-4 TPU queue 3: basis-bwd kernel anatomy (the 4.84 ms phase vs its
# ~2 ms roofline is the largest remaining MFU gap).
# Launch: bash out/r4/queue3.sh > out/r4/queue3.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 360); do
  grep -q QUEUE2_DONE out/r4/queue2.log && break
  sleep 15
done

timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# basis bwd variants: GELU share (v1), selection share (v2), both (v3)
timeout 2400 python -u out/r3/exp_basis_bwd.py v0_current v1_nogelu
timeout 2400 python -u out/r3/exp_basis_bwd.py v2_onesel v3_neither

echo QUEUE3_DONE
