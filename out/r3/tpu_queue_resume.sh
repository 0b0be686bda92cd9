#!/bin/bash
# Serial TPU work queue for when the tunnel comes back (remote compiles are
# serial — never run two fresh-compile jobs concurrently). Fire with:
#   bash out/r3/tpu_queue_resume.sh > out/r3/queue_resume.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. tunnel sanity: a trivial op end-to-end
timeout 600 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. step bench: confirm 32.7 ms + measure the stacked-readout delta
timeout 1800 python -u out/r3/exp_vmem_flags.py baseline_stacked
ARREAU_STACKED_READOUT=0 timeout 1800 python -u out/r3/exp_vmem_flags.py readout_per_layer

# 3. basis-bwd kernel anatomy (v0 re-measure + pending variants)
timeout 2400 python -u out/r3/exp_basis_bwd.py v0_current v1_nogelu
timeout 2400 python -u out/r3/exp_basis_bwd.py v2_onesel v3_neither

# 4. scoped-vmem flag sweep for the 2.2 ms async-copy waits
timeout 1800 python -u out/r3/exp_vmem_flags.py vmem32 --xla_tpu_scoped_vmem_limit_kib=32768
timeout 1800 python -u out/r3/exp_vmem_flags.py vmem64 --xla_tpu_scoped_vmem_limit_kib=65536

# 5. headline bench refresh (canonical + sweep + sampler ladder)
timeout 3600 python -u bench.py --sweep --sampler

echo QUEUE_DONE
