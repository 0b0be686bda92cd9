#!/bin/bash
# Round-4 TPU queue 5: best-of-both quality point (angle-diffused + strided)
# and a final full bench refresh after the basis-bwd gelu fix.
# Launch: bash out/r4/queue5.sh > out/r4/queue5.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 480); do
  grep -q QUEUE4_DONE out/r4/queue4.log && break
  sleep 15
done

timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. angle-diffused leg sampled with the S=100 serving default
timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_ang_on \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False --sample_steps=100 \
  --out_dir=out/r4/q_ang_s100 --quality_ref=synthetic:20000:0
echo STEP1_ANG_S100_DONE

# 2. final full bench pass post-gelu-fix (headline + sweep + sampler) so the
# committed BENCH_DETAIL.json reflects the shipped kernels
timeout 5400 python -u bench.py --sweep --sampler 2> out/r4/bench_final.err
cp BENCH_DETAIL.json out/r4/BENCH_DETAIL_r4_final.json || true
echo QUEUE5_DONE
