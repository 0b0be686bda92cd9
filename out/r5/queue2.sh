#!/bin/bash
# Round-5 serial TPU queue 2 (VERDICT r4 items 3a/3c/5):
#   1-2. per-timestep length-marginal drift artifacts on the committed
#        converged checkpoints (diagnose_sampler at ckpt_base + ckpt_500)
#   3-4. full-chain x0-clamp mitigation A/B (--clip_denoised=True) on both
#        checkpoints, same 500@100x8 protocol as the r4 unclamped rows
#   5.   size-matched quality ladder (--num_atoms_dist=ref, pad 24) on
#        ckpt_base: full chain + S in {100,50,25}; matched angle leg S=100
# All runs REUSE the committed r4 best tags (binary-artifact policy:
# zero new weight blobs).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1-2. drift diagnosis
timeout 3000 python -u -m arreau_tpu.exploration.diagnose_sampler \
  --checkpoint_dir out/r4/ckpt_base --tag best --ref synthetic:20000:0 \
  --num_samples 256 --num_atoms_per_sample 8 --record_every 20 \
  --out out/r5/diag_base.json
echo STEP1_DIAG_BASE_DONE
timeout 3000 python -u -m arreau_tpu.exploration.diagnose_sampler \
  --checkpoint_dir out/r4/ckpt_500 --tag best --ref synthetic:20000:0 \
  --num_samples 256 --num_atoms_per_sample 8 --record_every 20 \
  --out out/r5/diag_500.json
echo STEP2_DIAG_500_DONE

# 3-4. x0-clamp mitigation A/B (full ancestral chain, clip ON)
timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_base \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=True \
  --out_dir=out/r5/q_clip_base --quality_ref=synthetic:20000:0
echo STEP3_CLIP_BASE_DONE
timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_500 \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=True \
  --out_dir=out/r5/q_clip_500 --quality_ref=synthetic:20000:0
echo STEP4_CLIP_500_DONE

# 5. size-matched ladder (counts from the training histogram, pad 24)
for S in 0 100 50 25; do
  timeout 4000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_base \
    --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
    --num_atoms_per_sample=24 --num_atoms_dist=ref --clip_denoised=False \
    $( [ $S -gt 0 ] && echo --sample_steps=$S ) \
    --out_dir=out/r5/qm_s$S --quality_ref=synthetic:20000:0
done
echo STEP5_MATCHED_LADDER_DONE
timeout 4000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_ang_on \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=24 --num_atoms_dist=ref --clip_denoised=False \
  --sample_steps=100 --out_dir=out/r5/qm_ang_s100 --quality_ref=synthetic:20000:0
echo QUEUE2_DONE
