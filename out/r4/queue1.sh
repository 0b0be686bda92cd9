#!/bin/bash
# Round-4 serial TPU queue (remote compiles are serial — one job at a time).
# Launch: bash out/r4/queue1.sh > out/r4/queue1.log 2>&1 &
#
# Covers VERDICT r3 items:
#   5. canonical angle-diffusion A/B on TPU (two converged runs + quality)
#   2. strided-sampler quality ladder S in {25,50,100} vs full T=1000 chain
#   6. sampler-throughput ladder re-run with the jit-cached sampler
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. tunnel sanity
timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('sum:', float(jnp.ones((8,128)).sum()))" || exit 1

# 1. canonical angles-OFF leg (identical to the r3 mi002 recipe). This
# checkpoint doubles as the converged model for the strided-quality ladder.
timeout 5000 python -u -m arreau_tpu.cli.train_diffusion --dataset=synthetic \
  --synthetic_size=20000 --epochs=300 --val_interval=25 --hidden_dim=200 \
  --basis_dim=256 --layers=5 --num_ori=16 --num_timesteps=1000 --radius=5 \
  --max_neighbors=8 --mask_prob=0.02 --batch_size=256 --lr=3e-4 --warmup=10 \
  --compute_dtype=bfloat16 --buckets=24 \
  --checkpoint_dir=out/r4/ckpt_base --log=False
echo STEP1_TRAIN_BASE_DONE

# 2. canonical angles-ON leg: same recipe + --diffuse_angles
timeout 5000 python -u -m arreau_tpu.cli.train_diffusion --dataset=synthetic \
  --synthetic_size=20000 --epochs=300 --val_interval=25 --hidden_dim=200 \
  --basis_dim=256 --layers=5 --num_ori=16 --num_timesteps=1000 --radius=5 \
  --max_neighbors=8 --mask_prob=0.02 --diffuse_angles=True --batch_size=256 \
  --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 --buckets=24 \
  --checkpoint_dir=out/r4/ckpt_ang_on --log=False
echo STEP2_TRAIN_ANG_DONE

# 3. strided-quality ladder on the converged base checkpoint: full T=1000
# chain then S=100/50/25, 500 crystals each, identical seeds/config.
timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_base \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False \
  --out_dir=out/r4/q_full --quality_ref=synthetic:20000:0
for S in 100 50 25; do
  timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_base \
    --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
    --num_atoms_per_sample=8 --clip_denoised=False --sample_steps=$S \
    --out_dir=out/r4/q_s$S --quality_ref=synthetic:20000:0
done
echo STEP3_QUALITY_LADDER_DONE

# 4. angle-leg quality (full chain), same protocol as q_full
timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_ang_on \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False \
  --out_dir=out/r4/q_ang_on --quality_ref=synthetic:20000:0
echo STEP4_ANGLE_QUALITY_DONE

# 5. sampler ladder re-run (jit-cached sampler) — reconcile the 2891-vs-1643
# crystals/min discrepancy at 100x8 (VERDICT item 6)
timeout 3600 python -u bench.py --sampler 2> out/r4/bench_sampler.err
cp BENCH_DETAIL.json out/r4/BENCH_DETAIL_sampler.json || true
echo QUEUE1_DONE
