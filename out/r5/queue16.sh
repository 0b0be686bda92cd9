#!/bin/bash
# Round-5 robustness leg: fresh seed, the r5 DEFAULT recipe (angle diffusion
# on by default now), canonical scale; then the matched-size S=100 quality row.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5000 python -u -m arreau_tpu.cli.train_diffusion --dataset=synthetic \
  --synthetic_size=20000 --epochs=300 --val_interval=25 --hidden_dim=200 \
  --basis_dim=256 --layers=5 --num_ori=16 --num_timesteps=1000 --radius=5 \
  --max_neighbors=8 --mask_prob=0.02 --batch_size=256 --lr=3e-4 --warmup=10 \
  --compute_dtype=bfloat16 --buckets=24 --seed=77 \
  --checkpoint_dir=out/r5/ckpt_seed77 --log=False
echo STEP1_TRAIN_SEED77_DONE
timeout 4000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r5/ckpt_seed77 \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=24 --num_atoms_dist=ref --clip_denoised=False \
  --sample_steps=100 --out_dir=out/r5/q_seed77_s100 --quality_ref=synthetic:20000:0
echo QUEUE16_DONE
