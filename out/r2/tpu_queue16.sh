#!/bin/bash
# Queue 16: convergence + quality of basis_bias="in" (the proposed new default)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 7000 python -u -m arreau_tpu.cli.train_diffusion \
  --dataset=synthetic --synthetic_size=20000 --epochs=500 --val_interval=25 \
  --hidden_dim=200 --basis_dim=256 --layers=5 --num_ori=16 \
  --num_timesteps=1000 --radius=5 --max_neighbors=8 \
  --batch_size=256 --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 \
  --basis_bias="'in'" \
  --buckets=24 --checkpoint_dir=out/r2/ckpt_conv4 --log=False \
  > out/r2/train_conv4.log 2>&1
for SEED in 0 7; do
  timeout 1800 python -u -m arreau_tpu.cli.generate \
    --checkpoint_dir=out/r2/ckpt_conv4 --tag=best --use_ema=False --seed=$SEED \
    --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
    --clip_denoised=False \
    --out_dir=out/r2/q4_s$SEED --quality_ref=synthetic:20000:0 \
    > out/r2/quality_run4_s$SEED.log 2>&1
done
echo QUEUE16_DONE
