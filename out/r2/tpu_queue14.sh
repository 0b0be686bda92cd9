#!/bin/bash
# Queue 14: convergence + quality of the NEW default config (basis_bias=False)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
timeout 7000 python -u -m arreau_tpu.cli.train_diffusion \
  --dataset=synthetic --synthetic_size=20000 --epochs=500 --val_interval=25 \
  --hidden_dim=200 --basis_dim=256 --layers=5 --num_ori=16 \
  --num_timesteps=1000 --radius=5 --max_neighbors=8 \
  --batch_size=256 --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 \
  --buckets=24 --checkpoint_dir=out/r2/ckpt_conv3 --log=False \
  > out/r2/train_conv3.log 2>&1
timeout 1800 python -u -m arreau_tpu.cli.generate \
  --checkpoint_dir=out/r2/ckpt_conv3 --tag=best --use_ema=False \
  --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
  --clip_denoised=False \
  --out_dir=out/r2/q3 --quality_ref=synthetic:20000:0 \
  > out/r2/quality_run3.log 2>&1
echo QUEUE14_DONE
