#!/bin/bash
# TPU job queue 1: diffusion convergence training then full N-body benchmark.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u -m arreau_tpu.cli.train_diffusion \
  --dataset=synthetic --synthetic_size=20000 --epochs=300 --val_interval=10 \
  --hidden_dim=200 --basis_dim=256 --layers=5 --num_ori=16 \
  --num_timesteps=1000 --radius=5 --max_neighbors=8 \
  --batch_size=256 --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 \
  --buckets=24 --checkpoint_dir=out/r2/ckpt_conv --resume=True \
  > out/r2/train_conv.log 2>&1

python -u -m arreau_tpu.cli.train_nbody \
  --epochs=1000 --batch_size=100 --lr=5e-4 --warmup=10 \
  --max_training_samples=3000 --generate_train=10000 \
  --checkpoint_dir=out/r2/ckpt_nbody --data_dir=out/r2/nbody_data \
  > out/r2/train_nbody.log 2>&1

echo QUEUE1_DONE
