#!/bin/bash
# r3 TPU queue 1: MI-ceiling experiment (mask_prob 0.02 vs 0.10, identical
# recipe) -> quality evals -> bench ladder (train sweep + loader + sampler
# grid) -> equivariance artifact with per-component table.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for MP in 0.02 0.10; do
  TAG=$(echo $MP | tr -d '.')
  timeout 5000 python -u -m arreau_tpu.cli.train_diffusion \
    --dataset=synthetic --synthetic_size=20000 --epochs=300 --val_interval=25 \
    --hidden_dim=200 --basis_dim=256 --layers=5 --num_ori=16 \
    --num_timesteps=1000 --radius=5 --max_neighbors=8 --mask_prob=$MP \
    --batch_size=256 --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 \
    --buckets=24 --checkpoint_dir=out/r3/ckpt_mi$TAG --log=False \
    > out/r3/train_mi$TAG.log 2>&1
  timeout 2400 python -u -m arreau_tpu.cli.generate \
    --checkpoint_dir=out/r3/ckpt_mi$TAG --tag=best --use_ema=False \
    --num_crystals=500 --batch_size=100 --num_atoms_per_sample=8 \
    --clip_denoised=False \
    --out_dir=out/r3/q_mi$TAG --quality_ref=synthetic:20000:0 \
    > out/r3/quality_mi$TAG.log 2>&1
done

timeout 6000 python -u bench.py --sweep --loader --sampler > out/r3/bench_full.log 2>&1
cp BENCH_DETAIL.json out/r3/BENCH_DETAIL_r3.json

timeout 3000 python -u -m arreau_tpu.exploration.verify_equivariance \
  > out/r3/equivariance_tpu.log 2>&1

echo QUEUE1_DONE
