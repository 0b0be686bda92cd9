#!/bin/bash
# Resume the CPU angle-diffusion demo: finish the --diffuse_angles=True leg
# (train resumes from out/r3/ckpt_ang_on/last), then generate + quality for
# both legs. Comparison point: out/r3/q_ang_off/quality.json.
set -x
cd /root/repo
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo

timeout 14000 python -u -m arreau_tpu.cli.train_diffusion --dataset synthetic \
  --synthetic_size 2000 --epochs 150 --val_interval 25 --hidden_dim 64 \
  --basis_dim 64 --layers 3 --num_ori 8 --num_timesteps 500 --radius 5 \
  --max_neighbors 8 --batch_size 256 --lr 3e-4 --warmup 10 --log False \
  --diffuse_angles True --checkpoint_dir out/r3/ckpt_ang_on 2>&1 | tail -6

timeout 3000 python -u -m arreau_tpu.cli.generate --checkpoint_dir out/r3/ckpt_ang_on \
  --tag best --use_ema False --num_crystals 200 --batch_size 100 \
  --num_atoms_per_sample 8 --clip_denoised False --out_dir out/r3/q_ang_on \
  --quality_ref synthetic:2000:0 2>&1 | tail -18

echo ANGLE_DEMO_DONE
