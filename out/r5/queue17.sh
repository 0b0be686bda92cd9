#!/bin/bash
# EMA-on-eval mitigation A/B (the second candidate VERDICT r4 item 3c named):
# identical recipe to out/r4/ckpt_base (angles off for comparability with the
# r4 full-chain drift rows) + --ema 0.999; full-chain quality with EMA params,
# clip OFF, same 500@100x8 protocol.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5000 python -u -m arreau_tpu.cli.train_diffusion --dataset=synthetic \
  --synthetic_size=20000 --epochs=300 --val_interval=25 --hidden_dim=200 \
  --basis_dim=256 --layers=5 --num_ori=16 --num_timesteps=1000 --radius=5 \
  --max_neighbors=8 --mask_prob=0.02 --diffuse_angles=False --batch_size=256 \
  --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 --buckets=24 --ema=0.999 \
  --checkpoint_dir=out/r5/ckpt_ema --log=False
echo STEP1_TRAIN_EMA_DONE
timeout 4000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r5/ckpt_ema \
  --tag=best --use_ema=True --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False \
  --out_dir=out/r5/q_ema_full --quality_ref=synthetic:20000:0
echo STEP2_EMA_FULL_DONE
# raw-params control from the SAME run (separates EMA effect from seed)
timeout 4000 python -u -m arreau_tpu.cli.generate --checkpoint_dir=out/r5/ckpt_ema \
  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
  --num_atoms_per_sample=8 --clip_denoised=False \
  --out_dir=out/r5/q_ema_raw_full --quality_ref=synthetic:20000:0
echo QUEUE17_DONE
