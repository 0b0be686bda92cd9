#!/bin/bash
# TPU queue 5 (round 2 continuation): loop-overhead validation -> bench
# refresh -> fresh 500-epoch convergence run -> quality -> side workloads.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. timing check: 4 epochs of the canonical synthetic config with the new
# in-jit rotation + deferred metrics (was 24 s/epoch)
timeout 1200 python -u -m arreau_tpu.cli.train_diffusion \
  --dataset=synthetic --synthetic_size=20000 --epochs=4 --val_interval=4 \
  --hidden_dim=200 --basis_dim=256 --layers=5 --num_ori=16 \
  --num_timesteps=1000 --radius=5 --max_neighbors=8 \
  --batch_size=256 --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 \
  --buckets=24 --checkpoint_dir=/tmp/loop_timing --log=False \
  > out/r2/loop_timing.log 2>&1

# 2. bench refresh at the current kernel (headline + sweep + loader mode)
timeout 900 python -u bench.py > out/r2/bench_headline2.log 2>&1
timeout 1800 python -u bench.py --sweep --loader > out/r2/bench_sweep2.log 2>&1

# 3. fresh convergence run, 500 epochs (the r2 earlier run stopped at 200/300)
timeout 14000 python -u -m arreau_tpu.cli.train_diffusion \
  --dataset=synthetic --synthetic_size=20000 --epochs=500 --val_interval=25 \
  --hidden_dim=200 --basis_dim=256 --layers=5 --num_ori=16 \
  --num_timesteps=1000 --radius=5 --max_neighbors=8 \
  --batch_size=256 --lr=3e-4 --warmup=10 --compute_dtype=bfloat16 \
  --buckets=24 --checkpoint_dir=out/r2/ckpt_conv2 --log=False \
  > out/r2/train_conv2.log 2>&1

# 4. quality eval from the new checkpoint (clip + noclip)
timeout 1800 python -u -m arreau_tpu.cli.generate \
  --checkpoint_dir=out/r2/ckpt_conv2 --tag=best --use_ema=False \
  --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
  --out_dir=out/r2/q2 --quality_ref=synthetic:20000:0 \
  > out/r2/quality_run2.log 2>&1
timeout 1800 python -u -m arreau_tpu.cli.generate \
  --checkpoint_dir=out/r2/ckpt_conv2 --tag=best --use_ema=False \
  --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
  --clip_denoised=False \
  --out_dir=out/r2/q2_noclip --quality_ref=synthetic:20000:0 \
  > out/r2/quality_run2_noclip.log 2>&1

# 5. side workloads: recorded accuracy numbers
timeout 3600 python -u -m arreau_tpu.cli.train_mnist \
  --epochs=50 --synthetic_size=4000 --batch_size=96 \
  --checkpoint_dir=out/r2/ckpt_mnist \
  > out/r2/train_mnist.log 2>&1
timeout 3600 python -u -m arreau_tpu.cli.train_qm9 \
  --epochs=300 --synthetic_size=2000 --batch_size=96 \
  --checkpoint_dir=out/r2/ckpt_qm9 \
  > out/r2/train_qm9.log 2>&1
timeout 3600 python -u -m arreau_tpu.cli.train_md17 \
  --epochs=300 --synthetic_size=1200 --batch_size=16 \
  --checkpoint_dir=out/r2/ckpt_md17 \
  > out/r2/train_md17.log 2>&1

echo QUEUE5_DONE
