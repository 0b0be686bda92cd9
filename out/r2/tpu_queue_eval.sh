#!/bin/bash
# Evaluation queue: bench -> quality (clip + noclip) -> diagnosis -> sweep -> nbody -> mnist
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -u out/r2/patch_meta.py > out/r2/patch_meta.log 2>&1

python -u bench.py > out/r2/bench_r2.log 2>&1

python -u -m arreau_tpu.cli.generate \
  --checkpoint_dir=out/r2/ckpt_conv --tag=best --use_ema=False \
  --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
  --out_dir=out/r2 --quality_ref=synthetic:20000:0 \
  > out/r2/quality_run.log 2>&1

python -u -m arreau_tpu.cli.generate \
  --checkpoint_dir=out/r2/ckpt_conv --tag=best --use_ema=False \
  --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
  --clip_denoised=False \
  --out_dir=out/r2/noclip --quality_ref=synthetic:20000:0 \
  > out/r2/quality_run_noclip.log 2>&1

python -u -m arreau_tpu.exploration.diagnose_sampler \
  --checkpoint_dir=out/r2/ckpt_conv --tag=best --ref=synthetic:20000:0 \
  --num_samples=64 --num_atoms_per_sample=8 --record_every=50 \
  --out=out/r2/diag.json \
  > out/r2/diag_run.log 2>&1

python -u bench.py --sweep --loader > out/r2/bench_sweep.log 2>&1

python -u -m arreau_tpu.cli.train_nbody \
  --epochs=1000 --batch_size=100 --lr=5e-4 --warmup=10 \
  --max_training_samples=3000 --generate_train=10000 \
  --checkpoint_dir=out/r2/ckpt_nbody --data_dir=out/r2/nbody_data \
  > out/r2/train_nbody.log 2>&1

python -u -m arreau_tpu.cli.train_mnist \
  --epochs=50 --synthetic_size=4000 --batch_size=96 \
  --checkpoint_dir=out/r2/ckpt_mnist \
  > out/r2/train_mnist.log 2>&1

echo EVAL_QUEUE_DONE
