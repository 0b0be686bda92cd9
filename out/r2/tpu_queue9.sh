#!/bin/bash
# TPU queue 9: MI probe at lower type temperatures (runs after queue8).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while kill -0 "$1" 2>/dev/null; do sleep 20; done
for TT in 0.5 0.0; do
  timeout 1800 python -u -m arreau_tpu.cli.generate \
    --checkpoint_dir=out/r2/ckpt_conv2 --tag=best --use_ema=False \
    --num_crystals=200 --batch_size=100 --num_atoms_per_sample=8 \
    --type_temperature=$TT \
    --out_dir=out/r2/q2_tt$TT --quality_ref=synthetic:20000:0 \
    > out/r2/quality_tt$TT.log 2>&1
done
echo QUEUE9_DONE
