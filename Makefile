# Canonical targets, mirroring the reference Makefile (/root/reference/Makefile)
.PHONY: train train-dev generate prep-datasets profile test bench equivariance

prep-datasets:
	python -m arreau_tpu.data.prep

train:
	python -m arreau_tpu.cli.train_diffusion --num_timesteps=1000 --radius=5 \
		--max_neighbors=8 --batch_size=270 --lr=0.0003 --hidden_dim=200

train-dev:
	python -m arreau_tpu.cli.train_diffusion --dataset=synthetic --epochs=20 \
		--num_timesteps=1000 --radius=5 --max_neighbors=8 --batch_size=64 \
		--lr=0.0003 --hidden_dim=64 --basis_dim=64 --val_interval=5

generate:
	python -m arreau_tpu.cli.generate --checkpoint_dir=checkpoints --tag=last

profile:
	python -m arreau_tpu.cli.train_diffusion --dataset=synthetic --epochs=3 \
		--num_timesteps=100 --radius=5 --max_neighbors=8 --profiler=jax

equivariance:
	python -m arreau_tpu.exploration.verify_equivariance

test:
	python -m pytest tests/ -x -q

test-all:
	python -m pytest tests/ -q --runslow

bench:
	python bench.py

# full reference recipe (main_nbody.py defaults: 10k epochs on the 3k-sample
# nbody_small subset); reproduces the test MSE recorded in BASELINE.md
train-nbody:
	python -m arreau_tpu.cli.train_nbody --epochs=10000 --val_interval=20 --batch_size=100 --lr=1e-3

train-nbody-quick:
	python -m arreau_tpu.cli.train_nbody --epochs=100 --batch_size=100

train-qm9:
	python -m arreau_tpu.cli.train_qm9 --epochs=100

train-md17:
	python -m arreau_tpu.cli.train_md17 --epochs=100

train-mnist:
	python -m arreau_tpu.cli.train_mnist --epochs=50

relax:
	python -m arreau_tpu.cli.process_results --in_path=out/crystals.h5 --visualize=True

stats:
	python -m arreau_tpu.exploration.dataset_stats

eda:
	python -m arreau_tpu.exploration.lattice_eda

vp-check:
	python -m arreau_tpu.exploration.vp_prior_check

view-dataset:
	python -m arreau_tpu.exploration.view_crystals dataset

view-generated:
	python -m arreau_tpu.exploration.view_crystals generated

import-checkpoint:  # REF_CKPT=path/to/reference.ckpt
	python -m arreau_tpu.cli.import_checkpoint --ckpt=$(REF_CKPT) --out_dir=checkpoints-imported

export-sampler:
	python -m arreau_tpu.cli.export_sampler --checkpoint_dir=checkpoints \
		--batch_size=100 --num_atoms_per_sample=8 --out=out/sampler.stablehlo

# ---- round-4 evidence reproduction (committed converged checkpoints) ----

quality-ladder:  # strided-vs-full quality ladder on the committed checkpoint
	for S in 0 100 50 25; do \
	  python -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_base \
	    --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
	    --num_atoms_per_sample=8 --clip_denoised=False \
	    $${S:+$$( [ $$S -gt 0 ] && echo --sample_steps=$$S )} \
	    --out_dir=out/ladder_s$$S --quality_ref=synthetic:20000:0; \
	done; python out/r4/ladder_table.py

angle-ab:  # canonical angle-diffusion A/B quality from the committed legs
	python -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_base \
	  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
	  --num_atoms_per_sample=8 --clip_denoised=False \
	  --out_dir=out/ab_off --quality_ref=synthetic:20000:0
	python -m arreau_tpu.cli.generate --checkpoint_dir=out/r4/ckpt_ang_on \
	  --tag=best --use_ema=False --num_crystals=500 --batch_size=100 \
	  --num_atoms_per_sample=8 --clip_denoised=False \
	  --out_dir=out/ab_on --quality_ref=synthetic:20000:0

oracle-tests:  # parity tier against the reference's own torch code
	python -m pytest tests/test_reference_oracle.py tests/test_import_e2e_bound.py -q
