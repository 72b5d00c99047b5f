.PHONY: train evaluate predict export serve compare test test-all test-tpu lint format bench synth-data synth-packed weak-scaling collective-bytes fused-collectives profile

CONFIG ?= configs/deepfm_movielens.yaml
ARGS ?=

train:
	python -m deepfm_tpu train --config $(CONFIG) --override $(ARGS)

evaluate:
	python -m deepfm_tpu evaluate --config $(CONFIG) --override $(ARGS)

predict:
	python -m deepfm_tpu predict --config $(CONFIG) --input $(INPUT) --output $(OUTPUT) --override $(ARGS)

export:
	python -m deepfm_tpu export --config $(CONFIG) --output $(OUTPUT) --override $(ARGS)

serve:
	python -m deepfm_tpu serve --config $(CONFIG) --port $(or $(PORT),8080) --override $(ARGS)

compare:
	python -m deepfm_tpu compare --dir outputs

synth-data:
	python -m deepfm_tpu synth-data --dir data/ml-100k-synth --rows 50000

synth-packed:
	python -m deepfm_tpu synth-packed --dir data/criteo-packed --rows 1000000

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q -m ""

test-tpu:
	python -m pytest tests_tpu/ -q -m tpu

bench:
	python bench.py

weak-scaling:
	python scripts/weak_scaling.py --devices 1 2 4 8

collective-bytes:
	python scripts/collective_bytes.py

fused-collectives:
	python scripts/fused_collective_bytes.py

profile:
	python scripts/profile_step.py --model $(MODEL)

lint:
	ruff check deepfm_tpu tests bench.py __graft_entry__.py || true

format:
	ruff format deepfm_tpu tests bench.py __graft_entry__.py || true
