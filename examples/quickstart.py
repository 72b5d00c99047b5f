"""Quickstart: train DeepFM end-to-end on generated data, then evaluate.

Run from the repo root:

    python examples/quickstart.py
"""

# allow running straight from a source checkout (repo root on sys.path)
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepfm_tpu.config import config_from_dict
from deepfm_tpu.data.movielens import MovieLensAdapter
from deepfm_tpu.data.packing import pack_schema
from deepfm_tpu.data.synthetic import generate_movielens_like
from deepfm_tpu.models import create_model
from deepfm_tpu.training.trainer import Trainer

# 1. data — ML-100K format; swap for the real dataset directory if you
#    have it (https://grouplens.org/datasets/movielens/100k/)
data_dir = generate_movielens_like(
    "/tmp/quickstart-ml", num_users=300, num_items=400, num_rows=20_000
)

config = config_from_dict(
    {
        "model_name": "deepfm",
        "output_dir": "/tmp/quickstart-out",
        "data": {"data_dir": str(data_dir), "num_neg_eval": 99},
        "training": {"num_epochs": 3, "batch_size": 4096},
    }
)

# 2. build the pipeline: adapter -> schema -> packed layout -> datasets
adapter = MovieLensAdapter(config.data, seed=config.seed)
schema, train_ds, val_ds, test_ds = adapter.build()
packed = pack_schema(schema)
print(f"schema: {schema.num_fields} fields, total dim {schema.total_embedding_dim}")

# 3. model + trainer
model = create_model(config.model_name, packed, config)
trainer = Trainer(
    model=model,
    packed_schema=packed,
    config=config,
    train_data=train_ds.pack(packed),
    val_data=val_ds.pack(packed),
    test_data=test_ds.pack(packed),
    adapter=adapter,  # re-samples train negatives every epoch
)
best = trainer.train()
print("best validation metrics:", best)
