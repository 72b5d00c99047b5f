"""Bring your own dataset: define a schema, pack arrays, train any model.

The framework is fully schema-driven — nothing references MovieLens column
names. This example builds a 4-field dataset from raw numpy arrays.

    python examples/custom_schema.py
"""

# allow running straight from a source checkout (repo root on sys.path)
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from deepfm_tpu.config import config_from_dict
from deepfm_tpu.data.dataset import TabularDataset
from deepfm_tpu.data.packing import pack_schema
from deepfm_tpu.data.schema import DatasetSchema, FeatureType, FieldSchema
from deepfm_tpu.data.transforms import LabelEncoder, MultiHotEncoder
from deepfm_tpu.models import create_model
from deepfm_tpu.training.trainer import Trainer

rng = np.random.default_rng(0)
n = 20_000

# ---- raw columns ----------------------------------------------------
user_raw = rng.integers(1000, 1300, n)  # arbitrary id space
category_raw = rng.choice(["sports", "news", "music", "tech"], n)
tags_raw = [
    list(rng.choice(["a", "b", "c", "d", "e"], rng.integers(1, 4)))
    for _ in range(n)
]
price = rng.lognormal(0, 1, n).astype(np.float32)
labels = (
    (user_raw % 3 == 0) ^ (category_raw == "music")
).astype(np.float32)

# ---- fit encoders (index 0 is reserved for OOV/padding) --------------
user_enc = LabelEncoder().fit(user_raw)
cat_enc = LabelEncoder().fit(category_raw)
tag_enc = MultiHotEncoder(max_length=4).fit(tags_raw)

schema = DatasetSchema(
    fields={
        "user": FieldSchema(
            "user", FeatureType.SPARSE, user_enc.vocabulary_size, 16, "user"
        ),
        "category": FieldSchema(
            "category", FeatureType.SPARSE, cat_enc.vocabulary_size, 8, "item"
        ),
        "tags": FieldSchema(
            "tags", FeatureType.SEQUENCE, tag_enc.vocabulary_size, 8, "item",
            max_length=4, combiner="mean",
        ),
        "price": FieldSchema("price", FeatureType.DENSE, 0, 8, "item"),
    }
)

features = {
    "user": user_enc.transform(user_raw),
    "category": cat_enc.transform(category_raw),
    "tags": tag_enc.transform(tags_raw),
    "price": np.log1p(price),
}
dataset = TabularDataset(features, labels)

# ---- train any registered model over it ------------------------------
packed = pack_schema(schema)
config = config_from_dict(
    {
        "model_name": "xdeepfm",
        "output_dir": "/tmp/custom-out",
        "cin": {"layer_sizes": [32, 32]},
        "training": {"num_epochs": 8, "batch_size": 2048},
    }
)
model = create_model(config.model_name, packed, config)
arrays = dataset.pack(packed)
trainer = Trainer(model, packed, config, arrays, arrays, arrays)
print("best:", trainer.train())
