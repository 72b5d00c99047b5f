"""Bridge: re-export the CPU suite's synthetic schema/batch builders
without importing tests/conftest.py (which pins the CPU backend)."""

import numpy as np

from deepfm_tpu.data.schema import DatasetSchema, FeatureType, FieldSchema


def make_synth_schema() -> DatasetSchema:
    fields = {
        "user": FieldSchema("user", FeatureType.SPARSE, 50, 16, "user"),
        "item": FieldSchema("item", FeatureType.SPARSE, 80, 16, "item"),
        "tags": FieldSchema(
            "tags", FeatureType.SEQUENCE, 12, 8, "item", max_length=4,
            combiner="mean",
        ),
        "price": FieldSchema("price", FeatureType.DENSE, 0, 8, "item"),
        "hour": FieldSchema("hour", FeatureType.DENSE, 0, 4, "context"),
    }
    return DatasetSchema(fields=fields)


def make_synth_batch(schema: DatasetSchema, batch: int = 32, seed: int = 0):
    rng = np.random.default_rng(seed)
    feats = {}
    for f in schema.fields.values():
        if f.feature_type == FeatureType.SPARSE:
            feats[f.name] = rng.integers(0, f.vocabulary_size, batch)
        elif f.feature_type == FeatureType.SEQUENCE:
            vals = rng.integers(0, f.vocabulary_size, (batch, f.max_length))
            lengths = rng.integers(1, f.max_length + 1, batch)
            for i, ln in enumerate(lengths):
                vals[i, ln:] = 0
            feats[f.name] = vals
        else:
            feats[f.name] = rng.normal(size=batch).astype(np.float32)
    labels = rng.integers(0, 2, batch).astype(np.float32)
    return feats, labels
