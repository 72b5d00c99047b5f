"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding (mesh/shard_map/collectives) is unit-tested on host CPU
via ``xla_force_host_platform_device_count`` so the suite runs anywhere; the
real-TPU path is exercised by bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Interpret-mode Pallas attention is opt-in on CPU (real CPU runs take
# the fast XLA tower); the suite opts in so the kernel path stays
# covered without a TPU.
os.environ.setdefault("DEEPFM_TPU_FORCE_ATTN_KERNEL", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; force CPU through
# the config API so unit tests never ride the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles of the fused train step are
# expensive on small hosts; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_deepfm")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from deepfm_tpu.config import ExperimentConfig  # noqa: E402
from deepfm_tpu.data.schema import (  # noqa: E402
    DatasetSchema,
    FeatureType,
    FieldSchema,
)


def make_synth_schema() -> DatasetSchema:
    """Small mixed-type schema: 2 sparse + 1 sequence + 2 dense fields."""
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
    """Random feature dict matching the schema (numpy, reference layout)."""
    rng = np.random.default_rng(seed)
    feats = {}
    for f in schema.fields.values():
        if f.feature_type == FeatureType.SPARSE:
            feats[f.name] = rng.integers(0, f.vocabulary_size, batch)
        elif f.feature_type == FeatureType.SEQUENCE:
            vals = rng.integers(0, f.vocabulary_size, (batch, f.max_length))
            # random trailing padding
            lengths = rng.integers(1, f.max_length + 1, batch)
            for i, ln in enumerate(lengths):
                vals[i, ln:] = 0
            feats[f.name] = vals
        else:
            feats[f.name] = rng.normal(size=batch).astype(np.float32)
    labels = rng.integers(0, 2, batch).astype(np.float32)
    return feats, labels


@pytest.fixture
def synth_schema():
    return make_synth_schema()


@pytest.fixture
def small_config():
    from deepfm_tpu.config import config_from_dict

    return config_from_dict(
        {
            "feature": {"fm_embed_dim": 16},
            "dnn": {"hidden_units": [32, 16], "dropout": 0.0},
            "cin": {"layer_sizes": [16, 16]},
            "attention": {"num_heads": 2, "attention_dim": 16},
            "training": {"batch_size": 32, "num_epochs": 2},
        }
    )


@pytest.fixture
def default_config():
    return ExperimentConfig()
