"""CTR model registry and factory (reference: deepfm/models/__init__.py:12-36)."""

from __future__ import annotations

from typing import Callable

from deepfm_tpu.config import ExperimentConfig
from deepfm_tpu.data.packing import PackedSchema, pack_schema
from deepfm_tpu.data.schema import DatasetSchema
from deepfm_tpu.models.attention_deepfm import AttentionDeepFM
from deepfm_tpu.models.base import CTRModel, embedding_l2_loss
from deepfm_tpu.models.deepfm import DeepFM
from deepfm_tpu.models.xdeepfm import xDeepFM

MODEL_REGISTRY: dict[str, type[CTRModel]] = {
    "deepfm": DeepFM,
    "xdeepfm": xDeepFM,
    "attention_deepfm": AttentionDeepFM,
}


def create_model(
    name: str,
    schema: DatasetSchema | PackedSchema,
    config: ExperimentConfig,
    lookup_fn: Callable | None = None,
) -> CTRModel:
    """Instantiate a model by registry name.

    Accepts either a DatasetSchema (packed on the fly) or a pre-computed
    PackedSchema. ``lookup_fn`` overrides the embedding-row lookup (sharded /
    Pallas strategies).
    """
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model: {name}. Choose from {list(MODEL_REGISTRY)}")
    packed = schema if isinstance(schema, PackedSchema) else pack_schema(schema)
    packed_tables = False
    if lookup_fn is None and config.pallas.use_embedding_kernel:
        from deepfm_tpu.ops.pallas.embedding_kernel import pallas_lookup

        lookup_fn = pallas_lookup
    if lookup_fn is None:
        import jax

        on_tpu = jax.default_backend() == "tpu"
        if (
            on_tpu
            and config.pallas.use_packed_tables
            and config.training.optimizer != "lazy_adam"
            # packed layout is a single-shard detail: with a model axis
            # the tables row-shard (shard_map strategies pass a
            # lookup_fn; GSPMD "auto" can't partition the packed custom
            # call), so stay logical there
            and config.mesh.model_axis == 1
        ):
            # packed physical layout: wide gathers + packed densify bwd
            packed_tables = True
        elif on_tpu and config.pallas.use_grad_kernel:
            from deepfm_tpu.ops.pallas.grad_kernel import sparse_grad_lookup

            lookup_fn = sparse_grad_lookup
    return MODEL_REGISTRY[name](
        packed=packed, config=config, lookup_fn=lookup_fn,
        packed_tables=packed_tables,
    )


__all__ = [
    "AttentionDeepFM",
    "CTRModel",
    "DeepFM",
    "MODEL_REGISTRY",
    "create_model",
    "embedding_l2_loss",
    "xDeepFM",
]
