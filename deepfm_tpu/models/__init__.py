"""CTR model registry and factory (reference: deepfm/models/__init__.py:12-36)."""

from __future__ import annotations

from typing import Callable

from deepfm_tpu.config import ConfigError, ExperimentConfig
from deepfm_tpu.data.packing import PackedSchema, pack_schema
from deepfm_tpu.data.schema import DatasetSchema
from deepfm_tpu.models.attention_deepfm import AttentionDeepFM
from deepfm_tpu.models.base import CTRModel, embedding_l2_loss
from deepfm_tpu.models.baselines import DNNOnly, FM, LogisticRegression
from deepfm_tpu.models.deepfm import DeepFM
from deepfm_tpu.models.xdeepfm import xDeepFM

MODEL_REGISTRY: dict[str, type[CTRModel]] = {
    "deepfm": DeepFM,
    "xdeepfm": xDeepFM,
    "attention_deepfm": AttentionDeepFM,
    # ablation baselines (models/baselines.py) — beyond reference scope
    "lr": LogisticRegression,
    "fm": FM,
    "dnn": DNNOnly,
}


def resolve_table_layout(config: ExperimentConfig) -> bool:
    """Resolve config.pallas.table_layout to packed (True) / logical.

    Backend is consulted ONLY for "auto"; "packed"/"logical" are honored
    on every backend, so a config fully determines the parameter tree
    (checkpoint metadata + utils/layout.py cover the "auto" case across
    backends). lazy_adam composes with BOTH layouts: on packed tables
    its row-sparse update addresses physical rows (see
    training/sparse_opt.py::table_ids_for_batch).
    """
    layout = config.pallas.table_layout
    if layout not in ("auto", "packed", "logical"):
        raise ConfigError(
            f"pallas.table_layout must be auto|packed|logical, got {layout!r}"
        )
    if layout == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return layout == "packed"


def create_model(
    name: str,
    schema: DatasetSchema | PackedSchema,
    config: ExperimentConfig,
    lookup_fn: Callable | None = None,
    mesh=None,
    packed_lookup_factory: Callable | None = None,
) -> CTRModel:
    """Instantiate a model by registry name.

    Accepts either a DatasetSchema (packed on the fly) or a pre-computed
    PackedSchema. Lookup resolution:

      * ``mesh`` with a model axis > 1 builds the sharded lookup
        strategies (config.mesh.embedding_strategy) for BOTH table
        layouts; otherwise
      * an explicit ``lookup_fn`` (logical layout) /
        ``packed_lookup_factory`` (packed layout) is used as given;
      * with neither, the single-device defaults apply (packed wide
        gather, or XLA gather with the Pallas grad-densify backward).
    """
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model: {name}. Choose from {list(MODEL_REGISTRY)}")
    packed = schema if isinstance(schema, PackedSchema) else pack_schema(schema)

    if mesh is not None and lookup_fn is None and packed_lookup_factory is None:
        from deepfm_tpu.training.trainer import sparse_fused_eligible

        if not sparse_fused_eligible(config, packed, mesh):
            from deepfm_tpu.parallel import (
                make_lookup_fn,
                make_packed_lookup_factory,
            )

            strategy = config.mesh.embedding_strategy
            lookup_fn = make_lookup_fn(mesh, strategy)
            packed_lookup_factory = make_packed_lookup_factory(mesh, strategy)
        # else: pure-DP mesh taking the fused sparse backward — the
        # trainer replicates the (ids, ct) pairs itself, so the default
        # single-shard packed gather is the right lookup (tables are
        # replicated under GSPMD)

    packed_tables = resolve_table_layout(config)
    sharded = lookup_fn is not None or packed_lookup_factory is not None
    if packed_tables and sharded and packed_lookup_factory is None:
        # the supplied lookup only understands the logical layout
        packed_tables = False
    if (
        packed_tables
        and packed_lookup_factory is None
        and mesh is not None
        and mesh.shape.get("model", 1) > 1
    ):
        # model-sharded mesh under strategy "auto": GSPMD cannot
        # partition the single-shard packed custom-vjp gather — it would
        # all-gather the whole table around it. Stay logical.
        packed_tables = False

    if not sharded:
        if lookup_fn is None and config.pallas.use_embedding_kernel:
            from deepfm_tpu.ops.pallas.embedding_kernel import pallas_lookup

            lookup_fn = pallas_lookup
            packed_tables = False
        if lookup_fn is None and config.pallas.use_grad_kernel:
            # serves the logical layout AND any packed-mode width group
            # whose rows are too wide to pack (128 // (d+1) == 1)
            import jax

            if jax.default_backend() == "tpu":
                from deepfm_tpu.training.trainer import (
                    sparse_fused_eligible,
                )

                # when the fused sparse backward-optimizer will take the
                # table path (all groups packable), this lookup would
                # never serve a group — and its mere presence used to
                # trip the trainer's "no custom lookup" gate, silently
                # disabling the fused path on REAL TPU backends (CPU
                # tests never install it, so only hardware ran the
                # two-pass chain). Skip the injection so the gate and
                # eligibility agree.
                if not sparse_fused_eligible(config, packed, mesh):
                    from deepfm_tpu.ops.pallas.grad_kernel import (
                        sparse_grad_lookup,
                    )

                    lookup_fn = sparse_grad_lookup
    return MODEL_REGISTRY[name](
        packed=packed,
        config=config,
        lookup_fn=lookup_fn,
        packed_tables=packed_tables,
        packed_lookup_factory=packed_lookup_factory,
    )


__all__ = [
    "AttentionDeepFM",
    "CTRModel",
    "DeepFM",
    "MODEL_REGISTRY",
    "create_model",
    "embedding_l2_loss",
    "resolve_table_layout",
    "xDeepFM",
]
