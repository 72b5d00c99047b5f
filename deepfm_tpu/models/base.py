"""Base CTR model: shared embedding engine + model-specific heads.

Mirrors the reference composition contract (reference:
deepfm/models/base.py:15-83): a shared FeatureEmbedding produces the three
views, subclasses combine them into a raw logit (B, 1); sigmoid only in
``predict``; L2 regularization applies to embedding parameters only.

JAX shape: models are flax.linen Modules — pure init/apply functions over
parameter pytrees. Training-only behaviors (dropout, batch-stat updates) are
driven by the ``train`` flag + rng threading, not global module state.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfm_tpu.config import ExperimentConfig
from deepfm_tpu.data.packing import PackedSchema
from deepfm_tpu.ops.embedding import FeatureEmbedding


def compute_dtype_of(config: ExperimentConfig):
    return jnp.bfloat16 if config.training.compute_dtype == "bfloat16" else (
        jnp.float32
    )


class CTRModel(nn.Module):
    """Base class: embedding -> subclass heads -> raw logit (B, 1)."""

    packed: PackedSchema
    config: ExperimentConfig
    lookup_fn: Callable | None = None
    packed_tables: bool = False
    packed_lookup_factory: Callable | None = None

    def setup(self) -> None:
        self.embedding = FeatureEmbedding(
            packed=self.packed,
            fm_embed_dim=self.config.feature.fm_embed_dim,
            lookup_fn=self.lookup_fn,
            compute_dtype=compute_dtype_of(self.config),
            packed_tables=self.packed_tables,
            packed_lookup_factory=self.packed_lookup_factory,
            name="embedding",
        )
        self._build_components()

    def _build_components(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def _forward_components(
        self,
        first_order: jax.Array,
        field_embeddings: jax.Array,
        flat_embeddings: jax.Array,
        train: bool,
    ) -> jax.Array:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(
        self,
        ids: jax.Array,
        dense: jax.Array,
        *,
        train: bool = False,
        rows_override: dict | None = None,
    ) -> jax.Array:
        first_order, field_embeddings, flat_embeddings = self.embedding(
            ids, dense, rows_override=rows_override
        )
        logit = self._forward_components(
            first_order, field_embeddings, flat_embeddings, train
        )
        return logit.astype(jnp.float32)

    def predict(self, ids: jax.Array, dense: jax.Array) -> jax.Array:
        """Probabilities in [0, 1] — sigmoid over the raw logit."""
        return jax.nn.sigmoid(self(ids, dense, train=False))


def embedding_l2_loss(
    params, l2_reg: float, exclude_tables: bool = False
) -> jax.Array:
    """l2_reg * sum of squared embedding params (reference base.py:78-83).

    ``exclude_tables`` skips the fused lookup tables — used by the
    lazy_adam path, which applies table L2 row-wise inside the sparse
    update instead of as an O(vocab) loss term.
    """
    emb = params["embedding"] if "embedding" in params else params
    leaves = []
    for name, p in emb.items():
        if exclude_tables and name.startswith(("table_w", "fo_table")):
            continue
        leaves.extend(jax.tree_util.tree_leaves(p))
    sq = sum(jnp.sum(jnp.square(p)) for p in leaves)
    return l2_reg * sq
