"""Ablation baselines: LR, FM, and DNN-only CTR models.

The standard comparison set for DeepFM-family papers (the DeepFM paper
evaluates against exactly these); each is a strict ablation of DeepFM
built from the same shared embedding engine, so `compare` renders an
honest wide/deep/both decomposition on any dataset. No reference
counterpart (the reference ships only the three full models,
deepfm/models/__init__.py:12-17) — model-family breadth beyond parity.

  lr:  logit = first_order                 (the "wide" half alone)
  fm:  logit = first_order + FM(field_emb) (classic FM: linear + pairwise)
  dnn: logit = Linear(DNN(flat))           (the "deep" half alone — no
                                            first-order term, matching
                                            the paper's DNN baseline)
"""

from __future__ import annotations

import jax
from flax import linen as nn

from deepfm_tpu.models.base import CTRModel, compute_dtype_of
from deepfm_tpu.ops.dnn import DNN
from deepfm_tpu.ops.fm import fm_interaction
from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel


class LogisticRegression(CTRModel):
    """First-order (wide) model: per-feature scalar weights + bias."""

    def _build_components(self) -> None:
        # setup-style modules must declare params here, not in forward
        self.bias = self.param("bias", nn.initializers.zeros, (1,))

    def _forward_components(
        self,
        first_order: jax.Array,
        field_embeddings: jax.Array,
        flat_embeddings: jax.Array,
        train: bool,
    ) -> jax.Array:
        return first_order + self.bias[None, :].astype(first_order.dtype)


class FM(CTRModel):
    """Factorization machine: first-order + pairwise interactions."""

    def _build_components(self) -> None:
        pass

    def _forward_components(
        self,
        first_order: jax.Array,
        field_embeddings: jax.Array,
        flat_embeddings: jax.Array,
        train: bool,
    ) -> jax.Array:
        return first_order + fm_interaction(field_embeddings)


class DNNOnly(CTRModel):
    """Deep half alone: MLP over the flat embeddings, no first-order
    term (the wide half would confound the wide/deep decomposition)."""

    def _build_components(self) -> None:
        cfg = self.config
        cdt = compute_dtype_of(cfg)
        self.dnn = DNN(
            hidden_units=cfg.dnn.hidden_units,
            activation=cfg.dnn.activation,
            dropout=cfg.dnn.dropout,
            use_batch_norm=cfg.dnn.use_batch_norm,
            compute_dtype=cdt,
            name="dnn",
        )
        fan_in = cfg.dnn.hidden_units[-1]
        self.output_linear = nn.Dense(
            1,
            kernel_init=torch_linear_kernel(fan_in),
            bias_init=torch_linear_bias(fan_in),
            dtype=cdt,
            name="output_linear",
        )

    def _forward_components(
        self,
        first_order: jax.Array,
        field_embeddings: jax.Array,
        flat_embeddings: jax.Array,
        train: bool,
    ) -> jax.Array:
        return self.output_linear(self.dnn(flat_embeddings, train=train))
