"""DeepFM: first-order + FM second-order + DNN tower.

logit = first_order + FM(field_embeddings) + Linear(DNN(flat_embeddings))
(reference: deepfm/models/deepfm.py:13-42).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from deepfm_tpu.models.base import CTRModel, compute_dtype_of
from deepfm_tpu.ops.dnn import DNN
from deepfm_tpu.ops.fm import fm_interaction
from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel


class DeepFM(CTRModel):
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
        fm_out = fm_interaction(field_embeddings)
        dnn_out = self.output_linear(self.dnn(flat_embeddings, train=train))
        return first_order + fm_out + dnn_out
