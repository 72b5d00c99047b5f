"""xDeepFM: first-order + CIN (explicit) + DNN (implicit) interactions.

logit = first_order + Linear(CIN(field_embeddings)) + Linear(DNN(flat))
with separate heads for the CIN and DNN towers
(reference: deepfm/models/xdeepfm.py:13-48).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from deepfm_tpu.models.base import CTRModel, compute_dtype_of
from deepfm_tpu.ops.cin import CIN, cin_output_dim
from deepfm_tpu.ops.dnn import DNN
from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel


class xDeepFM(CTRModel):
    def _build_components(self) -> None:
        cfg = self.config
        cdt = compute_dtype_of(cfg)
        self.cin = CIN(
            num_fields=self.packed.num_fields,
            embed_dim=cfg.feature.fm_embed_dim,
            layer_sizes=cfg.cin.layer_sizes,
            split_half=cfg.cin.split_half,
            compute_dtype=cdt,
            use_pallas_stack=cfg.pallas.use_cin_kernel,
            bf16_operands=cfg.pallas.cin_bf16_operands,
            name="cin",
        )
        self.dnn = DNN(
            hidden_units=cfg.dnn.hidden_units,
            activation=cfg.dnn.activation,
            dropout=cfg.dnn.dropout,
            use_batch_norm=cfg.dnn.use_batch_norm,
            compute_dtype=cdt,
            name="dnn",
        )
        cin_dim = cin_output_dim(cfg.cin.layer_sizes, cfg.cin.split_half)
        self.cin_linear = nn.Dense(
            1,
            kernel_init=torch_linear_kernel(cin_dim),
            bias_init=torch_linear_bias(cin_dim),
            dtype=cdt,
            name="cin_linear",
        )
        dnn_dim = cfg.dnn.hidden_units[-1]
        self.dnn_linear = nn.Dense(
            1,
            kernel_init=torch_linear_kernel(dnn_dim),
            bias_init=torch_linear_bias(dnn_dim),
            dtype=cdt,
            name="dnn_linear",
        )

    def _forward_components(
        self,
        first_order: jax.Array,
        field_embeddings: jax.Array,
        flat_embeddings: jax.Array,
        train: bool,
    ) -> jax.Array:
        cin_out = self.cin_linear(self.cin(field_embeddings))
        dnn_out = self.dnn_linear(self.dnn(flat_embeddings, train=train))
        return first_order + cin_out + dnn_out
