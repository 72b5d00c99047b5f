"""AttentionDeepFM: FM + field self-attention + DNN.

logit = first_order + FM(field_embeddings)
      + Linear(DNN(concat[flatten(Attn(field_embeddings)), flat_embeddings]))
(reference: deepfm/models/attention_deepfm.py:14-66 — the DNN consumes the
attention-refined field embeddings concatenated with the raw flat view).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfm_tpu.models.base import CTRModel, compute_dtype_of
from deepfm_tpu.ops.attention import MultiHeadSelfAttention
from deepfm_tpu.ops.dnn import DNN
from deepfm_tpu.ops.fm import fm_interaction
from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel


class AttentionDeepFM(CTRModel):
    def _build_components(self) -> None:
        cfg = self.config
        cdt = compute_dtype_of(cfg)
        self.attention = MultiHeadSelfAttention(
            embed_dim=cfg.feature.fm_embed_dim,
            num_heads=cfg.attention.num_heads,
            attention_dim=cfg.attention.attention_dim,
            num_layers=cfg.attention.num_layers,
            use_residual=cfg.attention.use_residual,
            compute_dtype=cdt,
            use_pallas=cfg.pallas.use_attention_kernel,
            name="attention",
        )
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
        attn_out = self.attention(field_embeddings)
        attn_flat = attn_out.reshape(attn_out.shape[0], -1)
        dnn_input = jnp.concatenate([attn_flat, flat_embeddings], axis=1)
        dnn_out = self.output_linear(self.dnn(dnn_input, train=train))
        return first_order + fm_out + dnn_out
