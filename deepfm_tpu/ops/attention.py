"""Multi-head self-attention over the field axis (AttentionDeepFM).

Capability parity with the reference block (reference:
deepfm/models/layers/attention.py:11-120): N stacked blocks of Q/K/V
projection (embed_dim -> attention_dim), scaled dot-product softmax over the
F fields, output projection back to embed_dim, optional residual + LayerNorm.

F is small (~16-40 fields), so the whole score matrix fits comfortably in
VMEM — the attention is a pair of MXU batched matmuls; no flash-style tiling
required. Shapes are kept (B, heads, F, head_dim) so XLA batches the matmuls
on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel


class AttentionBlock(nn.Module):
    embed_dim: int
    num_heads: int
    attention_dim: int
    use_residual: bool
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, d = x.shape
        head_dim = self.attention_dim // self.num_heads
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, self.compute_dtype))

        def dense(name: str, out_dim: int, fan_in: int):
            return nn.Dense(
                out_dim,
                kernel_init=torch_linear_kernel(fan_in),
                bias_init=torch_linear_bias(fan_in),
                dtype=self.compute_dtype,
                name=name,
            )

        q = dense("W_q", self.attention_dim, d)(x)
        k = dense("W_k", self.attention_dim, d)(x)
        v = dense("W_v", self.attention_dim, d)(x)

        def split_heads(t):
            return t.reshape(b, f, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, f, self.attention_dim)

        out = dense("W_out", self.embed_dim, self.attention_dim)(out)

        if self.use_residual:
            out = nn.LayerNorm(
                epsilon=1e-5, dtype=self.compute_dtype, name="layer_norm"
            )(out + x)
        return out


class MultiHeadSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int = 4
    attention_dim: int = 64
    num_layers: int = 1
    use_residual: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        if self.attention_dim % self.num_heads != 0:
            raise ValueError(
                f"attention_dim ({self.attention_dim}) must be divisible by "
                f"num_heads ({self.num_heads})"
            )
        self.blocks = [
            AttentionBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                attention_dim=self.attention_dim,
                use_residual=self.use_residual,
                compute_dtype=self.compute_dtype,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, field_embeddings: jax.Array) -> jax.Array:
        x = field_embeddings.astype(self.compute_dtype)
        for block in self.blocks:
            x = block(x)
        return x
