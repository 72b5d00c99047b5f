"""Multi-head self-attention over the field axis (AttentionDeepFM).

Capability parity with the reference block (reference:
deepfm/models/layers/attention.py:11-120): N stacked blocks of Q/K/V
projection (embed_dim -> attention_dim), scaled dot-product softmax over the
F fields, output projection back to embed_dim, optional residual + LayerNorm.

F is small (~16-40 fields), so the whole score matrix fits comfortably in
VMEM — no flash-style tiling required. Two execution paths share one
parameter set: the jnp path (XLA batched matmuls) and the fully-fused
Pallas block kernel (ops/pallas/attention_kernel.py, flag
``pallas.use_attention_kernel``) that keeps Q/K/V/scores/context in VMEM.
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
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, d = x.shape
        a = self.attention_dim
        head_dim = a // self.num_heads

        p = {
            "wq": self.param("wq", torch_linear_kernel(d), (d, a)),
            "bq": self.param("bq", torch_linear_bias(d), (a,)),
            "wk": self.param("wk", torch_linear_kernel(d), (d, a)),
            "bk": self.param("bk", torch_linear_bias(d), (a,)),
            "wv": self.param("wv", torch_linear_kernel(d), (d, a)),
            "bv": self.param("bv", torch_linear_bias(d), (a,)),
            "wo": self.param("wo", torch_linear_kernel(a), (a, d)),
            "bo": self.param("bo", torch_linear_bias(a), (d,)),
        }
        if self.use_residual:
            p["ln_scale"] = self.param("ln_scale", nn.initializers.ones, (d,))
            p["ln_bias"] = self.param("ln_bias", nn.initializers.zeros, (d,))

        if self.use_pallas:
            from deepfm_tpu.ops.pallas.attention_kernel import (
                make_attention_block_pallas,
            )

            fn = make_attention_block_pallas(self.num_heads, self.use_residual)
            return fn(x.astype(self.compute_dtype), p).astype(
                self.compute_dtype
            )

        cdt = self.compute_dtype
        x = x.astype(cdt)
        x2 = x.reshape(b * f, d)
        q = (x2 @ p["wq"].astype(cdt) + p["bq"].astype(cdt)).reshape(
            b, f, self.num_heads, head_dim
        )
        k = (x2 @ p["wk"].astype(cdt) + p["bk"].astype(cdt)).reshape(
            b, f, self.num_heads, head_dim
        )
        v = (x2 @ p["wv"].astype(cdt) + p["bv"].astype(cdt)).reshape(
            b, f, self.num_heads, head_dim
        )
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, cdt))
        if f * f <= 4096:
            # Small field counts: the einsum forms are B·H separate
            # (F, hd) @ (hd, F) batched matmuls — 65k 27x16x27 products
            # at bench scale, far too small to fill the 128x128 MXU
            # (profiled: the attention tower cost ~41 ms/step of
            # mostly-idle MXU passes). The broadcast-multiply +
            # reduction form keeps the same math (B·F²·A MACs, well
            # under a millisecond of VPU work) in plain elementwise
            # fusions, with scores laid out (B, i, j, H) so no
            # transposes materialize.
            scores = (
                jnp.sum(q[:, :, None] * k[:, None], axis=-1) * scale
            )  # (B, i, j, H)
            weights = jax.nn.softmax(scores, axis=2)
            ctx = jnp.sum(
                weights[..., None] * v[:, None], axis=2
            ).reshape(b * f, a)  # (B, i, H, hd) flattened
        else:
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
            weights = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", weights, v).reshape(
                b * f, a
            )
        out = (ctx @ p["wo"].astype(cdt) + p["bo"].astype(cdt)).reshape(
            b, f, d
        )
        if self.use_residual:
            y = out + x
            mean = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
            yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
            out = yn * p["ln_scale"].astype(cdt) + p["ln_bias"].astype(cdt)
        return out


class MultiHeadSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int = 4
    attention_dim: int = 64
    num_layers: int = 1
    use_residual: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

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
                use_pallas=self.use_pallas,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, field_embeddings: jax.Array) -> jax.Array:
        x = field_embeddings.astype(self.compute_dtype)
        for block in self.blocks:
            x = block(x)
        return x
