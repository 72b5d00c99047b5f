"""Multi-head self-attention over the field axis (AttentionDeepFM).

Capability parity with the reference block (reference:
deepfm/models/layers/attention.py:11-120): N stacked blocks of Q/K/V
projection (embed_dim -> attention_dim), scaled dot-product softmax over the
F fields, output projection back to embed_dim, optional residual + LayerNorm.

F is small (~16-40 fields), so the whole score matrix fits comfortably in
VMEM — no flash-style tiling required. Two execution paths share one
parameter set: the jnp path (XLA batched matmuls) and the fully-fused
feature-major Pallas block kernel
(ops/pallas/attention_fmajor_kernel.py, flag
``pallas.use_attention_kernel``) that keeps Q/K/V/scores/context in
VMEM with the batch tile on the 128-lane axis.
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
    def __call__(self, x: jax.Array, feature_major: bool = False) -> jax.Array:
        if feature_major:
            f, d, b = x.shape  # (F, d, B): batch rides the 128-lane axis
        else:
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

        if feature_major:
            # x is (F, d, B) here — fully fused feature-major kernel
            # (fwd AND bwd), batch on the 128-lane axis
            from deepfm_tpu.ops.pallas.attention_fmajor_kernel import (
                make_attention_block_fmajor,
            )

            fn = make_attention_block_fmajor(
                self.num_heads, self.use_residual
            )
            return fn(x.astype(self.compute_dtype), p)

        # No sample-major fused fallback: the round-2 sample-major kernel
        # was deleted in round 5 — the f-major kernel beats it AND XLA at
        # every shipped geometry (RESULTS.md round-4/5 attention A/Bs),
        # its only remaining domain (F<=16 with f-major ineligible) never
        # occurs in practice, and its backward had a latent cotangent-
        # dtype bug under bf16 compute that the A/B harness exposed. When
        # the f-major kernel is ineligible the XLA tower below runs.
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
        # NOTE (round-3 negative result, measured on v5e at F=27): a
        # broadcast-multiply + reduction formulation of the two einsums
        # (avoiding the B·H tiny 27x16x27 batched matmuls) profiled
        # WORSE end to end — 80.5 ms/step vs 69 ms — because XLA
        # materializes the (B, F, F, H) f32 score tensors plus ~6 ms of
        # layout copies around the 4-D broadcasts. The einsum form
        # stays; the attention tower's cost at CTR field counts is
        # layout/copy-bound, not MXU-bound (see RESULTS.md).
        scores = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
        weights = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhij,bjhd->bihd", weights, v).reshape(b * f, a)
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
        fm = False
        if self.use_pallas:
            from deepfm_tpu.ops.pallas.attention_fmajor_kernel import (
                fmajor_eligible,
            )

            b, f, d = x.shape
            fm = fmajor_eligible(
                b, f, d, self.attention_dim, self.num_heads, x.dtype.itemsize
            )
        if fm:
            # One transpose around the WHOLE stack: every block runs the
            # fully-fused feature-major kernel on (F, d, B) with batch in
            # lanes — no lane padding at any field count (the sample-major
            # kernel's F<=16 limitation does not apply).
            x = jnp.transpose(x, (1, 2, 0))
            for block in self.blocks:
                x = block(x, feature_major=True)
            return jnp.transpose(x, (2, 0, 1))
        for block in self.blocks:
            x = block(x)
        return x
