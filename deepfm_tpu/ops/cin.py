"""Compressed Interaction Network (CIN) for xDeepFM.

Capability parity with the reference CIN (reference:
deepfm/models/layers/cin.py:26-105): per layer an outer product between the
running hidden state (B, H, D) and the input (B, F, D), compressed by a
1x1 "conv" — which on TPU is exactly a (M, H*F) x (H*F, D) matmul per
sample, an MXU-shaped batched contraction — followed by ReLU; optional
split-half routing; sum-pool over D and concat across layers.

The jnp reference path materializes the (B, H*F, D) outer product like the
reference does; the Pallas kernel (ops/pallas/cin_kernel.py, flag
``pallas.use_cin_kernel``) fuses outer-product + compression in VMEM and
never materializes it in HBM.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel


def cin_layer_sizes(
    layer_sizes: Sequence[int], split_half: bool
) -> tuple[list[int], list[int]]:
    """Compute (direct_sizes, next_sizes) per layer (reference cin.py:51-62)."""
    direct_sizes: list[int] = []
    next_sizes: list[int] = []
    for i, layer_size in enumerate(layer_sizes):
        if split_half and i < len(layer_sizes) - 1:
            direct = layer_size // 2
            direct_sizes.append(direct)
            next_sizes.append(layer_size - direct)
        else:
            direct_sizes.append(layer_size)
            next_sizes.append(layer_size)
    return direct_sizes, next_sizes


def cin_output_dim(layer_sizes: Sequence[int], split_half: bool) -> int:
    return sum(cin_layer_sizes(layer_sizes, split_half)[0])


def cin_compress(
    hidden: jax.Array, x0: jax.Array, w: jax.Array, b: jax.Array
) -> jax.Array:
    """One CIN compression: (B,H,D),(B,F,D),(M,H*F) -> (B,M,D), pre-ReLU."""
    bsz, h, d = hidden.shape
    f = x0.shape[1]
    outer = jnp.einsum("bhd,bfd->bhfd", hidden, x0).reshape(bsz, h * f, d)
    return jnp.einsum("mc,bcd->bmd", w, outer) + b[None, :, None]


class CIN(nn.Module):
    num_fields: int
    embed_dim: int
    layer_sizes: Sequence[int] = (128, 128)
    split_half: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    # Swappable fused kernel: fn(hidden, x0, w, b) -> (B, M, D) pre-ReLU.
    compress_fn: object = None
    # Fuse the WHOLE stack (all layers + ReLU + split + pooling) into one
    # Pallas kernel (ops/pallas/cin_stack_kernel.py) — intermediates never
    # touch HBM.
    use_pallas_stack: bool = False
    # Stack kernels: bf16 MXU operands (f32 accumulation) when the
    # activations are bfloat16 — pallas.cin_bf16_operands.
    bf16_operands: bool = False

    @property
    def output_dim(self) -> int:
        return cin_output_dim(self.layer_sizes, self.split_half)

    @nn.compact
    def __call__(self, field_embeddings: jax.Array) -> jax.Array:
        x0 = field_embeddings.astype(self.compute_dtype)  # (B, F, D)
        hidden = x0
        f = self.num_fields

        direct_sizes, next_sizes = cin_layer_sizes(
            self.layer_sizes, self.split_half
        )
        compress = self.compress_fn or cin_compress

        if self.use_pallas_stack:
            from deepfm_tpu.ops.pallas.cin_stack_kernel import (
                make_cin_stack_pallas,
            )

            weights, biases = [], []
            prev = f
            for i, layer_size in enumerate(self.layer_sizes):
                in_ch = prev * f
                weights.append(
                    self.param(
                        f"conv_{i}_kernel",
                        torch_linear_kernel(in_ch),
                        (layer_size, in_ch),
                    )
                )
                biases.append(
                    self.param(
                        f"conv_{i}_bias",
                        torch_linear_bias(in_ch),
                        (layer_size,),
                    )
                )
                prev = (
                    next_sizes[i]
                    if (self.split_half and i < len(self.layer_sizes) - 1)
                    else layer_size
                )
            fn = make_cin_stack_pallas(
                self.layer_sizes, self.split_half,
                bf16_operands=self.bf16_operands,
            )
            return fn(x0, weights, biases).astype(self.compute_dtype)

        outputs: list[jax.Array] = []
        prev_maps = f
        for i, layer_size in enumerate(self.layer_sizes):
            in_ch = prev_maps * f
            w = self.param(
                f"conv_{i}_kernel",
                torch_linear_kernel(in_ch),
                (layer_size, in_ch),
            )
            b = self.param(
                f"conv_{i}_bias", torch_linear_bias(in_ch), (layer_size,)
            )
            compressed = jax.nn.relu(
                compress(
                    hidden,
                    x0,
                    w.astype(self.compute_dtype),
                    b.astype(self.compute_dtype),
                )
            )
            if self.split_half and i < len(self.layer_sizes) - 1:
                direct = compressed[:, : direct_sizes[i], :]
                hidden = compressed[:, direct_sizes[i] :, :]
                prev_maps = next_sizes[i]
            else:
                direct = compressed
                hidden = compressed
                prev_maps = layer_size
            outputs.append(jnp.sum(direct, axis=2))  # (B, direct)

        return jnp.concatenate(outputs, axis=1)
