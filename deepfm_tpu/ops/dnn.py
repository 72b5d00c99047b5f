"""MLP tower: Dense -> (BatchNorm) -> activation -> dropout, stacked.

Capability parity with the reference DNN (reference:
deepfm/models/layers/dnn.py:9-59). BatchNorm uses batch statistics in
training and running averages in eval (torch BatchNorm1d semantics,
momentum 0.1, eps 1e-5). Under a data-sharded jit, the batch-stat reductions
are *global* across the mesh — XLA inserts the cross-replica psum — so DP
training matches single-device numerics, unlike local-BN approximations.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfm_tpu.ops.init import torch_linear_bias, torch_linear_kernel

ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
}


class DNN(nn.Module):
    hidden_units: Sequence[int]
    activation: str = "relu"
    dropout: float = 0.1
    use_batch_norm: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.hidden_units[-1]

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if not self.hidden_units:
            raise ValueError("hidden_units must be non-empty")
        act = ACTIVATIONS.get(self.activation.lower())
        if act is None:
            raise ValueError(
                f"Unknown activation: {self.activation}. "
                f"Choose from {list(ACTIVATIONS)}"
            )

        x = x.astype(self.compute_dtype)
        in_dim = x.shape[-1]
        for i, out_dim in enumerate(self.hidden_units):
            x = nn.Dense(
                out_dim,
                kernel_init=torch_linear_kernel(in_dim),
                bias_init=torch_linear_bias(in_dim),
                dtype=self.compute_dtype,
                name=f"dense_{i}",
            )(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.compute_dtype,
                    name=f"bn_{i}",
                )(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
            in_dim = out_dim
        return x
