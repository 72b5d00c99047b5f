"""Weight initializers matching the reference's effective init scales.

The reference uses torch defaults for Linear/Conv1d (kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kernel and bias) and
explicit xavier-uniform for embedding tables. Matching the scale keeps the
early training dynamics — and therefore quality-parity curves — comparable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_kernel(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default kernel."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_bias(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default bias."""
    return torch_linear_kernel(fan_in)


def xavier_uniform(fan_in: int, fan_out: int):
    bound = math.sqrt(6.0 / (fan_in + fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
