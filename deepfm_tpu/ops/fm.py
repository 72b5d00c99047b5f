"""Factorization-Machine second-order interaction (parameter-free).

O(F*D) sum-of-squares identity, numerically identical to the reference
(reference: deepfm/models/layers/fm.py:18-23):

    0.5 * sum_d [ (sum_f e_{f,d})^2 - sum_f e_{f,d}^2 ]

A pure elementwise+reduce computation — XLA fuses it into a handful of VPU
ops; no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fm_interaction(field_embeddings: jax.Array) -> jax.Array:
    """(B, F, D) -> (B, 1) second-order FM interaction."""
    summed = jnp.sum(field_embeddings, axis=1)  # (B, D)
    square_of_sum = summed * summed
    sum_of_squares = jnp.sum(field_embeddings * field_embeddings, axis=1)
    return 0.5 * jnp.sum(square_of_sum - sum_of_squares, axis=1, keepdims=True)
