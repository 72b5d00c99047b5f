"""Reproducibility: one seed drives python/numpy RNGs and the JAX PRNG tree.

Mirrors the reference seeding contract (reference: deepfm/utils/seeding.py:9-15)
but threads explicit ``jax.random`` keys instead of global device RNG state —
the JAX-native discipline: every stochastic op (init, dropout, sampling)
consumes a split of the experiment key.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int) -> None:
    """Seed the host-side RNGs (python + numpy)."""
    random.seed(seed)
    np.random.seed(seed)


def make_rngs(seed: int):
    """Return (jax_root_key, numpy_generator) for an experiment."""
    import jax

    return jax.random.PRNGKey(seed), np.random.default_rng(seed)
