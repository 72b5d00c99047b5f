"""Ring attention over the FIELD axis — the sequence-parallel demonstrator.

The reference attends over F ~= 16 fields, where SP/CP machinery is
pointless (SURVEY.md §5.7: the real long-axis problem in CTR is vocab
scaling, handled by the row-sharded tables). But Criteo-style production
schemas reach hundreds of fields; at that point the (B, F, F) score
tensor and the (B, F, D) activations are worth sharding over the field
axis. This module is that capability: blockwise softmax attention with
the K/V blocks rotated around the "model" mesh axis — the classic ring
attention recipe (streaming log-sum-exp accumulators, one
`lax.ppermute` per step, compute overlapping communication under XLA's
async collectives).

Layout: q/k/v are (B, F, H, Dh) with F sharded over AXIS_MODEL inside a
shard_map; each of the m devices holds an (B, F/m, H, Dh) slice. Step s
computes local attention of the resident queries against the KV block
that started on device (me - s) % m, folded into running (max, sum,
acc) accumulators; after m steps every query has attended to every key
exactly once, matching unsharded softmax attention to f32 roundoff.

This is a self-contained demonstration op with a parity test
(tests/test_parallel.py) — the stock AttentionDeepFM keeps the fused
single-chip Pallas block, which is faster at reference field counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8 promotes shard_map to the top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from deepfm_tpu.parallel.mesh import AXIS_MODEL


def _ring_body(q, k, v, *, axis, m):
    """Per-device ring attention: q (B, Fq, H, Dh), k/v local blocks."""
    b, fq, h, dh = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, q.dtype))

    # streaming softmax accumulators
    acc = jnp.zeros((b, fq, h, dh), jnp.float32)
    row_max = jnp.full((b, fq, h), -jnp.inf, jnp.float32)
    row_sum = jnp.zeros((b, fq, h), jnp.float32)

    perm = [(i, (i + 1) % m) for i in range(m)]

    def step(carry, _):
        acc, row_max, row_sum, k_blk, v_blk = carry
        scores = (
            jnp.einsum("bqhd,bkhd->bqhk", q, k_blk).astype(jnp.float32)
            * scale
        )
        blk_max = jnp.max(scores, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(scores - new_max[..., None])
        row_sum = row_sum * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[..., None] + jnp.einsum(
            "bqhk,bkhd->bqhd", p, v_blk.astype(jnp.float32)
        )
        # rotate the K/V blocks one hop around the ring
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return (acc, new_max, row_sum, k_blk, v_blk), None

    (acc, row_max, row_sum, _, _), _ = jax.lax.scan(
        step, (acc, row_max, row_sum, k, v), None, length=m
    )
    return (acc / row_sum[..., None]).astype(q.dtype)


def ring_field_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh
) -> jax.Array:
    """Softmax attention over fields with F sharded over the model axis.

    q/k/v: (B, F, H, Dh); F must divide by the model-axis size. Returns
    (B, F, H, Dh), numerically equal to unsharded softmax attention.
    """
    m = mesh.shape[AXIS_MODEL]
    if m == 1:
        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
        s = jnp.einsum("bqhd,bkhd->bqhk", q, k) * scale
        return jnp.einsum("bqhk,bkhd->bqhd", jax.nn.softmax(s, -1), v)
    if q.shape[1] % m != 0:
        raise ValueError(f"F={q.shape[1]} must divide model axis {m}")
    body = partial(_ring_body, axis=AXIS_MODEL, m=m)
    spec = P(None, AXIS_MODEL, None, None)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
