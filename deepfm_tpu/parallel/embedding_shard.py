"""Row-sharded embedding lookup with explicit collectives (shard_map).

The embedding tables are row-sharded over the "model" mesh axis; the batch
(and therefore the flat id stream) is sharded over "data". Every (data i,
model j) device holds the i-th id chunk and the j-th table shard.

Strategies:

  "psum" (default) — every model shard gathers rows for the ids it owns
  (out-of-range ids masked to zero) and the partial row blocks are summed
  over the model axis. XLA lowers the psum to reduce-scatter + all-gather on
  ICI, which is bandwidth-optimal (~2·n·d per device) for this
  replicated-ids layout. Exact for any id distribution; the backward pass is
  the transposed collective + gather-transpose scatter-add, derived by
  autodiff — deterministic, and field-level row-0 padding stays zero because
  the forward mask multiplies those rows to zero.

  "all_to_all" — EP-style routed lookup: ids are additionally split over the
  model axis, bucketed by owner shard with a static per-destination
  capacity, exchanged with lax.all_to_all, gathered locally, and routed
  back. Moves ~n·d/m per device instead of 2·n·d but requires capacity
  padding; ids beyond capacity fall back to the psum path so the result is
  exact for any skew. (See deepfm_tpu/parallel tests for the
  sharded-vs-unsharded parity suite.)

The reference framework has no counterpart (no distributed training at all,
reference prd.md:25); this is the north-star capability from BASELINE.json.
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

from deepfm_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL


def _local_lookup(table_shard, ids, use_grad_kernel=None):
    """Per-shard row gather.

    On TPU the gather's backward uses the Pallas densify kernel
    (ops/pallas/grad_kernel.py) — inside shard_map each shard would
    otherwise pay XLA's serial row-scatter on its local table, the same
    bottleneck the single-chip path had. ``use_grad_kernel`` overrides
    the backend gate (tests force the kernel in interpret mode).
    """
    if use_grad_kernel is None:
        use_grad_kernel = jax.default_backend() == "tpu"
    if use_grad_kernel:
        from deepfm_tpu.ops.pallas.grad_kernel import sparse_grad_lookup

        return sparse_grad_lookup(table_shard, ids)
    return jnp.take(table_shard, ids, axis=0)


def _psum_lookup_local(table_shard, ids, *, rows_per_shard, axis,
                       use_grad_kernel=None):
    """Local body: gather owned rows, zero others, sum over the model axis."""
    shard = jax.lax.axis_index(axis)
    local = ids - shard * rows_per_shard
    ok = (local >= 0) & (local < rows_per_shard)
    safe = jnp.where(ok, local, 0)
    vals = _local_lookup(table_shard, safe, use_grad_kernel)
    vals = vals * ok[:, None].astype(vals.dtype)
    return jax.lax.psum(vals, axis)


def make_psum_lookup(mesh: Mesh, use_grad_kernel: bool | None = None):
    """lookup_fn(table (V,d), flat_ids (n,)) -> (n,d), exact psum strategy."""
    m = mesh.shape[AXIS_MODEL]

    def lookup(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
        if m == 1:
            return _local_lookup(table, flat_ids, use_grad_kernel)
        v = table.shape[0]
        assert v % m == 0, f"table rows {v} not divisible by model axis {m}"
        body = partial(
            _psum_lookup_local, rows_per_shard=v // m, axis=AXIS_MODEL,
            use_grad_kernel=use_grad_kernel,
        )
        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS_MODEL, None), P(AXIS_DATA)),
            out_specs=P(AXIS_DATA),
            # pallas_call outputs can't declare varying-mesh-axes yet
            check_vma=False,
        )(table, flat_ids)

    return lookup


def _a2a_lookup_local(
    table_shard, ids, *, rows_per_shard, m, capacity, axis,
    use_grad_kernel=None,
):
    """Routed lookup body: bucket ids by owner, all_to_all, gather, route back.

    ids: (n_loc,) — this device's slice over (data, model).
    Returns (n_loc, d) rows plus a bool overflow mask of ids that did not fit
    the per-destination capacity (resolved by the caller's psum fallback).
    """
    me = jax.lax.axis_index(axis)
    n_loc = ids.shape[0]
    owner = jnp.clip(ids // rows_per_shard, 0, m - 1)

    sort_idx = jnp.argsort(owner)  # stable in jnp
    sorted_ids = ids[sort_idx]
    sorted_owner = owner[sort_idx]
    # Position of each sorted id within its owner's run.
    run_start = jnp.searchsorted(sorted_owner, sorted_owner, side="left")
    pos = jnp.arange(n_loc) - run_start

    fits = pos < capacity
    send = jnp.zeros((m, capacity), ids.dtype)
    send = send.at[sorted_owner, jnp.where(fits, pos, 0)].set(
        jnp.where(fits, sorted_ids, 0), mode="drop"
    )

    # Exchange id buckets: row k of recv = ids shard k asked me for.
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0, tiled=True)

    local = jnp.clip(recv - me * rows_per_shard, 0, rows_per_shard - 1)
    rows = _local_lookup(table_shard, local.reshape(-1), use_grad_kernel)
    rows = rows.reshape(m, capacity, -1)

    # Route rows back: row k of back = rows for the ids I sent to shard k.
    back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0, tiled=True)

    got_sorted = back[sorted_owner, jnp.where(fits, pos, 0)]
    got_sorted = got_sorted * fits[:, None].astype(got_sorted.dtype)
    out = jnp.zeros_like(got_sorted).at[sort_idx].set(got_sorted)
    overflow = jnp.zeros((n_loc,), bool).at[sort_idx].set(~fits)
    return out, overflow


def make_a2a_lookup(
    mesh: Mesh,
    capacity_factor: float = 2.0,
    use_grad_kernel: bool | None = None,
):
    """EP-style all-to-all routed lookup with psum overflow fallback."""
    m = mesh.shape[AXIS_MODEL]
    dp = mesh.shape[AXIS_DATA]

    def lookup(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
        if m == 1:
            return _local_lookup(table, flat_ids, use_grad_kernel)
        v = table.shape[0]
        assert v % m == 0, f"table rows {v} not divisible by model axis {m}"
        n = flat_ids.shape[0]
        if n % (dp * m) != 0:
            # id stream does not split over both axes: use exact psum path
            return make_psum_lookup(mesh, use_grad_kernel)(table, flat_ids)
        n_loc = n // (dp * m)
        capacity = min(
            n_loc, max(8, int(capacity_factor * -(-n_loc // m)))
        )
        body = partial(
            _a2a_lookup_local,
            rows_per_shard=v // m,
            m=m,
            capacity=capacity,
            axis=AXIS_MODEL,
            use_grad_kernel=use_grad_kernel,
        )
        rows, overflow = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS_MODEL, None), P((AXIS_DATA, AXIS_MODEL))),
            out_specs=(P((AXIS_DATA, AXIS_MODEL)), P((AXIS_DATA, AXIS_MODEL))),
            check_vma=False,
        )(table, flat_ids)
        # Exact fallback for ids that overflowed their capacity bucket.
        fallback = make_psum_lookup(mesh, use_grad_kernel)(
            table, jnp.where(overflow, flat_ids, 0)
        )
        return jnp.where(overflow[:, None], fallback, rows)

    return lookup


def make_lookup_fn(mesh: Mesh | None, strategy: str = "psum"):
    """Factory: strategy name -> lookup_fn (None = default XLA gather)."""
    if mesh is None or mesh.shape.get(AXIS_MODEL, 1) == 1:
        return None
    if strategy == "auto":
        return None
    if strategy == "psum":
        return make_psum_lookup(mesh)
    if strategy == "all_to_all":
        return make_a2a_lookup(mesh)
    raise ValueError(f"Unknown embedding strategy: {strategy}")
