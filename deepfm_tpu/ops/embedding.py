"""Fused feature-embedding engine: one module, three views, few big gathers.

Functional contract matches the reference embedding layer (reference:
deepfm/models/layers/embedding.py:76-126): a single forward produces

  first_order      (B, 1)        — sum of per-field scalar embeddings
  field_embeddings (B, F, fm_d)  — per-field embeddings projected to fm_d
  flat_embeddings  (B, total_d)  — raw per-field embeddings concatenated

TPU-native differences (deliberate, not incidental):
  * All tables of one embedding width are fused into a single table with
    per-field row offsets (see data/packing.py), so a batch does one wide
    gather per width group instead of 2 x num_fields small gathers.
  * The first-order scalar weight of every field rides as the LAST COLUMN
    of its width group's fused table — the same gather serves both the
    second-order embedding and the first-order term, and backward emits a
    single row scatter per group (scatters are the dominant train-step
    cost at production vocab sizes).
  * Dense-feature "embeddings" (reference: per-field nn.Linear(1, d)) are a
    broadcasted multiply-add over a (num_dense_fields, d) weight block.
  * padding/OOV semantics (reference padding_idx=0 per field) are enforced by
    multiplying gathered rows with (local_id != 0); autodiff then yields
    exactly-zero gradients for every field's row 0.
  * Table rows are padded to a multiple of 128 so row-sharding across any
    power-of-two "model" mesh axis divides evenly and gathers stay aligned
    to TPU lanes.

The raw-row lookup is pluggable per layout: ``lookup_fn`` serves the
logical layout (default XLA gather; alternatives: the shard_map
all-to-all / psum strategies in deepfm_tpu/parallel/embedding_shard.py,
the Pallas kernel in deepfm_tpu/ops/pallas/embedding_kernel.py), and
``packed_lookup_factory`` serves the packed layout (default
single-shard packed kernel; sharded variants from the same strategies).
Width groups too wide to pack (128 // (d+1) == 1) use ``lookup_fn``
even when ``packed_tables`` is set.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deepfm_tpu.data.packing import PackedSchema

ROW_PAD = 128

# lookup_fn(table: (V, d), flat_ids: (n,)) -> (n, d)
LookupFn = Callable[[jax.Array, jax.Array], jax.Array]


def default_lookup(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    """Plain XLA gather; under gspmd a sharded table lowers to collectives."""
    return jnp.take(table, flat_ids, axis=0)


def pad_rows(rows: int, multiple: int = ROW_PAD) -> int:
    return -(-rows // multiple) * multiple


def make_table_init(
    emb_width: int, vocab_sizes: list[int], padded_rows: int,
    fo_column: bool = True,
):
    """Per-field Xavier-uniform init with each field's row 0 (and padding
    rows) zeroed — matches reference init semantics (reference:
    deepfm/models/layers/embedding.py:66-74: xavier_uniform on weight[1:],
    padding row stays zero).

    When ``fo_column`` is set the table carries the field's FIRST-ORDER
    scalar weights as its last column (see FeatureEmbedding below): that
    column gets the xavier bound of a width-1 embedding,
    sqrt(6 / (1 + (v-1))), while the embedding columns get
    sqrt(6 / (d + (v-1))) — exactly the per-table bounds the reference
    applies to its separate second-order/first-order nn.Embeddings.

    The per-row scale is computed ON DEVICE from per-field metadata (a few
    scalars per field) rather than materialized host-side: a (rows, width)
    constant would bake hundreds of MB into the executable at production
    vocab sizes.
    """
    width = emb_width + (1 if fo_column else 0)
    nf = len(vocab_sizes)
    # per-field metadata (tiny constants)
    bounds = np.asarray(
        [[0.0, 0.0]]  # sentinel for padding rows
        + [
            [
                math.sqrt(6.0 / (emb_width + max(v - 1, 1))),
                math.sqrt(6.0 / (1 + max(v - 1, 1))),
            ]
            for v in vocab_sizes
        ],
        np.float32,
    )
    starts = np.zeros(nf + 1, np.int64)
    np.cumsum(vocab_sizes, out=starts[1:])
    total = int(starts[-1])

    def init(key, shape, dtype=jnp.float32):
        assert shape == (padded_rows, width), (shape, padded_rows, width)
        u = jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
        row = jnp.arange(padded_rows)
        fld = jnp.searchsorted(jnp.asarray(starts), row, side="right")  # 1..nf
        fld = jnp.where(row < total, fld, 0)  # padding tail -> sentinel
        # each field's row 0 stays zero (padding/OOV semantics)
        fld = jnp.where(row == jnp.asarray(starts)[jnp.maximum(fld - 1, 0)], 0, fld)
        b = jnp.asarray(bounds, dtype)[fld]  # (rows, 2)
        scale = jnp.broadcast_to(b[:, :1], (padded_rows, emb_width))
        if fo_column:
            scale = jnp.concatenate([scale, b[:, 1:2]], axis=1)
        return u * scale

    return init


def xavier_uniform_shape(fan_in: int, fan_out: int):
    bound = math.sqrt(6.0 / (fan_in + fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def make_packed_table_init(
    emb_width: int, vocab_sizes: list[int], phys_rows: int, pack: int
):
    """Packed-layout variant of make_table_init: ``pack`` logical rows per
    128-lane physical row (lane l of phys row r = logical row
    ``r*pack + l // (d+1)``, column ``l % (d+1)``); dead lanes and every
    field's logical row 0 stay exactly zero. Same per-field xavier bounds
    as the unpacked init, so the parameter DISTRIBUTION is identical —
    only the storage layout differs.
    """
    dcol = emb_width + 1
    nf = len(vocab_sizes)
    emb_bounds = np.asarray(
        [0.0]
        + [math.sqrt(6.0 / (emb_width + max(v - 1, 1))) for v in vocab_sizes],
        np.float32,
    )
    fo_bounds = np.asarray(
        [0.0] + [math.sqrt(6.0 / (1 + max(v - 1, 1))) for v in vocab_sizes],
        np.float32,
    )
    starts = np.zeros(nf + 1, np.int64)
    np.cumsum(vocab_sizes, out=starts[1:])
    total = int(starts[-1])

    def init(key, shape, dtype=jnp.float32):
        assert shape == (phys_rows, 128), (shape, phys_rows)
        u = jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
        lane = jnp.arange(128)
        live = lane < pack * dcol
        sub = jnp.minimum(lane // dcol, pack - 1)
        col = lane - sub * dcol
        row = jnp.arange(phys_rows)[:, None] * pack + sub[None, :]
        fld = jnp.searchsorted(jnp.asarray(starts), row, side="right")
        fld = jnp.where(row < total, fld, 0)
        fld = jnp.where(
            row == jnp.asarray(starts)[jnp.maximum(fld - 1, 0)], 0, fld
        )
        # two flat bound lookups — never materialize a (phys, 128, 2)
        # intermediate (its unit trailing dim would lane-pad 64x on TPU)
        scale = jnp.where(
            col[None, :] == emb_width,
            jnp.asarray(fo_bounds, dtype)[fld],
            jnp.asarray(emb_bounds, dtype)[fld],
        )
        scale = jnp.where(live[None, :], scale, 0.0)
        return u * scale

    return init


class FeatureEmbedding(nn.Module):
    """Shared embedding engine emitting the three standard views."""

    packed: PackedSchema
    fm_embed_dim: int = 16
    lookup_fn: LookupFn | None = None
    compute_dtype: jnp.dtype = jnp.float32
    # Store each width group's table PACKED: 128 // (d+1) logical rows per
    # 128-lane physical row. TPU gathers are latency-bound per row, so the
    # wide physical gather is ~2-3x faster, and the (phys, 128) layout is
    # naturally aligned (row-major (V, 17) would lane-pad 7.5x). Backward
    # uses the packed Pallas densify kernel. Resolved by create_model from
    # config.pallas.table_layout.
    packed_tables: bool = False
    # Packed-layout lookup factory: factory(dcol, pack) -> LookupFn over a
    # (phys, 128) table. None = the single-shard packed kernel; the
    # sharded strategies (parallel/embedding_shard.py) supply psum /
    # all_to_all variants so packed tables compose with a model axis.
    packed_lookup_factory: Callable[[int, int], LookupFn] | None = None

    def _lookup(self, table: jax.Array, ids2d: jax.Array) -> jax.Array:
        """Gather rows for a (B, S_g) id block -> (B, S_g, d)."""
        fn = self.lookup_fn or default_lookup
        b, s = ids2d.shape
        rows = fn(table, ids2d.reshape(-1))
        return rows.reshape(b, s, table.shape[1])

    @nn.compact
    def __call__(
        self,
        ids: jax.Array,
        dense: jax.Array,
        rows_override: dict[str, jax.Array] | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        packed = self.packed
        fm_d = self.fm_embed_dim
        cdt = self.compute_dtype

        # Per-field outputs collected by name, assembled in schema order.
        field_raw: dict[str, jax.Array] = {}  # (B, d_f) raw embeddings
        field_proj: dict[str, jax.Array] = {}  # (B, fm_d) projected
        fo_parts: list[jax.Array] = []  # (B,) first-order contributions

        # ---- lookup groups: one fused gather per embedding width --------
        # Each width-d table is (rows, d+1): columns 0..d-1 are the
        # second-order embedding, column d is the field's FIRST-ORDER scalar
        # weight. One gather serves both views, and (critically) backward
        # emits ONE row-scatter per width group instead of two — the
        # reference's separate first-order nn.Embedding
        # (deepfm/models/layers/embedding.py:34-40) would double the
        # dominant scatter cost on TPU.
        for gi, group in enumerate(packed.lookup_groups):
            d = group.width
            members = [packed.schema.fields[n] for n in group.field_names]
            vocabs = [f.vocabulary_size for f in members]
            pack = 128 // (d + 1) if self.packed_tables else 1

            ids_g = ids[:, group.slot_start : group.slot_end]  # (B, S_g)
            mask = (ids_g != 0).astype(cdt)  # (B, S_g)
            local = ids_g + jnp.asarray(group.local_offsets)[None, :]

            if pack > 1:
                factory = self.packed_lookup_factory
                if factory is None:
                    from deepfm_tpu.ops.pallas.packed_grad_kernel import (
                        make_packed_lookup,
                    )

                    factory = make_packed_lookup
                phys_rows = pad_rows(-(-group.total_rows // pack))
                table = self.param(
                    f"table_w{d}",
                    make_packed_table_init(d, vocabs, phys_rows, pack),
                    (phys_rows, 128),
                )
                b, s = local.shape
                if rows_override is not None and f"table_w{d}" in rows_override:
                    # Pre-gathered (n, d+1) f32 rows supplied by the
                    # trainer's fused-backward path; the table param is
                    # still declared above so the parameter tree (and
                    # therefore checkpoints/sharding) is unchanged, and
                    # the graph from here on is identical to the
                    # in-graph gather — differentiating w.r.t. these
                    # rows yields exactly the cotangent stream the
                    # sparse optimizer kernel consumes.
                    rows = rows_override[f"table_w{d}"]
                else:
                    rows = factory(d + 1, pack)(table, local.reshape(-1))
                # NOTE (round-3 measured negative result): pinning the
                # gather in f32 with an optimization_barrier and
                # converting the (n, d+1) block afterwards measured
                # ~1.2 ms SLOWER than letting XLA fuse the bf16 convert
                # into the gather (chained-scan microbench,
                # scripts/bench_step_passes.py) — the convert-in-gather
                # halves the gather's HBM write bytes, which beats the
                # hypothesized (2,1)-tile packing penalty. Keep the
                # plain form.
                raw = rows.reshape(b, s, d + 1).astype(cdt)
            else:
                rows_padded = pad_rows(group.total_rows)
                table = self.param(
                    f"table_w{d}",
                    make_table_init(d, vocabs, rows_padded),
                    (rows_padded, d + 1),
                )
                if rows_override is not None and f"table_w{d}" in rows_override:
                    b, s = local.shape
                    raw = rows_override[f"table_w{d}"].reshape(
                        b, s, d + 1
                    ).astype(cdt)
                else:
                    raw = self._lookup(table, local).astype(cdt)  # (B, S_g, d+1)
            raw = raw * mask[:, :, None]
            emb = raw[:, :, :d]
            fo_vals = raw[:, :, d]  # (B, S_g)

            nf = len(members)
            if group.slot_end - group.slot_start == nf:
                # No sequence fields: slots == fields, nothing to pool.
                pooled = emb  # (B, nf, d)
                fo_pooled = fo_vals  # (B, nf)
            else:
                # Segment-pool sequence slots into their field via a static
                # 0/1 matrix (an MXU matmul, not a scatter).
                pool = np.zeros((group.slot_end - group.slot_start, nf), np.float32)
                pool[np.arange(len(group.slot_field)), group.slot_field] = 1.0
                pool_m = jnp.asarray(pool, cdt)
                pooled = jnp.einsum("bsd,sf->bfd", emb, pool_m)
                fo_pooled = fo_vals @ pool_m
                counts = mask @ pool_m  # (B, nf) valid-slot counts
                # mean-combiner sequence fields divide by the valid count
                # (empty bags -> 0), matching EmbeddingBag(mode="mean",
                # padding_idx=0) (reference embedding.py:41-50).
                divide = np.array(
                    [
                        1.0 if (seq and comb == "mean") else 0.0
                        for seq, comb in zip(group.is_sequence, group.combiners)
                    ],
                    np.float32,
                )
                denom = jnp.maximum(counts, 1.0) * divide + (1.0 - divide)
                pooled = pooled / denom[:, :, None]
                fo_pooled = fo_pooled / denom

            fo_parts.append(jnp.sum(fo_pooled, axis=1))

            # Projection to fm_embed_dim (bias-free, per field) when needed.
            if d != fm_d:
                proj = self.param(
                    f"proj_w{d}",
                    xavier_uniform_shape(d, fm_d),
                    (nf, d, fm_d),
                )
                projected = jnp.einsum("bfd,fdk->bfk", pooled, proj.astype(cdt))
            else:
                projected = pooled

            for mi, name in enumerate(group.field_names):
                field_raw[name] = pooled[:, mi, :]
                field_proj[name] = projected[:, mi, :]

        # ---- dense groups: broadcasted multiply-add ---------------------
        if packed.num_dense > 0:
            fo_w = self.param(
                "dense_fo_w",
                xavier_uniform_shape(1, 1),
                (packed.num_dense,),
            )
            fo_b = self.param(
                "dense_fo_b", nn.initializers.zeros, (packed.num_dense,)
            )
            fo_parts.append(
                dense.astype(cdt) @ fo_w.astype(cdt) + jnp.sum(fo_b.astype(cdt))
            )

        for group in packed.dense_groups:
            d = group.width
            nf = len(group.field_names)
            w = self.param(
                f"dense_w{d}", xavier_uniform_shape(1, d), (nf, d)
            )
            b = self.param(f"dense_b{d}", nn.initializers.zeros, (nf, d))
            x = dense[:, group.col_start : group.col_end].astype(cdt)  # (B, nf)
            emb = x[:, :, None] * w.astype(cdt)[None] + b.astype(cdt)[None]

            if d != fm_d:
                proj = self.param(
                    f"dense_proj_w{d}",
                    xavier_uniform_shape(d, fm_d),
                    (nf, d, fm_d),
                )
                projected = jnp.einsum("bfd,fdk->bfk", emb, proj.astype(cdt))
            else:
                projected = emb

            for mi, name in enumerate(group.field_names):
                field_raw[name] = emb[:, mi, :]
                field_proj[name] = projected[:, mi, :]

        # ---- assemble views in schema field order -----------------------
        first_order = jnp.sum(jnp.stack(fo_parts, axis=0), axis=0)[:, None]
        field_embeddings = jnp.stack(
            [field_proj[n] for n in packed.field_order], axis=1
        )
        flat_embeddings = jnp.concatenate(
            [field_raw[n] for n in packed.field_order], axis=-1
        )
        return first_order, field_embeddings, flat_embeddings


def gather_group_rows(
    packed: PackedSchema,
    emb_params: dict,
    ids: jax.Array,
    packed_tables: bool,
    packed_lookup_factory=None,
) -> dict[str, tuple[jax.Array, jax.Array]]:
    """Gather each width group's raw table rows OUTSIDE the loss graph.

    Returns {table name: (rows (n, d+1) f32, flat local ids (n,) int32)}.
    Replicates the exact lookup the module's ``__call__`` performs (same
    id arithmetic, same packed window gather), so feeding the rows back
    via ``rows_override`` reproduces the forward bit-for-bit while the
    loss gradient w.r.t. ``rows`` is precisely the sparse cotangent
    stream the fused backward-optimizer kernel
    (ops/pallas/sparse_adam_kernel.py) consumes — the dense table
    gradient never materializes.
    """
    out: dict[str, tuple[jax.Array, jax.Array]] = {}
    for group in packed.lookup_groups:
        d = group.width
        pack = 128 // (d + 1) if packed_tables else 1
        local = (
            ids[:, group.slot_start : group.slot_end]
            + jnp.asarray(group.local_offsets)[None, :]
        ).reshape(-1)
        table = emb_params[f"table_w{d}"]
        if pack > 1:
            factory = packed_lookup_factory
            if factory is None:
                from deepfm_tpu.ops.pallas.packed_grad_kernel import (
                    make_packed_lookup,
                )

                factory = make_packed_lookup
            rows = factory(d + 1, pack)(table, local)
        else:
            rows = jnp.take(table, local, axis=0)
        out[f"table_w{d}"] = (rows, local)
    return out
