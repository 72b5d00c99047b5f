"""Packed-table variant of the gradient-densify kernel.

TPU gathers are latency-bound per ROW: fetching 442k 68-byte rows costs
~6.6ms while fetching 442k 512-byte rows costs ~2.3ms (measured,
v5e-lite). Packing ``pack = 128 // (d+1)`` logical embedding rows into
one 128-lane physical row therefore makes the forward lookup ~2-3x
faster AND gives the tables a compact row-major layout (a (V, 17) f32
array cannot be stored row-major on TPU without a 7.5x lane-padding
blow-up; a (V/7, 128) array is naturally aligned).

This kernel is the backward for that layout: the cotangent rows of the
LOGICAL gather are densified into the PACKED (phys_rows, 128) table
shape. Same recipe as grad_kernel.py — sort, transposed streams,
per-tile one-hot MXU matmuls, exact 3-way bf16 mantissa split — plus a
LANE FANOUT: stream element j with logical row r = phys_j * pack + sub_j
contributes its d+1 payload values to lanes [sub_j*(d+1), (sub_j+1)*(d+1))
of physical row phys_j. The fanout RHS is built in VMEM per window with
``pltpu.repeat`` (payload planes tiled pack times along sublanes) masked
by ``lane // (d+1) == sub_j`` — no relayouts, and dead lanes
(>= pack*(d+1)) stay exactly zero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PHYS = 512  # physical rows per grid step
# stream elements consumed per matmul: 256 measured ~7% faster than 128
# end-to-end on the chained-scan microbench (wider K per one-hot matmul,
# half the fori iterations); 512 not tried (VMEM window doubles again)
CHUNK = 256
WIN = 2 * CHUNK
LANES = 128

MAX_ROWS_F32 = 1 << 24


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


def _accumulate(out_ref, meta, payload, row_base, d, pack, first):
    """One fanout matmul trio over a (.., W) stream window.

    meta: (8, W) f32 — row 0 = phys row ids, row 1 = sub-slot;
    payload: (PR, W) bf16 — three split planes of d+1 rows each.
    """
    w = payload.shape[1]
    dcol = d  # columns per logical row (embedding width + fo column)
    local = meta[0:1, :] - row_base  # (1, W) f32 phys ids on lanes
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_PHYS, w), 0).astype(
            jnp.float32
        )
        == local
    ).astype(jnp.bfloat16)

    # lane ownership mask: fan row l belongs to sub-slot l // dcol
    lane_sub = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, w), 0) // dcol
    ).astype(jnp.float32)
    sub = meta[1:2, :]  # (1, W)
    live = jax.lax.broadcasted_iota(jnp.int32, (LANES, w), 0) < pack * dcol
    mask = ((lane_sub == sub) & live).astype(jnp.bfloat16)

    total = None
    for p in range(3):
        plane = payload[p * dcol : (p + 1) * dcol, :]  # (dcol, W)
        fan = pltpu.repeat(plane, pack, axis=0)  # (pack*dcol, W)
        if pack * dcol < LANES:
            fan = jnp.concatenate(
                [fan, jnp.zeros((LANES - pack * dcol, w), jnp.bfloat16)],
                axis=0,
            )
        fan = fan * mask
        prod = jax.lax.dot_general(
            onehot,
            fan,
            dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes
            preferred_element_type=jnp.float32,
        )  # (TILE_PHYS, LANES)
        total = prod if total is None else total + prod

    if first:
        out_ref[:] = total
    else:
        out_ref[:] += total


def _densify_kernel(
    starts_ref,
    counts_ref,
    meta_a,  # (8, CHUNK) VMEM f32 — pipelined window
    meta_b,
    pay_a,  # (PR, CHUNK) VMEM bf16
    pay_b,
    meta_hbm,  # (8, n_pad) f32 (overflow chunks)
    pay_hbm,  # (PR, n_pad) bf16 (overflow chunks)
    out_ref,  # (TILE_PHYS, LANES) VMEM block
    mbuf,
    pbuf,
    sem_m,
    sem_p,
    *,
    d: int,
    pack: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    row_base = (t * TILE_PHYS).astype(jnp.float32)

    off0 = (start // CHUNK) * CHUNK
    pos0 = off0 + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    hi0 = start + jnp.minimum(count, CHUNK)
    valid0 = (pos0 >= start) & (pos0 < hi0)
    meta0 = jnp.concatenate([meta_a[:], meta_b[:]], axis=1)
    meta0 = jnp.where(
        jnp.broadcast_to(valid0, meta0.shape), meta0, -1.0
    )
    pay0 = jnp.concatenate([pay_a[:], pay_b[:]], axis=1)
    _accumulate(out_ref, meta0, pay0, row_base, d, pack, first=True)

    nchunks = pl.cdiv(count, CHUNK)

    def body(c, _):
        lo = start + c * CHUNK
        off = pl.multiple_of((lo // CHUNK) * CHUNK, CHUNK)
        cpm = pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(off, WIN)], mbuf, sem_m
        )
        cpp = pltpu.make_async_copy(
            pay_hbm.at[:, pl.ds(off, WIN)], pbuf, sem_p
        )
        cpm.start()
        cpp.start()
        cpm.wait()
        cpp.wait()
        pos = off + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        hi = jnp.minimum(count, (c + 1) * CHUNK) + start
        valid = (pos >= lo) & (pos < hi)
        meta = jnp.where(jnp.broadcast_to(valid, mbuf.shape), mbuf[:], -1.0)
        _accumulate(out_ref, meta, pbuf[:], row_base, d, pack, first=False)
        return 0

    jax.lax.fori_loop(1, nchunks, body, 0)


def build_sorted_stream(sids, valsT, pack, num_tiles, pr, n_pad):
    """Kernel-input stream from the SORTED (ids, f32 values) pairs.

    Returns (meta (8, n_pad) f32, pay_t (pr, n_pad) bf16, starts,
    counts): meta rows 0/1 carry phys-row / sub-slot per pair (sentinel
    phys + sub -1 padding), pay_t the 3-way bf16 mantissa split of the
    transposed value stream (exact f32 reconstruction), starts/counts
    the per-tile pair windows via searchsorted. BOTH the standalone
    densify and the merged sparse-Adam kernel consume exactly this
    format — their bit-equal gradient accumulation depends on one
    builder, so keep it single-sourced.
    """
    n = sids.shape[0]
    d = valsT.shape[0]
    sentinel = float(num_tiles * TILE_PHYS)

    phys = (sids // pack).astype(jnp.float32)
    sub = (sids % pack).astype(jnp.float32)

    meta = jnp.zeros((8, n_pad), jnp.float32)
    meta = meta.at[0, :].set(sentinel)
    meta = meta.at[1, :].set(-1.0)
    meta = meta.at[0, :n].set(phys)
    meta = meta.at[1, :n].set(sub)

    bits = jax.lax.bitcast_convert_type(valsT, jnp.uint32)
    t16 = jax.lax.bitcast_convert_type(
        bits & np.uint32(0xFFFF0000), jnp.float32
    )
    t24 = jax.lax.bitcast_convert_type(
        bits & np.uint32(0xFFFFFF00), jnp.float32
    )
    pay_t = jnp.zeros((pr, n_pad), jnp.bfloat16)
    pay_t = pay_t.at[:d, :n].set(t16.astype(jnp.bfloat16))
    pay_t = pay_t.at[d : 2 * d, :n].set((t24 - t16).astype(jnp.bfloat16))
    pay_t = pay_t.at[2 * d : 3 * d, :n].set(
        (valsT - t24).astype(jnp.bfloat16)
    )

    bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * TILE_PHYS
    edges = jnp.searchsorted(
        phys.astype(jnp.int32), bounds
    ).astype(jnp.int32)
    starts, ends = edges[:-1], edges[1:]
    return meta, pay_t, starts, ends - starts


@partial(jax.jit, static_argnums=(2, 3))
def densify_rows_grad_packed(
    ct: jax.Array, ids: jax.Array, num_rows: int, pack: int
):
    """Dense (ceil(num_rows/pack) padded, 128) packed cotangent.

    Logical semantics: ``zeros((num_rows, d)).at[ids].add(ct)`` laid out
    with ``pack`` logical rows per 128-lane physical row (dead lanes
    zero). Duplicates sum deterministically; exact to f32 working
    precision via the 3-way bf16 mantissa split.
    """
    n, d = ct.shape
    assert pack * d <= LANES
    ids = ids.astype(jnp.int32)
    # sort_key_val returns the sorted keys directly — argsort + ids[order]
    # would re-gather 442k 4-byte rows (~3ms of pure row latency)
    sids, order = jax.lax.sort_key_val(
        ids, jnp.arange(ids.shape[0], dtype=jnp.int32)
    )
    grows = ct[order].astype(jnp.float32).T  # (d, n)

    num_phys = -(-num_rows // pack)
    num_tiles = pl.cdiv(num_phys, TILE_PHYS)
    pr = _pad(3 * d, 16)
    n_pad = _pad(n, CHUNK) + WIN
    meta, pay_t, starts, counts = build_sorted_stream(
        sids, grows, pack, num_tiles, pr, n_pad
    )

    win_a = lambda t, s, c: (0, s[t] // CHUNK)  # noqa: E731
    win_b = lambda t, s, c: (0, s[t] // CHUNK + 1)  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), win_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CHUNK), win_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((pr, CHUNK), win_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((pr, CHUNK), win_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_PHYS, LANES), lambda t, *_: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, WIN), jnp.float32),
            pltpu.VMEM((pr, WIN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        partial(_densify_kernel, d=d, pack=pack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles * TILE_PHYS, LANES), jnp.float32
        ),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=6 * num_tiles * TILE_PHYS * WIN * LANES,
            bytes_accessed=4 * num_tiles * TILE_PHYS * LANES
            + n * (pr * 2 + 8),
            transcendentals=0,
        ),
    )(starts, counts, meta, meta, pay_t, pay_t, meta, pay_t)
    return out[:num_phys]


def make_packed_lookup(dcol: int, pack: int, fwd_mode: str = "window"):
    """LookupFn factory for PACKED tables.

    Returns fn(table (phys, 128), flat_ids (n,)) -> (n, dcol); backward
    densifies straight into the packed layout via the Pallas kernel.
    Tables >= 2^24 logical rows fall back to an XLA gather/scatter pair
    on a reshaped logical view.

    Forward modes (A/B'd on v5e, scripts/bench_packed_fwd.py, 442k ids
    at the 10.4M-logical-row scale):
      "window" — gather whole physical rows (n, 128) then extract each
        id's lane window with ``pack`` masked selects. 2.2 ms — the
        XLA gather engine loves the aligned 512-byte rows. DEFAULT.
      "flat"   — one gather of dcol-element contiguous slices from the
        flat (phys·128,) view. Moves 1/pack the bytes but measures
        40.5 ms: XLA lowers the unaligned 68-byte slice gather to a
        serial path. Kept as a documented negative result.
    """

    @jax.custom_vjp
    def lookup(table, flat_ids):
        return _fwd_impl(table, flat_ids)

    def _fwd_impl(table, flat_ids):
        if fwd_mode == "flat":
            flat = table.reshape(-1)
            starts = (flat_ids // pack) * 128 + (flat_ids % pack) * dcol
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(flat, (s,), (dcol,))
            )(starts)
        rows = jnp.take(table, flat_ids // pack, axis=0)  # (n, 128)
        sub = flat_ids % pack
        out = jnp.zeros((flat_ids.shape[0], dcol), table.dtype)
        for k in range(pack):
            out = jnp.where(
                (sub == k)[:, None],
                jax.lax.dynamic_slice_in_dim(rows, k * dcol, dcol, 1),
                out,
            )
        return out

    def fwd(table, flat_ids):
        return _fwd_impl(table, flat_ids), (flat_ids, table.shape[0])

    def bwd(res, ct):
        flat_ids, num_phys = res
        if num_phys * pack >= MAX_ROWS_F32:
            logical = jnp.zeros(
                (num_phys * pack, dcol), jnp.float32
            ).at[flat_ids].add(ct.astype(jnp.float32))
            packed = logical.reshape(num_phys, pack * dcol)
            if pack * dcol < LANES:
                packed = jnp.pad(
                    packed, ((0, 0), (0, LANES - pack * dcol))
                )
            dtable = packed
        else:
            dtable = densify_rows_grad_packed(
                ct, flat_ids, num_phys * pack, pack
            )[:num_phys]
        return dtable, np.zeros(flat_ids.shape, jax.dtypes.float0)

    lookup.defvjp(fwd, bwd)
    return lookup
