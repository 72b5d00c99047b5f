"""Pallas TPU kernel: embedding-row gather via aligned line-DMAs.

Drop-in for the embedding engine's ``lookup_fn`` contract
(table (V, d), flat_ids (n,)) -> (n, d).

TPU VMEM is lane-tiled at 128 floats, so a per-row DMA of a d=16 embedding
row is not expressible (Mosaic rejects sub-128 lane slices) — and a 64-byte
HBM read would waste the 512-byte transaction anyway. Instead the table is
viewed as (V/g, 128) "lines" with g = 128/d rows per line:

  phase 1 — windowed async DMAs copy each id's 512-byte line (aligned) from
            HBM into the tile's line scratch, WINDOW in flight (double
            buffering generalized to a WINDOW-deep pipeline);
  phase 2 — vectorized sub-row select on the VPU: g static lane slices of
            the line buffer, masked-accumulated by (id % g).

Ids arrive twice per tile: an SMEM block for scalar DMA addressing and a
VMEM block for the phase-2 select. (Whole-array scalar prefetch would
overflow the 1 MB SMEM for production batch sizes.)

Backward is a custom VJP with the same dense deterministic scatter-add XLA
uses for gather transpose (duplicate ids accumulate; each field's row 0
stays zero because the forward mask in ops/embedding.py zeroes its
contribution).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 16  # in-flight line DMAs
LINE = 128  # f32 lanes per VMEM line

# Benchmarked on TPU v5e (442k gathers, 1M x 16 table): this kernel runs
# ~5x slower than XLA's native gather — the scalar core can't issue one DMA
# per 512-byte line as fast as the hardware gather engine streams rows.
# It exists as the explicit-DMA reference implementation and for fusion
# experiments; pallas.use_embedding_kernel therefore defaults to False.

# Tests set this to force the kernel (interpret mode) on CPU instead of the
# jnp fallback.
FORCE_INTERPRET = False


def _gather_kernel(ids_sref, table_ref, idsv_ref, out_ref, lines, sems, *, g, d):
    tile = out_ref.shape[0]

    def dma(slot, r):
        return pltpu.make_async_copy(
            table_ref.at[ids_sref[r] // g],
            lines.at[r],
            sems.at[slot],
        )

    for w in range(WINDOW):
        dma(w, w).start()

    def body(r, _):
        dma(r % WINDOW, r).wait()

        @pl.when(r + WINDOW < tile)
        def _():
            dma(r % WINDOW, r + WINDOW).start()

        return 0

    jax.lax.fori_loop(0, tile, body, 0)

    # phase 2: vectorized sub-row select via static lane slices + masked
    # accumulate (no lane-splitting reshape, which Mosaic cannot lay out)
    sub = idsv_ref[:] % g  # (T,)
    lines_v = lines[:]  # (T, LINE)
    acc = jnp.zeros((tile, d), jnp.float32)
    for k in range(g):
        part = lines_v[:, k * d : (k + 1) * d]
        mask = (sub == k).astype(jnp.float32)[:, None]
        acc = acc + part * mask
    out_ref[:] = acc


def _forward(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    n = flat_ids.shape[0]
    v, d = table.shape
    g = LINE // d
    interpret = jax.default_backend() == "cpu"
    if (
        (interpret and not FORCE_INTERPRET)
        or d > LINE
        or LINE % d != 0
        or v % g != 0
        or table.dtype != jnp.float32
    ):
        return jnp.take(table, flat_ids, axis=0)
    # 1-D int32 operands carry XLA layout T(1024): blocks must be multiples.
    tile = None
    for cand in (2048, 1024) + ((128,) if interpret else ()):
        if n % cand == 0:
            tile = cand
            break
    if tile is None:
        return jnp.take(table, flat_ids, axis=0)

    ids32 = flat_ids.astype(jnp.int32)
    lines_view = table.reshape(v // g, LINE)
    return pl.pallas_call(
        partial(_gather_kernel, g=g, d=d),
        interpret=interpret,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table lines in HBM
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, LINE), jnp.float32),
            pltpu.SemaphoreType.DMA((WINDOW,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * LINE,
            bytes_accessed=n * (LINE + d) * 4,
            transcendentals=0,
        ),
    )(ids32, lines_view, ids32)


@jax.custom_vjp
def pallas_lookup(table, flat_ids):
    """(V, d), (n,) -> (n, d) — Pallas line-gather with XLA-equivalent VJP."""
    return _forward(table, flat_ids)


def _fwd(table, flat_ids):
    return _forward(table, flat_ids), (table, flat_ids)


def _bwd(res, g):
    table, flat_ids = res
    dtable = jnp.zeros_like(table).at[flat_ids].add(g.astype(table.dtype))
    return dtable, None


pallas_lookup.defvjp(_fwd, _bwd)
