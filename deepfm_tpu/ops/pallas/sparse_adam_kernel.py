"""Fused sparse backward-optimizer: densify + decay + clip + Adam in ONE pass.

The round-3 DeepFM step roofline (RESULTS.md) shows three separate
full-table passes after the model backward:

  densify (Pallas)          writes the dense cotangent   ~0.79 GB written
  decayed-norm sumsq (XLA)  reads grad + param           ~1.52 GB read
  fused Adam (Pallas)       reads p/mu/nu/g, writes 3    ~5.33 GB

This kernel collapses them: the table gradient NEVER materializes in
HBM. Per (TILE_PHYS, 128) table tile it

  1. accumulates the dense gradient block in a VMEM scratch from the
     sorted sparse (ids, cotangent) payload — the exact one-hot-matmul
     recipe of ``packed_grad_kernel._accumulate`` (3-way bf16 mantissa
     split, f32-exact);
  2. applies the full optax-ordered update — weight decay, global-norm
     clip scaling, moment updates, bias correction, parameter step —
     writing param/mu/nu in place (buffers aliased);
  3. accumulates ``sum(p_new**2)`` into an SMEM scalar, emitted so the
     NEXT step's decayed global norm can be assembled sparsely (see
     below) without re-reading the table.

The global clip norm needs ``sumsq(g + wd*p)`` over the whole table
BEFORE the update runs — normally a table-sized read. It decomposes
exactly:

  sumsq(g + wd*p) = sumsq(g) + 2*wd*<g, p> + wd^2 * sumsq(p)

* ``sumsq(g)`` = sum over rows of ||sum of duplicate cotangents||^2 —
  computed from the SORTED sparse payload by ``sorted_segment_sumsq``
  (a segmented associative scan; no scatter, no dense grad);
* ``<g, p>`` = sum_i <ct_i, e_i> where e_i are the forward's gathered
  rows — the residuals the train step already holds;
* ``sumsq(p)`` is the scalar this kernel emitted on the previous step
  (recomputed once at init/restore).

Semantics match optax.chain(add_decayed_weights, clip_by_global_norm,
adam) exactly as in ``adam_kernel.py`` (same literal f32 op order); the
only deviation from the dense path is the summation ORDER inside the
global norm, which changes gnorm by O(1e-7) relative — with clipping
disabled the two paths are bit-identical (tested).

Capability context: this is the TPU-native backward+optimizer for the
embedding engine the reference implements as nn.Embedding autograd +
optimizer.step() (reference: deepfm/models/layers/embedding.py:34-50,
deepfm/training/trainer.py:228-237).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfm_tpu.ops.pallas.packed_grad_kernel import (
    CHUNK,
    LANES,
    MAX_ROWS_F32,
    TILE_PHYS,
    WIN,
    _accumulate,
    _pad,
    build_sorted_stream,
)


def _sparse_adam_kernel(
    starts_ref,
    counts_ref,
    sc_ref,  # SMEM (8,) f32: [lr, wd, gnorm, clip, bc1, bc2, eps, noclip]
    meta_a,  # (8, CHUNK) VMEM f32 — pipelined first window
    meta_b,
    pay_a,  # (PR, CHUNK) VMEM bf16
    pay_b,
    meta_hbm,  # (8, n_pad) f32 (overflow chunks)
    pay_hbm,  # (PR, n_pad) bf16
    p_ref,  # (TILE_PHYS, LANES) VMEM blocks
    mu_ref,
    nu_ref,
    po_ref,  # aliased outputs
    muo_ref,
    nuo_ref,
    psq_ref,  # SMEM (1, 1) f32 — constant-index accumulated output
    gacc,  # (TILE_PHYS, LANES) f32 scratch — the dense grad block
    mbuf,
    pbuf,
    sem_m,
    sem_p,
    *,
    d: int,
    pack: int,
    b1: float,
    b2: float,
    phys_rows: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    row_base = (t * TILE_PHYS).astype(jnp.float32)

    # ---- 1. densify this tile's gradient block into VMEM scratch ----
    # (identical accumulation sequence to packed_grad_kernel, so the
    # dense grad values are bit-equal to the standalone densify kernel)
    off0 = (start // CHUNK) * CHUNK
    pos0 = off0 + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    hi0 = start + jnp.minimum(count, CHUNK)
    valid0 = (pos0 >= start) & (pos0 < hi0)
    meta0 = jnp.concatenate([meta_a[:], meta_b[:]], axis=1)
    meta0 = jnp.where(jnp.broadcast_to(valid0, meta0.shape), meta0, -1.0)
    pay0 = jnp.concatenate([pay_a[:], pay_b[:]], axis=1)
    _accumulate(gacc, meta0, pay0, row_base, d, pack, first=True)

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
        _accumulate(gacc, meta, pbuf[:], row_base, d, pack, first=False)
        return 0

    jax.lax.fori_loop(1, nchunks, body, 0)

    # ---- 2. the optax-ordered update on the block (adam_kernel.py) ----
    lr = sc_ref[0]
    wd = sc_ref[1]
    gnorm = sc_ref[2]
    clip = sc_ref[3]
    bc1 = sc_ref[4]
    bc2 = sc_ref[5]
    eps = sc_ref[6]
    noclip = sc_ref[7]

    p = p_ref[:]
    g = gacc[:] + wd * p
    g = jnp.where(noclip > 0.0, g, g / gnorm * clip)
    mu = (1.0 - b1) * g + b1 * mu_ref[:].astype(jnp.float32)
    nu = (1.0 - b2) * (g * g) + b2 * nu_ref[:].astype(jnp.float32)
    mu_hat = mu / bc1
    nu_hat = nu / bc2
    pnew = p - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps))
    po_ref[:] = pnew
    muo_ref[:] = mu.astype(muo_ref.dtype)
    nuo_ref[:] = nu.astype(nuo_ref.dtype)

    # ---- 3. sumsq(p_new) for the NEXT step's sparse decayed norm ----
    # mask the ragged last tile (pallas pads partial input blocks with
    # unspecified data; those rows' writes are dropped but they must not
    # poison the scalar)
    rows_ok = (
        t * TILE_PHYS
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_PHYS, LANES), 0)
    ) < phys_rows
    s = jnp.sum(jnp.where(rows_ok, pnew * pnew, 0.0))
    base = jnp.where(t == 0, 0.0, psq_ref[0, 0])
    psq_ref[0, 0] = base + s


def sort_pairs(flat_ids: jax.Array, ct: jax.Array):
    """Sort (ids, cotangent rows) by id; returns (sids, ctsT (d, n) f32).

    sort_key_val returns the sorted keys directly — argsort + ids[order]
    would re-gather the keys (~3 ms of row latency at bench scale). The
    transposed f32 cotangent stream is the layout both the kernel payload
    and ``sorted_segment_sumsq`` consume.
    """
    ids = flat_ids.astype(jnp.int32)
    sids, order = jax.lax.sort_key_val(
        ids, jnp.arange(ids.shape[0], dtype=jnp.int32)
    )
    ctsT = ct[order].astype(jnp.float32).T  # (d, n)
    return sids, ctsT


def sorted_segment_sumsq_scan(sids: jax.Array, ctsT: jax.Array) -> jax.Array:
    """Associative-scan reference for ``sorted_segment_sumsq``.

    Exact (up to f32 summation order), but jax.lax.associative_scan
    EXPANDS its log-depth network into explicit HLO: at the bench-scale
    stream (17, 426k) the resulting module stalled the remote TPU
    compiler for >20 min standalone (compile_bisect stage 6, round 4)
    and accounts for the fused step's 866 s compile. Kept as the
    oracle; production dispatches to the Pallas kernel below.
    """
    n = sids.shape[0]
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sids[1:] != sids[:-1]]
    )[None, :]  # (1, n)

    def comb(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    seg_v, _ = jax.lax.associative_scan(
        comb, (ctsT, is_start), axis=1
    )  # (d, n) within-run running sums
    is_end = jnp.concatenate(
        [sids[1:] != sids[:-1], jnp.ones((1,), jnp.bool_)]
    )  # (n,)
    run_sq = jnp.sum(seg_v * seg_v, axis=0)  # (n,)
    return jnp.sum(jnp.where(is_end, run_sq, 0.0))


SEGSQ_CHUNK = 512


def _segsumsq_kernel(ids_ref, idsc_ref, ct_ref, out_ref, svec, scal,
                     *, c):
    """One chunk of the pairwise segmented sumsq.

    Identity: sum_r ||sum_{i in r} ct_i||^2
            = sum_{i,j: sids_i == sids_j} <ct_i, ct_j>,
    which decomposes chunk-locally: within-chunk pairs are
    sum(CT^T CT  where same-id), and pairs spanning chunks are
    2 * <carried open-run sum, this chunk's columns of that run>
    (sorted ids keep every run contiguous across chunk boundaries).
    The grid runs sequentially on the core, so the open-run carry
    lives in scratch: svec (d, 1) = open-run sum, scal (1, 2) SMEM =
    [carry_id, running_total]. ids arrive twice — (1, c) lane-wise and
    (c, 1) sublane-wise — so the (c, c) same-id mask needs no
    in-kernel transpose.
    """
    t = pl.program_id(0)
    first = t == 0
    ids = ids_ref[:]  # (1, c) f32 (logical ids < 2^24 exact)
    ids_col = idsc_ref[:]  # (c, 1) f32, same values
    ct = ct_ref[:]  # (d_pad, c) f32, padded cols are zero

    carry_id = jnp.where(first, -2.0, scal[0, 0])
    total = jnp.where(first, 0.0, scal[0, 1])
    s_in = jnp.where(first, jnp.zeros_like(svec[:]), svec[:])  # (d, 1)

    # within-chunk pairs (diagonal included: that's ||ct_i||^2 once)
    same = ids_col == ids  # (c, c) broadcast compare
    g = jax.lax.dot_general(
        ct, ct, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (c, c)
    within = jnp.sum(jnp.where(same, g, 0.0))

    # cross-chunk pairs with the carried open run
    mcarry = ids == carry_id  # (1, c)
    v = jnp.sum(jnp.where(mcarry, ct, 0.0), axis=1, keepdims=True)
    cross = 2.0 * jnp.sum(s_in * v)

    # trailing open run -> carry out. The chunk is sorted and pads are
    # -1, so the last REAL id is simply the max.
    last_id = jnp.max(ids)
    mlast = ids == last_id
    tsum = jnp.sum(jnp.where(mlast, ct, 0.0), axis=1, keepdims=True)
    svec[:] = tsum + jnp.where(last_id == carry_id, s_in, 0.0)
    scal[0, 0] = last_id
    scal[0, 1] = total + within + cross
    out_ref[0, 0] = scal[0, 1]


def segment_sumsq_pairs(sids: jax.Array, ctsT: jax.Array) -> jax.Array:
    """Pallas segmented sumsq over a SORTED (ids, ct) stream.

    Single sequential pass, one (C, C) MXU contraction per chunk —
    compiles in seconds where the associative-scan version stalls the
    remote compiler (see sorted_segment_sumsq_scan). Same value up to
    f32 summation order (the clip-norm contract already allows
    O(1e-7) relative there, RESULTS.md round 3).
    """
    d, n = ctsT.shape
    c = SEGSQ_CHUNK
    n_pad = ((n + c - 1) // c) * c
    d_pad = _pad(max(d, 8), 8)
    # ids -1 padding never matches a real id; zero ct pads are inert
    ids_f = jnp.full((1, n_pad), -1.0, jnp.float32)
    ids_f = ids_f.at[0, :n].set(sids.astype(jnp.float32))
    ct_p = jnp.zeros((d_pad, n_pad), jnp.float32)
    ct_p = ct_p.at[:d, :n].set(ctsT.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_segsumsq_kernel, c=c),
        grid=(n_pad // c,),
        in_specs=[
            pl.BlockSpec((1, c), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, c), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d_pad, 1), jnp.float32),
            pltpu.SMEM((1, 2), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c * d_pad,
            bytes_accessed=(d_pad + 1) * n_pad * 4,
            transcendentals=0,
        ),
    )(ids_f, jnp.transpose(ids_f, (1, 0)), ct_p)
    return out[0, 0]


def sorted_segment_sumsq(sids: jax.Array, ctsT: jax.Array) -> jax.Array:
    """sum_r || sum_{i: sids[i]==r} ct_i ||^2 for SORTED ids — no scatter.

    Dispatches to the Pallas pairwise kernel (compile-time and runtime
    win); the associative-scan reference stays as the test oracle.
    This is exactly ``sumsq(densify(ct, ids))`` up to f32 summation
    order.
    """
    return segment_sumsq_pairs(sids, ctsT)


@partial(jax.jit, static_argnums=(10, 11, 12, 13, 14))
def sparse_table_adam_packed(
    param: jax.Array,  # (phys, 128) f32
    mu: jax.Array,
    nu: jax.Array,
    sids: jax.Array,  # (n,) int32 SORTED logical ids (sort_pairs)
    ctsT: jax.Array,  # (d, n) f32 sorted cotangent stream (sort_pairs)
    lr: jax.Array,
    weight_decay: jax.Array,
    global_norm: jax.Array,
    clip_norm: jax.Array,
    step: jax.Array,
    pack: int,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool | None = None,
):
    """One fused densify+Adam step over a packed table.

    Returns (p', mu', nu', sumsq(p')). ``step`` counts completed steps
    (bias correction uses step + 1); ``global_norm`` spans the full
    decayed gradient tree (assemble the table term sparsely with
    ``sorted_segment_sumsq`` + the <ct, rows> dot + the carried
    sumsq(p)). clip_norm <= 0 disables clipping.
    """
    phys, c = param.shape
    assert c == LANES
    d, n = ctsT.shape
    assert pack * d <= LANES

    t = step.astype(jnp.float32) + 1.0
    gnorm = jnp.asarray(global_norm, jnp.float32)
    clipv = jnp.asarray(clip_norm, jnp.float32)
    noclip = jnp.where((clipv <= 0.0) | (gnorm < clipv), 1.0, 0.0)
    scalars = jnp.stack(
        [
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(weight_decay, jnp.float32),
            jnp.maximum(gnorm, 1e-30),
            clipv,
            1.0 - jnp.power(b1, t),
            1.0 - jnp.power(b2, t),
            jnp.asarray(eps, jnp.float32),
            noclip,
        ]
    )

    num_tiles = pl.cdiv(phys, TILE_PHYS)
    pr = _pad(3 * d, 16)
    n_pad = _pad(n, CHUNK) + WIN
    meta, pay_t, starts, counts = build_sorted_stream(
        sids, ctsT, pack, num_tiles, pr, n_pad
    )

    # index maps receive all 3 scalar-prefetch operands after the grid id
    win_a = lambda t, s, c, sc: (0, s[t] // CHUNK)  # noqa: E731
    win_b = lambda t, s, c, sc: (0, s[t] // CHUNK + 1)  # noqa: E731
    blk = lambda t, *_: (t, 0)  # noqa: E731

    tspec = partial(
        pl.BlockSpec, (TILE_PHYS, LANES), blk, memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), win_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CHUNK), win_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((pr, CHUNK), win_a, memory_space=pltpu.VMEM),
            pl.BlockSpec((pr, CHUNK), win_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            tspec(),  # param
            tspec(),  # mu
            tspec(),  # nu
        ],
        out_specs=[
            tspec(),
            tspec(),
            tspec(),
            pl.BlockSpec(
                (1, 1), lambda t, *_: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_PHYS, LANES), jnp.float32),
            pltpu.VMEM((8, WIN), jnp.float32),
            pltpu.VMEM((pr, WIN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        partial(
            _sparse_adam_kernel,
            d=d,
            pack=pack,
            b1=b1,
            b2=b2,
            phys_rows=phys,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((phys, LANES), jnp.float32),
            jax.ShapeDtypeStruct((phys, LANES), mu.dtype),
            jax.ShapeDtypeStruct((phys, LANES), nu.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        # operand indices include the 3 scalar-prefetch args
        input_output_aliases={9: 0, 10: 1, 11: 2},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * num_tiles * TILE_PHYS * WIN * LANES
            + 12 * phys * LANES,
            bytes_accessed=(2 * 4 + 2 * 2 * mu.dtype.itemsize)
            * phys
            * LANES
            + n * (pr * 2 + 8),
            transcendentals=phys * LANES,
        ),
    )(
        starts,
        counts,
        scalars,
        meta,
        meta,
        pay_t,
        pay_t,
        meta,
        pay_t,
        param,
        mu,
        nu,
    )
    return out[0], out[1], out[2], out[3][0, 0]
