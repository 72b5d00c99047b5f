"""Pallas TPU kernels: the ENTIRE CIN stack fused in VMEM — forward AND
backward.

Forward: per batch tile, x0 stays resident in VMEM, every CIN layer
(outer product -> MXU compression -> bias -> ReLU -> split-half routing)
runs without writing an intermediate feature map to HBM, and only the
final sum-pooled concatenation (B, sum(direct_sizes)) comes out. HBM
traffic is x0 in + weights in + pooled out — the (B, H·F, D) per-layer
activations the jnp/XLA path (and the reference's Conv1d pipeline,
reference deepfm/models/layers/cin.py:66-105) materializes do not exist.

Backward (the round-2 addition): the adjoint einsums

    dW  = Σ_b dcomp[b,m,:] ⊗ outer[b,hf,:]
    A   = Wᵀ dcomp;  dhid = Σ_f A·x0;  dx0 = Σ_h A·hid

materialize the (B, H·F, D) outer product (and its twin A) in HBM when
left to XLA — ~0.9 GB per layer at Criteo scale (F=27, H=64, B=16k) and
the dominant xDeepFM step cost. The fused backward kernel recomputes the
forward per tile (remat), then runs all adjoints chunk-by-chunk in VMEM:
dW/db accumulate across batch tiles in a revisited output block, dx0
streams out per tile. Neither outer nor A ever touches HBM.

VMEM discipline (the reason round 1's kernel fell back to the
materializing path at Criteo field counts): the outer product is never
built whole. Hidden rows are processed in chunks of CH=8 (sublane
aligned), so live scratch is ``CH·F·D·TB`` instead of ``H·F·D·TB``, and
the weight matrix is passed pre-chunked as (n_chunks, M, CH·F) so the
kernel indexes chunks on an untiled leading axis — no mid-lane slicing.
Hidden height is zero-padded to a multiple of CH (zero rows × zero
weight columns contribute nothing).

Remat-vs-stash, measured: saving the forward activations to HBM in the
forward (268 MB at Criteo scale) and reading them back in the backward
instead of recomputing was A/B'd on hardware and LOST — 303k vs 353k
ex/s xDeepFM step. In-VMEM recompute is cheaper than the HBM round
trip; the remat design stays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfm_tpu.ops.cin import cin_layer_sizes

# Hidden-row chunk (sublane-aligned for f32). CH=16 was A/B'd on
# hardware and measured WORSE (302k vs 352k ex/s xDeepFM step): the
# doubled matmul K does not pay for the doubled chunk scratch.
CH = 8
# Separate headroom per direction (16 MB physical scoped vmem): the
# forward's accounting leaves slack for pipelining; the backward is a
# single big kernel and is allowed to run right up against the limit.
FWD_VMEM_BUDGET = 13 * 1024 * 1024
BWD_VMEM_BUDGET = 16 * 1024 * 1024


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _hidden_sizes(f, layer_sizes, split_half, next_sizes):
    """Input-height of each layer's hidden state."""
    hs = [f]
    for i in range(len(layer_sizes) - 1):
        hs.append(
            next_sizes[i] if split_half else layer_sizes[i]
        )
    return hs


def _chunked_weights(weights, hidden_sizes, f):
    """(M, H·F) weight -> (n_chunks, M, CH·F), zero-padding H to CH·k.

    Weight columns are h-major (index = h·F + f), so grouping CH
    consecutive h-rows is a plain reshape after column padding.
    """
    out = []
    for w, h in zip(weights, hidden_sizes):
        m = w.shape[0]
        hp = _pad_to(h, CH)
        if hp != h:
            w = jnp.pad(w, ((0, 0), (0, (hp - h) * f)))
        out.append(
            w.reshape(m, hp // CH, CH * f).transpose(1, 0, 2)
        )
    return out


def _write_hidden(hid_scratch, hidden, hp):
    """Stage a layer's (h, d, tb) input hidden into the shared scratch,
    zero-padded to hp rows (chunk grid)."""
    h = hidden.shape[0]
    hid_scratch[0:h] = hidden
    if hp > h:
        hid_scratch[h:hp] = jnp.zeros(
            (hp - h,) + hidden.shape[1:], hidden.dtype
        )


def _compress(w_ref_i, hid_scratch, x0b, n_ch, m, f, d, tb):
    """pre-activation (M, D·TB) = Σ_chunks W_c @ outer_c.

    fori_loop (not an unrolled python loop) so the (CH·F, D·TB) outer
    chunk is allocated ONCE — Mosaic's stack allocator does not reuse
    slots across unrolled iterations, which blew scoped vmem 2x at
    Criteo shapes. hid_scratch's leading dim is untiled, so the dynamic
    chunk slice is free.
    """

    def body(c, acc):
        blk = hid_scratch[pl.ds(c * CH, CH)].reshape(CH, 1, d * tb)
        outer = (blk * x0b).reshape(CH * f, d * tb)
        return acc + jax.lax.dot_general(
            w_ref_i[c],
            outer,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return jax.lax.fori_loop(
        0, n_ch, body, jnp.zeros((m, d * tb), jnp.float32)
    )


def _stack_kernel(x0_ref, *refs, layer_sizes, split_half, direct_sizes,
                  next_sizes, f, d):
    n = len(layer_sizes)
    w_refs = refs[:n]
    b_refs = refs[n : 2 * n]
    out_ref = refs[2 * n]
    hid_scratch = refs[2 * n + 1]  # (H_max, d, tb) VMEM
    tb = x0_ref.shape[2]

    # Pool each layer's direct maps IMMEDIATELY so only the running
    # hidden state stays live.
    x0b = x0_ref[:].reshape(1, f, d * tb)
    hidden = x0_ref[:]
    col = 0
    for i, ls in enumerate(layer_sizes):
        hp = _pad_to(hidden.shape[0], CH)
        _write_hidden(hid_scratch, hidden, hp)
        pre = _compress(
            w_refs[i], hid_scratch, x0b, hp // CH, ls, f, d, tb
        )
        comp = jnp.maximum(pre + b_refs[i][:], 0.0)  # (M, D·TB)
        if split_half and i < n - 1:
            direct = comp[: direct_sizes[i]]
            hidden = comp[direct_sizes[i] :].reshape(next_sizes[i], d, tb)
        else:
            direct = comp
            hidden = comp.reshape(ls, d, tb)
        pooled = jnp.sum(direct.reshape(-1, d, tb), axis=1)
        out_ref[col : col + pooled.shape[0], :] = pooled
        col += pooled.shape[0]


def _stack_bwd_kernel(x0_ref, g_ref, *refs, layer_sizes, split_half,
                      direct_sizes, next_sizes, f, d):
    n = len(layer_sizes)
    w_refs = refs[:n]
    b_refs = refs[n : 2 * n]
    dx0_ref = refs[2 * n]
    dw_refs = refs[2 * n + 1 : 3 * n + 1]
    db_refs = refs[3 * n + 1 : 4 * n + 1]
    hid_scratch = refs[4 * n + 1]   # (H_max, d, tb)
    dhid_scratch = refs[4 * n + 2]  # (H_max, d, tb)
    comps_scratch = refs[4 * n + 3]  # (Σ layer_sizes, d, tb)
    tb = x0_ref.shape[2]
    d_tb = d * tb

    first = pl.program_id(0) == 0
    for i in range(n):
        @pl.when(first)
        def _init(i=i):
            db_refs[i][:] = jnp.zeros_like(db_refs[i])
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])

    x0b = x0_ref[:].reshape(1, f, d_tb)
    # x0 rows tiled CH times: row r = h_local·F + f_idx holds x0[f_idx]
    x0_tiled = pltpu.repeat(x0_ref[:].reshape(f, d_tb), CH, axis=0)
    # Group-sum selectors. Splitting a_c's (CH·F) sublane dim back into
    # (CH, F) is NOT tile-aligned (F is not a multiple of 8), and Mosaic
    # miscompiles that relayout — so the f-sum (dhid) and h-sum (dx0)
    # run as 0/1-selector matmuls on the MXU instead of reshapes.
    row = jax.lax.broadcasted_iota(jnp.int32, (CH, CH * f), 1)
    sel_h = (
        row // f == jax.lax.broadcasted_iota(jnp.int32, (CH, CH * f), 0)
    ).astype(jnp.float32)
    row_f = jax.lax.broadcasted_iota(jnp.int32, (f, CH * f), 1)
    sel_f = (
        row_f % f == jax.lax.broadcasted_iota(jnp.int32, (f, CH * f), 0)
    ).astype(jnp.float32)

    comp_offs = []
    col = 0
    for ls in layer_sizes:
        comp_offs.append(col)
        col += ls

    # ---- recompute forward (remat) into comps_scratch ----------------
    hidden = x0_ref[:]
    for i, ls in enumerate(layer_sizes):
        hp = _pad_to(hidden.shape[0], CH)
        _write_hidden(hid_scratch, hidden, hp)
        pre = _compress(
            w_refs[i], hid_scratch, x0b, hp // CH, ls, f, d, tb
        )
        comp = jnp.maximum(pre + b_refs[i][:], 0.0)  # (M, D·TB)
        comps_scratch[comp_offs[i] : comp_offs[i] + ls] = comp.reshape(
            ls, d, tb
        )
        if split_half and i < n - 1:
            hidden = comp[direct_sizes[i] :].reshape(next_sizes[i], d, tb)
        else:
            hidden = comp.reshape(ls, d, tb)

    # ---- adjoints, last layer first ----------------------------------
    out_offsets = []
    col = 0
    for ds in direct_sizes:
        out_offsets.append(col)
        col += ds

    dx0 = jnp.zeros((f, d_tb), jnp.float32)
    dhid_next = None  # cotangent of layer i+1's input hidden (h, D·TB)
    for i in reversed(range(n)):
        ds = direct_sizes[i]
        ls = layer_sizes[i]
        gi = g_ref[out_offsets[i] : out_offsets[i] + ds, :]  # (ds, TB)
        # adjoint of sum-pool over D: broadcast each map over d
        ddirect = jnp.broadcast_to(
            gi.reshape(ds, 1, tb), (ds, d, tb)
        ).reshape(ds, d_tb)
        if split_half and i < n - 1:
            dcomp = jnp.concatenate([ddirect, dhid_next], axis=0)
        elif dhid_next is not None:
            dcomp = ddirect + dhid_next
        else:
            dcomp = ddirect
        comp = comps_scratch[comp_offs[i] : comp_offs[i] + ls].reshape(
            ls, d_tb
        )
        dcomp = dcomp * (comp > 0).astype(jnp.float32)  # (M, D·TB)

        db_refs[i][:] += jnp.sum(dcomp, axis=1, keepdims=True)

        # stage this layer's input hidden into the chunk scratch
        if i == 0:
            hid_in = x0_ref[:]
            h_in = f
        elif split_half and i - 1 < n - 1:
            h_in = next_sizes[i - 1]
            hid_in = comps_scratch[
                comp_offs[i - 1] + direct_sizes[i - 1] :
                comp_offs[i - 1] + layer_sizes[i - 1]
            ]
        else:
            h_in = layer_sizes[i - 1]
            hid_in = comps_scratch[
                comp_offs[i - 1] : comp_offs[i - 1] + h_in
            ]
        hp = _pad_to(h_in, CH)
        _write_hidden(hid_scratch, hid_in, hp)

        def body(c, dx0_acc, i=i, dcomp=dcomp):
            blk = hid_scratch[pl.ds(c * CH, CH)].reshape(CH, 1, d_tb)
            outer = (blk * x0b).reshape(CH * f, d_tb)
            # dW_c (M, CH·F): contract the D·TB lanes
            dw_refs[i][c] += jax.lax.dot_general(
                dcomp,
                outer,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # A_c (CH·F, D·TB): contract M
            a_c = jax.lax.dot_general(
                w_refs[i][c],
                dcomp,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dhid_c[h] = Σ_f A_c[h·F+f]·x0[f]  (selector matmul)
            dhid_c = jax.lax.dot_general(
                sel_h,
                a_c * x0_tiled,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dhid_scratch[pl.ds(c * CH, CH)] = dhid_c.reshape(CH, d, tb)
            # dx0[f] += Σ_h A_c[h·F+f]·hid[h]
            hid_exp = jnp.broadcast_to(blk, (CH, f, d_tb)).reshape(
                CH * f, d_tb
            )
            return dx0_acc + jax.lax.dot_general(
                sel_f,
                a_c * hid_exp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (F, D·TB)

        dx0 = jax.lax.fori_loop(0, hp // CH, body, dx0)
        dhid = dhid_scratch[0:h_in].reshape(h_in, d_tb)
        if i == 0:
            dx0 = dx0 + dhid  # hid_0 = x0
        else:
            dhid_next = dhid

    dx0_ref[:] = dx0.reshape(f, d, tb)


def _pick_tile(b, f, d, layer_sizes, split_half, next_sizes,
               direct_sizes, bwd):
    """Largest batch tile (lane dim, multiple of 128) fitting VMEM.

    The accounting errs generous per buffer (Mosaic's stack allocator
    does not perfectly reuse slots across the unrolled chunk loop — a
    first cut that assumed tight reuse OOM'd scoped vmem at Criteo
    shapes): chunk scratch is counted twice (product + its operand
    temp), io blocks double-buffered, accumulators separate.
    """
    hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
    output_dim = sum(direct_sizes)
    w_elems = sum(
        ls * (_pad_to(h, CH) * f + 1)
        for ls, h in zip(layer_sizes, hs)
    )
    max_ls = max(layer_sizes)
    max_h = max(_pad_to(h, CH) for h in hs)
    for tb in (512, 384, 256, 128):
        if b % tb != 0:
            continue
        per_ex = (
            2 * f * d           # x0 in block (double-buffered)
            + 2 * output_dim    # out / g block (double-buffered)
            + 2 * CH * f * d    # outer/A chunk + broadcast temp
            + max_ls * d        # live comp
            + max_h * d         # padded hidden copy
        )
        if bwd:
            per_ex += (
                sum(layer_sizes) * d  # all comps stay resident
                + max_ls * d          # dcomp
                + CH * f * d          # second chunk buffer
                + 3 * f * d           # dx0 out block (x2) + accumulator
                + output_dim          # g accounted once more
            )
        elems = per_ex * tb + 2 * w_elems + (w_elems if bwd else 0)
        budget = BWD_VMEM_BUDGET if bwd else FWD_VMEM_BUDGET
        if 4 * elems <= budget:
            return tb
    return None


def make_cin_stack_pallas(layer_sizes, split_half):
    """Returns fn(x0 (B,F,D), weights, biases) -> (B, output_dim)."""
    layer_sizes = tuple(layer_sizes)
    direct_sizes, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    output_dim = sum(direct_sizes)
    # row slices inside the kernels (g/out offsets, split routing) are
    # sublane slices and must stay 8-aligned on real TPUs
    aligned = all(ds % CH == 0 for ds in direct_sizes)

    def oracle(x0, weights, biases):
        from deepfm_tpu.ops.cin import cin_compress

        hidden = x0
        outs = []
        for i, ls in enumerate(layer_sizes):
            comp = jax.nn.relu(cin_compress(hidden, x0, weights[i], biases[i]))
            if split_half and i < len(layer_sizes) - 1:
                direct = comp[:, : direct_sizes[i], :]
                hidden = comp[:, direct_sizes[i] :, :]
            else:
                direct = comp
                hidden = comp
            outs.append(jnp.sum(direct, axis=2))
        return jnp.concatenate(outs, axis=1)

    def _tile_for(bsz, f, d, bwd):
        if jax.default_backend() == "cpu":
            return bsz  # interpreter mode: no tiling constraints
        if not aligned:
            return None
        return _pick_tile(
            bsz, f, d, layer_sizes, split_half, next_sizes, direct_sizes,
            bwd,
        )

    def _flops(bsz, f, d):
        flops = 0
        hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
        for ls, h in zip(layer_sizes, hs):
            flops += 2 * bsz * ls * h * f * d + bsz * h * f * d
        return flops

    def forward(x0, weights, biases):
        bsz, f, d = x0.shape
        tb = _tile_for(bsz, f, d, bwd=False)
        if tb is None:
            return oracle(x0, weights, biases)
        hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
        x0_t = jnp.transpose(x0, (1, 2, 0)).astype(jnp.float32)  # (F, D, B)
        w3 = _chunked_weights(
            [w.astype(jnp.float32) for w in weights], hs, f
        )

        kernel = partial(
            _stack_kernel,
            layer_sizes=layer_sizes,
            split_half=split_half,
            direct_sizes=direct_sizes,
            next_sizes=next_sizes,
            f=f,
            d=d,
        )
        in_specs = [
            pl.BlockSpec((f, d, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ]
        args = [x0_t]
        for w in w3:
            in_specs.append(
                pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(w)
        for i, ls in enumerate(layer_sizes):
            in_specs.append(
                pl.BlockSpec((ls, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(biases[i].astype(jnp.float32).reshape(-1, 1))

        h_max = max(_pad_to(h, CH) for h in hs)
        out_t = pl.pallas_call(
            kernel,
            grid=(bsz // tb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (output_dim, tb), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((output_dim, bsz), jnp.float32),
            scratch_shapes=[pltpu.VMEM((h_max, d, tb), jnp.float32)],
            interpret=jax.default_backend() == "cpu",
            cost_estimate=pl.CostEstimate(
                flops=_flops(bsz, f, d),
                bytes_accessed=4 * bsz * (f * d + output_dim),
                transcendentals=0,
            ),
        )(*args)
        return jnp.transpose(out_t, (1, 0)).astype(x0.dtype)

    def backward_pallas(x0, weights, biases, g, tb):
        bsz, f, d = x0.shape
        hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
        x0_t = jnp.transpose(x0, (1, 2, 0)).astype(jnp.float32)
        g_t = jnp.transpose(g, (1, 0)).astype(jnp.float32)
        w3 = _chunked_weights(
            [w.astype(jnp.float32) for w in weights], hs, f
        )

        kernel = partial(
            _stack_bwd_kernel,
            layer_sizes=layer_sizes,
            split_half=split_half,
            direct_sizes=direct_sizes,
            next_sizes=next_sizes,
            f=f,
            d=d,
        )
        in_specs = [
            pl.BlockSpec((f, d, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((output_dim, tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args = [x0_t, g_t]
        for w in w3:
            in_specs.append(
                pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(w)
        for i, ls in enumerate(layer_sizes):
            in_specs.append(
                pl.BlockSpec((ls, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(biases[i].astype(jnp.float32).reshape(-1, 1))

        out_shapes = [jax.ShapeDtypeStruct((f, d, bsz), jnp.float32)]
        out_specs = [
            pl.BlockSpec((f, d, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ]
        for w in w3:  # dW accumulators, chunk-shaped
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            out_specs.append(
                pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        for ls in layer_sizes:  # db accumulators
            out_shapes.append(jax.ShapeDtypeStruct((ls, 1), jnp.float32))
            out_specs.append(
                pl.BlockSpec((ls, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )

        h_max = max(_pad_to(h, CH) for h in hs)
        outs = pl.pallas_call(
            kernel,
            grid=(bsz // tb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((h_max, d, tb), jnp.float32),
                pltpu.VMEM((h_max, d, tb), jnp.float32),
                pltpu.VMEM((sum(layer_sizes), d, tb), jnp.float32),
            ],
            interpret=jax.default_backend() == "cpu",
            cost_estimate=pl.CostEstimate(
                flops=4 * _flops(bsz, f, d),  # remat + 3 adjoint matmuls
                bytes_accessed=4 * bsz * (2 * f * d + 2 * output_dim),
                transcendentals=0,
            ),
        )(*args)

        dx0 = jnp.transpose(outs[0], (2, 0, 1)).astype(x0.dtype)
        dws, dbs = [], []
        for i, (w, h) in enumerate(zip(weights, hs)):
            dw3 = outs[1 + i]  # (n_ch, M, CH·F)
            m = w.shape[0]
            dw = dw3.transpose(1, 0, 2).reshape(m, -1)[:, : h * f]
            dws.append(dw.astype(w.dtype))
            dbs.append(
                outs[1 + len(weights) + i][:, 0].astype(biases[i].dtype)
            )
        return dx0, dws, dbs

    def backward_xla(x0, weights, biases, g):
        """XLA adjoint fallback (materializes the outer products)."""
        from deepfm_tpu.ops.pallas.cin_kernel import cin_compress_pallas

        x32 = x0.astype(jnp.float32)
        n = len(layer_sizes)

        comps = []
        hidden = x32
        for i in range(n):
            comp = jax.nn.relu(
                cin_compress_pallas(
                    hidden, x32, weights[i].astype(jnp.float32),
                    biases[i].astype(jnp.float32),
                )
            )
            comps.append(comp)
            if split_half and i < n - 1:
                hidden = comp[:, direct_sizes[i] :, :]
            else:
                hidden = comp

        g = g.astype(jnp.float32)
        g_cols = []
        col = 0
        for ds in direct_sizes:
            g_cols.append(g[:, col : col + ds])
            col += ds

        dx0 = jnp.zeros_like(x32)
        dws = [None] * n
        dbs = [None] * n
        dhid_next = None
        for i in reversed(range(n)):
            comp = comps[i]
            ddirect = jnp.broadcast_to(
                g_cols[i][:, :, None],
                (comp.shape[0], direct_sizes[i], comp.shape[2]),
            )
            if split_half and i < n - 1:
                dcomp = jnp.concatenate([ddirect, dhid_next], axis=1)
            elif dhid_next is not None:
                dcomp = ddirect + dhid_next
            else:
                dcomp = ddirect
            dcomp = dcomp * (comp > 0)

            hid_in = x32 if i == 0 else (
                comps[i - 1][:, direct_sizes[i - 1] :, :]
                if (split_half and i - 1 < n - 1)
                else comps[i - 1]
            )
            w3 = weights[i].astype(jnp.float32).reshape(
                layer_sizes[i], hid_in.shape[1], x0.shape[1]
            )
            dhid = jnp.einsum("bmd,mhf,bfd->bhd", dcomp, w3, x32)
            dx0 = dx0 + jnp.einsum("bmd,mhf,bhd->bfd", dcomp, w3, hid_in)
            dws[i] = (
                jnp.einsum("bmd,bhd,bfd->mhf", dcomp, hid_in, x32)
                .reshape(layer_sizes[i], -1)
                .astype(weights[i].dtype)
            )
            dbs[i] = jnp.sum(dcomp, axis=(0, 2)).astype(biases[i].dtype)
            dhid_next = dhid
        dx0 = dx0 + dhid_next  # hid_0 = x0
        return dx0.astype(x0.dtype), dws, dbs

    @jax.custom_vjp
    def cin_stack(x0, weights, biases):
        return forward(x0, weights, biases)

    def fwd(x0, weights, biases):
        return forward(x0, weights, biases), (x0, weights, biases)

    def bwd(res, g):
        x0, weights, biases = res
        bsz, f, d = x0.shape
        tb = _tile_for(bsz, f, d, bwd=True)
        if tb is None:
            return backward_xla(x0, weights, biases, g)
        return backward_pallas(x0, weights, biases, g, tb)

    cin_stack.defvjp(fwd, bwd)
    cin_stack.output_dim = output_dim
    return cin_stack
