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
built whole — it is processed in chunks, with the weight matrix passed
pre-chunked so the kernel indexes chunks on an untiled leading axis (no
mid-lane slicing).

Chunk axis (round-3 redesign): chunks run over FIELDS, with the weight
columns re-laid out f-major (chunk c covers fields [c·CF, (c+1)·CF);
column index inside a chunk = fl·H_pad + h). Round 2 chunked over
HIDDEN rows (CH=8, h-major), which forced the dhid/dx0 group-sums to
run as 0/1-selector matmuls with output heights 8 and F — padded to the
MXU's 128-row tile, those selectors cost as many MXU passes as the real
adjoint matmuls and capped the backward at ~45% MXU. F-major chunking
makes the group boundaries fall on H_pad-row (sublane-aligned) block
edges, so dhid/dx0 become cheap VPU broadcasts/row-reductions, and the
per-layer chunk width CF = TARGET_K // H_pad keeps every matmul's
contraction at K ≈ 256 — a multiple of the MXU tile (h-major's
K = 8·27 = 216 padded to 256, wasting 15%). Measured numbers live in
RESULTS.md (round-3 bench).

Remat-vs-stash, measured: saving the forward activations to HBM in the
forward (268 MB at Criteo scale) and reading them back in the backward
instead of recomputing was A/B'd on hardware and LOST — 303k vs 353k
ex/s xDeepFM step. In-VMEM recompute is cheaper than the HBM round
trip; the remat design stays.

bf16 operands (round-4 addition, ``pallas.cin_bf16_operands``): when the
incoming activations are already bfloat16 (training.compute_dtype), the
MXU matmuls take bf16 operands (weights shipped bf16, the outer chunks
built from bf16 mirrors, dcomp cast once per layer) with f32
accumulation; every f32 structure — comp/dcomp/adjoint reductions,
dW/db accumulators — is unchanged. Halves operand VMEM + HBM traffic
and pins single-pass MXU issue. bf16's (16, 128) sublane tile sets the
alignment story: x0 is HOST-padded to FP = pad16(F) rows (every layer's
chunk width cf divides 16, so FP is simultaneously every layer's field
grid — the in-kernel x0 staging scratch disappears), and the path
requires each non-first hidden height to be 16-aligned (true for all
shipped geometries; others fall back to f32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfm_tpu.ops.cin import cin_layer_sizes

# Per-layer matmul contraction target: chunks of CF = TARGET_K // H_pad
# fields give every compress/adjoint matmul K = CF·H_pad ≈ 256 — two
# full MXU K-tiles, no padding waste.
TARGET_K = 256
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


def _layer_geom(
    f: int, h: int, sub: int = 8
) -> tuple[int, int, int, int]:
    """(h_pad, cf, f_pad, n_ch) for one layer's f-major chunk grid.

    ``sub`` is the sublane tile of the OUTER chunk's dtype (8 for f32,
    16 for bf16): hp must be tile-aligned for the in-kernel
    (cf·hp, ·) <-> (cf, hp, ·) regroupings to be exact.
    """
    hp = _pad_to(h, sub)  # sublane-aligned per-field block height
    cf = max(1, TARGET_K // hp)
    f_pad = _pad_to(f, cf)
    return hp, cf, f_pad, f_pad // cf


def _chunked_weights(weights, hidden_sizes, f, sub=8, dtype=jnp.float32):
    """(M, H·F) h-major weight -> (n_chunks, M, CF·H_pad) f-major chunks.

    Input column index = h·F + f_idx (reference Conv1d layout,
    deepfm/models/layers/cin.py:84-91); chunk c's column fl·H_pad + h
    maps to field c·CF + fl. Padded h rows / f fields get zero columns
    (they multiply zero hidden/x0 rows, contributing nothing). ``f`` is
    the (possibly host-padded) field-grid height the kernel will run.
    """
    out = []
    for w, h in zip(weights, hidden_sizes):
        m = w.shape[0]
        hp, cf, f_pad, n_ch = _layer_geom(f, h, sub)
        wf = w.reshape(m, h, -1)  # (M, h, F_real)
        f_real = wf.shape[2]
        wf = wf.transpose(0, 2, 1)  # (M, F_real, h)
        wf = jnp.pad(wf, ((0, 0), (0, f_pad - f_real), (0, hp - h)))
        out.append(
            wf.reshape(m, n_ch, cf * hp).transpose(1, 0, 2).astype(dtype)
        )
    return out


def _write_hidden(hid_scratch, hidden, hp):
    """Stage a layer's (h, d, tb) input hidden into the shared scratch,
    zero-padded to hp rows (per-field block height)."""
    h = hidden.shape[0]
    hid_scratch[0:h] = hidden.astype(hid_scratch.dtype)
    if hp > h:
        hid_scratch[h:hp] = jnp.zeros(
            (hp - h,) + hidden.shape[1:], hid_scratch.dtype
        )


def _compress(w_ref_i, hid_scratch, x0s, geom, m, d, tb):
    """pre-activation (M, D·TB) = Σ_chunks W_c @ outer_c.

    outer_c rows are f-major: row fl·H_pad + h = x0[c·CF+fl] ⊙ hid[h].
    fori_loop (not an unrolled python loop) so the (CF·H_pad, D·TB)
    outer chunk is allocated ONCE — Mosaic's stack allocator does not
    reuse slots across unrolled iterations, which blew scoped vmem 2x
    at Criteo shapes. Both scratch leading dims are untiled, so the
    dynamic chunk slices are free.
    """
    hp, cf, _, n_ch = geom
    d_tb = d * tb

    def body(c, acc):
        x0_blk = x0s[pl.ds(c * cf, cf)].reshape(cf, 1, d_tb)
        hid_b = hid_scratch[0:hp].reshape(1, hp, d_tb)
        outer = (x0_blk * hid_b).reshape(cf * hp, d_tb)
        return acc + jax.lax.dot_general(
            w_ref_i[c],
            outer,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return jax.lax.fori_loop(
        0, n_ch, body, jnp.zeros((m, d_tb), jnp.float32)
    )


def _stack_kernel(x0_ref, *refs, layer_sizes, split_half, direct_sizes,
                  next_sizes, f, d, bf16=False):
    n = len(layer_sizes)
    w_refs = refs[:n]
    b_refs = refs[n : 2 * n]
    out_ref = refs[2 * n]
    hid_scratch = refs[2 * n + 1]  # (H_max, d, tb) VMEM (f32 | bf16)
    # bf16 path: x0_ref IS the full field grid (host-padded to FP, with
    # every layer's f_pad == FP) — no staging scratch exists
    x0s = x0_ref if bf16 else refs[2 * n + 2]
    tb = x0_ref.shape[2]
    hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
    sub = 16 if bf16 else 8

    if not bf16:
        # x0 staged once, zero-padded to the widest layer's field grid
        f_pad_max = x0s.shape[0]
        x0s[0:f] = x0_ref[:]
        if f_pad_max > f:
            x0s[f:f_pad_max] = jnp.zeros(
                (f_pad_max - f, d, tb), jnp.float32
            )

    # Pool each layer's direct maps IMMEDIATELY so only the running
    # hidden state stays live.
    hidden = None  # layer 0 reads x0 directly
    col = 0
    for i, ls in enumerate(layer_sizes):
        geom = _layer_geom(f, hs[i], sub)
        if i == 0 and bf16:
            # hid_0 = x0 and hp_0 == FP == x0_ref rows: read in place
            hid_src = x0_ref
        else:
            if i == 0:
                hidden = x0_ref[:]
            _write_hidden(hid_scratch, hidden, geom[0])
            hid_src = hid_scratch
        pre = _compress(w_refs[i], hid_src, x0s, geom, ls, d, tb)
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
                      direct_sizes, next_sizes, f, d, bf16=False):
    n = len(layer_sizes)
    w_refs = refs[:n]
    b_refs = refs[n : 2 * n]
    dx0_ref = refs[2 * n]
    dw_refs = refs[2 * n + 1 : 3 * n + 1]
    db_refs = refs[3 * n + 1 : 4 * n + 1]
    hid_scratch = refs[4 * n + 1]   # (H_max, d, tb) f32
    comps_scratch = refs[4 * n + 2]  # (Σ layer_sizes, d, tb) f32
    x0_scratch = refs[4 * n + 3]  # (F_pad_max, d, tb) f32
    dx0_scratch = refs[4 * n + 4]  # (F_pad_max, d, tb) f32
    if bf16:
        hid_bf = refs[4 * n + 5]   # (H_max, d, tb) bf16 mirror
        dcomp_bf = refs[4 * n + 6]  # (max_ls, d, tb) bf16
    tb = x0_ref.shape[2]
    d_tb = d * tb
    hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
    sub = 16 if bf16 else 8

    first = pl.program_id(0) == 0
    for i in range(n):
        @pl.when(first)
        def _init(i=i):
            db_refs[i][:] = jnp.zeros_like(db_refs[i])
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])

    f_pad_max = x0_scratch.shape[0]
    # bf16: x0_ref is the full host-padded FP grid (f == FP ==
    # f_pad_max); the f32 staging is a cast. f32: pad to the widest grid.
    x0_scratch[0:f] = x0_ref[:].astype(jnp.float32)
    if f_pad_max > f:
        x0_scratch[f:f_pad_max] = jnp.zeros(
            (f_pad_max - f, d, tb), jnp.float32
        )
    dx0_scratch[:] = jnp.zeros((f_pad_max, d, tb), jnp.float32)
    # bf16 operand source for the outer chunks (dots): the raw bf16 ref
    x0s_mm = x0_ref if bf16 else x0_scratch

    comp_offs = []
    col = 0
    for ls in layer_sizes:
        comp_offs.append(col)
        col += ls

    # ---- recompute forward (remat) into comps_scratch ----------------
    hidden = None
    for i, ls in enumerate(layer_sizes):
        geom = _layer_geom(f, hs[i], sub)
        if i == 0 and bf16:
            hid_src = x0_ref
        else:
            if i == 0:
                hidden = x0_ref[:]
            mirror = hid_bf if bf16 else hid_scratch
            _write_hidden(mirror, hidden, geom[0])
            hid_src = mirror
        pre = _compress(w_refs[i], hid_src, x0s_mm, geom, ls, d, tb)
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

        if bf16:
            # matmul operand mirror, cast once per layer (ls 16-aligned;
            # the scratch is 2-D (max_ls, D·TB) so no regrouping occurs)
            dcomp_bf[0:ls] = dcomp.astype(jnp.bfloat16)
            dcomp_mm = dcomp_bf[0:ls]
        else:
            dcomp_mm = dcomp

        # stage this layer's input hidden into the per-field scratch
        if i == 0:
            hid_in = None  # read from x0 sources directly
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
        hp, cf, _, n_ch = _layer_geom(f, h_in, sub)
        if i == 0 and bf16:
            # hid_0 = x0 and hp == FP: the host-padded ref (dots) and
            # its f32 staging already hold the full grid — no copy
            hid_f32_src = x0_scratch
            hid_mm_src = x0s_mm
        elif i == 0:
            # f32: hp = pad8(f) can exceed the chunk grid's f_pad (odd
            # f), so x0 must be staged into the hp-row hidden scratch
            _write_hidden(hid_scratch, x0_ref[:], hp)
            hid_f32_src = hid_scratch
            hid_mm_src = hid_scratch
        else:
            _write_hidden(hid_scratch, hid_in, hp)
            hid_f32_src = hid_scratch
            if bf16:
                hid_bf[0:hp] = hid_scratch[0:hp].astype(jnp.bfloat16)
                hid_mm_src = hid_bf
            else:
                hid_mm_src = hid_scratch

        def body(c, dhid_acc, i=i, dcomp=dcomp, dcomp_mm=dcomp_mm,
                 hp=hp, cf=cf, hid_f32_src=hid_f32_src,
                 hid_mm_src=hid_mm_src):
            x0_blk = x0_scratch[pl.ds(c * cf, cf)].reshape(cf, 1, d_tb)
            hid_b = hid_f32_src[0:hp].reshape(1, hp, d_tb)
            x0_mm = x0s_mm[pl.ds(c * cf, cf)].reshape(cf, 1, d_tb)
            hid_mm = hid_mm_src[0:hp].reshape(1, hp, d_tb)
            outer = (x0_mm * hid_mm).reshape(cf * hp, d_tb)
            # dW_c (M, CF·H_pad): contract the D·TB lanes
            dw_refs[i][c] += jax.lax.dot_general(
                dcomp_mm,
                outer,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # A_c (CF·H_pad, D·TB): contract M
            a_c = jax.lax.dot_general(
                w_refs[i][c],
                dcomp_mm,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # f-major blocks make both group-sums plain VPU reductions
            # (round 2's h-major layout forced 0/1-selector MXU matmuls
            # with 8- and F-row outputs padded to 128 — they cost as
            # much as the real adjoint matmuls). Splitting cf·hp -> (cf,
            # hp) is tile-safe: hp is a multiple of the sublane tile by
            # construction (8 f32 / 16 bf16).
            a3 = a_c.reshape(cf, hp, d_tb)
            dhid_acc = dhid_acc + jnp.sum(a3 * x0_blk, axis=0)
            rows = jnp.sum(a3 * hid_b, axis=1)  # (cf, d_tb)
            dx0_scratch[pl.ds(c * cf, cf)] += rows.reshape(cf, d, tb)
            return dhid_acc

        dhid_acc = jax.lax.fori_loop(
            0, n_ch, body, jnp.zeros((hp, d_tb), jnp.float32)
        )
        if i == 0:
            # hid_0 = x0: fold the first layer's dhid into dx0
            # (leading-dim slice of the 3-D value — tiling lives on the
            # last two dims, so [0:f] needs no relayout)
            dx0_scratch[0:f] += dhid_acc.reshape(hp, d, tb)[0:f]
        else:
            dhid_next = dhid_acc[0:h_in]  # h_in 8-aligned for i > 0

    dx0_ref[:] = dx0_scratch[0:f]


def _pick_tile(b, f, d, layer_sizes, split_half, next_sizes,
               direct_sizes, bwd, bf16=False):
    """Largest batch tile (lane dim, multiple of 128) fitting VMEM.

    The accounting errs generous per buffer (Mosaic's stack allocator
    does not perfectly reuse slots across the unrolled layer loop — a
    first cut that assumed tight reuse OOM'd scoped vmem at Criteo
    shapes): chunk scratch is counted twice (product + its operand
    temp), io blocks double-buffered, accumulators separate.
    ``f`` is the kernel field grid (host-padded FP for bf16). Elements
    are counted in f32 units; bf16 buffers count half.
    """
    sub = 16 if bf16 else 8
    hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
    output_dim = sum(direct_sizes)
    geoms = [_layer_geom(f, h, sub) for h in hs]
    w_elems = sum(
        ls * g[3] * g[1] * g[0]
        for ls, g in zip(layer_sizes, geoms)
    ) + sum(layer_sizes)
    if bf16:
        w_elems = w_elems // 2 + sum(layer_sizes)  # bf16 weight chunks
    max_ls = max(layer_sizes)
    max_h = max(g[0] for g in geoms)
    max_k = max(g[1] * g[0] for g in geoms)
    max_fp = max(g[2] for g in geoms)
    # bf16 in blocks / outer chunks / operand mirrors are half-size
    half = 0.5 if bf16 else 1.0
    for tb in (512, 384, 256, 128):
        if b % tb != 0:
            continue
        # Chunk-buffer term calibrated against the hardware-validated
        # round-2 accounting: Mosaic's allocator reuses the in-body
        # temporaries well enough that 2 x (chunk K x d) covers the
        # outer/adjoint chunk working set (counting every live product
        # separately predicted an OOM the hardware does not have, and
        # silently pushed the Criteo backward onto the materializing
        # XLA fallback — the round-3 xdeepfm regression).
        per_ex = (
            2 * f * d * half    # x0 in block (double-buffered)
            + 2 * output_dim    # out / g block (double-buffered)
            + 2 * max_k * d * half  # outer chunk + broadcast temp
            + max_ls * d        # live comp
            + max_h * d * half  # padded hidden copy (mirror dtype)
            + (0 if bf16 else max_fp * d)  # x0 scratch (f32 fwd only)
        )
        if bwd:
            per_ex += (
                sum(layer_sizes) * d  # all comps stay resident
                + max_ls * d          # dcomp
                + max_h * d           # dhid accumulator
                + max_fp * d          # dx0 scratch
                + 2 * f * d           # dx0 out block (double-buffered)
                + output_dim          # g accounted once more
            )
            if bf16:
                per_ex += (
                    max_fp * d        # f32 x0 staging (common term was
                    + max_h * d       # halved/zeroed for bf16) + f32
                    + max_ls * d * 0.5  # hidden staging + dcomp mirror
                )
        elems = per_ex * tb + 2 * w_elems + (w_elems if bwd else 0)
        budget = BWD_VMEM_BUDGET if bwd else FWD_VMEM_BUDGET
        if 4 * elems <= budget:
            return tb
    return None


def _stack_aligned(layer_sizes, split_half) -> bool:
    """8-row alignment required by the f32 stack kernels' sublane
    slices (g/out offsets, split routing, dhid handoff)."""
    direct_sizes, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    return all(ds % 8 == 0 for ds in direct_sizes) and all(
        (next_sizes[i] if split_half else layer_sizes[i]) % 8 == 0
        for i in range(len(layer_sizes) - 1)
    )


def stack_tile(bsz, f, d, layer_sizes, split_half, bwd, bf16=False):
    """Batch tile the stack kernel would pick for these shapes on the
    CURRENT backend, or None when it would fall back to the XLA path.

    Module-level mirror of the factory's runtime gate so engagement
    telemetry reports the same decision the compiled step makes — the
    round-5 on-hardware HLO assertion caught the label claiming
    ``cin_stack`` at batch sizes with no feasible tile (b % 128 != 0),
    where the kernel actually falls back."""
    layer_sizes = tuple(layer_sizes)
    direct_sizes, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    if jax.default_backend() == "cpu":
        return bsz  # interpreter mode: no tiling constraints
    if not _stack_aligned(layer_sizes, split_half):
        return None
    f_k = _pad_to(f, 16) if bf16 else f
    return _pick_tile(
        bsz, f_k, d, layer_sizes, split_half, next_sizes, direct_sizes,
        bwd, bf16=bf16,
    )


def cin_stack_engaged(layer_sizes, split_half, bsz, f, d, bf16) -> bool:
    """True when BOTH the fused forward and backward stack kernels will
    run (the engagement-telemetry contract for the cin_stack labels)."""
    return (
        stack_tile(bsz, f, d, layer_sizes, split_half, False, bf16)
        is not None
        and stack_tile(bsz, f, d, layer_sizes, split_half, True, bf16)
        is not None
    )


def cin_bf16_eligible(layer_sizes, split_half, embed_dim) -> bool:
    """True when the bf16 MXU-operand path can engage for this
    geometry: every layer size and non-first hidden height on the bf16
    (16, 128) sublane tile (mirror writes / outer regroupings; layer 0
    is handled by host-padding x0), and the embed dim a lane-tile
    multiple for the (ls, D*TB) <-> (ls, d, tb) comp regroupings.
    Shared by the kernel factory's gate and engagement telemetry so
    the reported kernel list matches what actually compiles."""
    layer_sizes = tuple(layer_sizes)
    _, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    return (
        _stack_aligned(layer_sizes, split_half)
        and all(ls % 16 == 0 for ls in layer_sizes)
        and all(
            (next_sizes[i] if split_half else layer_sizes[i]) % 16 == 0
            for i in range(len(layer_sizes) - 1)
        )
        and embed_dim % 16 == 0
    )


def make_cin_stack_pallas(layer_sizes, split_half, bf16_operands=False):
    """Returns fn(x0 (B,F,D), weights, biases) -> (B, output_dim).

    ``bf16_operands``: feed the MXU bf16 operands when x0 is already
    bfloat16 (see module docstring); shapes that miss the bf16 tile
    alignment silently keep the f32 path."""
    layer_sizes = tuple(layer_sizes)
    direct_sizes, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    output_dim = sum(direct_sizes)

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

    def _use_bf16(x0) -> bool:
        return (
            bf16_operands
            and x0.dtype == jnp.bfloat16
            and cin_bf16_eligible(layer_sizes, split_half, x0.shape[2])
        )

    def _tile_for(bsz, f, d, bwd, bf16=False):
        # single source of truth with engagement telemetry (stack_tile)
        return stack_tile(bsz, f, d, layer_sizes, split_half, bwd, bf16)

    def _flops(bsz, f, d):
        flops = 0
        hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
        for ls, h in zip(layer_sizes, hs):
            flops += 2 * bsz * ls * h * f * d + bsz * h * f * d
        return flops

    def forward(x0, weights, biases):
        bsz, f, d = x0.shape
        bf16 = _use_bf16(x0)
        tb = _tile_for(bsz, f, d, bwd=False, bf16=bf16)
        if tb is None:
            return oracle(x0, weights, biases)
        # real hidden sizes for the weight reshape; the kernel's field
        # grid f_k is host-padded for bf16 (pad16(f) divides every cf)
        hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
        f_k = _pad_to(f, 16) if bf16 else f
        sub = 16 if bf16 else 8
        op_dt = jnp.bfloat16 if bf16 else jnp.float32
        x0_t = jnp.transpose(x0, (1, 2, 0)).astype(op_dt)  # (F, D, B)
        if f_k > f:
            x0_t = jnp.pad(x0_t, ((0, f_k - f), (0, 0), (0, 0)))
        w3 = _chunked_weights(weights, hs, f_k, sub=sub, dtype=op_dt)

        kernel = partial(
            _stack_kernel,
            layer_sizes=layer_sizes,
            split_half=split_half,
            direct_sizes=direct_sizes,
            next_sizes=next_sizes,
            f=f_k,
            d=d,
            bf16=bf16,
        )
        in_specs = [
            pl.BlockSpec((f_k, d, tb), lambda i: (0, 0, i),
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

        hs_k = _hidden_sizes(f_k, layer_sizes, split_half, next_sizes)
        geoms = [_layer_geom(f_k, h, sub) for h in hs_k]
        h_max = max(g[0] for g in geoms)
        f_pad_max = max(g[2] for g in geoms)
        scratch_shapes = [pltpu.VMEM((h_max, d, tb), op_dt)]
        if not bf16:
            scratch_shapes.append(
                pltpu.VMEM((f_pad_max, d, tb), jnp.float32)
            )
        out_t = pl.pallas_call(
            kernel,
            grid=(bsz // tb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (output_dim, tb), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((output_dim, bsz), jnp.float32),
            scratch_shapes=scratch_shapes,
            interpret=jax.default_backend() == "cpu",
            cost_estimate=pl.CostEstimate(
                flops=_flops(bsz, f, d),
                bytes_accessed=x0_t.dtype.itemsize * bsz * f * d
                + 4 * bsz * output_dim,
                transcendentals=0,
            ),
        )(*args)
        return jnp.transpose(out_t, (1, 0)).astype(x0.dtype)

    def backward_pallas(x0, weights, biases, g, tb, bf16):
        bsz, f, d = x0.shape
        hs = _hidden_sizes(f, layer_sizes, split_half, next_sizes)
        f_k = _pad_to(f, 16) if bf16 else f
        sub = 16 if bf16 else 8
        op_dt = jnp.bfloat16 if bf16 else jnp.float32
        x0_t = jnp.transpose(x0, (1, 2, 0)).astype(op_dt)
        if f_k > f:
            x0_t = jnp.pad(x0_t, ((0, f_k - f), (0, 0), (0, 0)))
        g_t = jnp.transpose(g, (1, 0)).astype(jnp.float32)
        w3 = _chunked_weights(weights, hs, f_k, sub=sub, dtype=op_dt)

        kernel = partial(
            _stack_bwd_kernel,
            layer_sizes=layer_sizes,
            split_half=split_half,
            direct_sizes=direct_sizes,
            next_sizes=next_sizes,
            f=f_k,
            d=d,
            bf16=bf16,
        )
        in_specs = [
            pl.BlockSpec((f_k, d, tb), lambda i: (0, 0, i),
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

        out_shapes = [jax.ShapeDtypeStruct((f_k, d, bsz), jnp.float32)]
        out_specs = [
            pl.BlockSpec((f_k, d, tb), lambda i: (0, 0, i),
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

        hs_k = _hidden_sizes(f_k, layer_sizes, split_half, next_sizes)
        geoms = [_layer_geom(f_k, h, sub) for h in hs_k]
        h_max = max(g[0] for g in geoms)
        f_pad_max = max(g[2] for g in geoms)
        scratch_shapes = [
            pltpu.VMEM((h_max, d, tb), jnp.float32),
            pltpu.VMEM((sum(layer_sizes), d, tb), jnp.float32),
            pltpu.VMEM((f_pad_max, d, tb), jnp.float32),
            pltpu.VMEM((f_pad_max, d, tb), jnp.float32),
        ]
        if bf16:
            scratch_shapes += [
                pltpu.VMEM((h_max, d, tb), jnp.bfloat16),  # hid mirror
                pltpu.VMEM(
                    (max(layer_sizes), d * tb), jnp.bfloat16
                ),  # dcomp mirror (2-D: no regrouping on write)
            ]
        outs = pl.pallas_call(
            kernel,
            grid=(bsz // tb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            interpret=jax.default_backend() == "cpu",
            cost_estimate=pl.CostEstimate(
                flops=4 * _flops(bsz, f, d),  # remat + 3 adjoint matmuls
                bytes_accessed=4 * bsz * (2 * f * d + 2 * output_dim),
                transcendentals=0,
            ),
        )(*args)

        dx0 = jnp.transpose(outs[0], (2, 0, 1))[:, :f, :].astype(x0.dtype)
        dws, dbs = [], []
        for i, (w, h) in enumerate(zip(weights, hs)):
            dw3 = outs[1 + i]  # (n_ch, M, CF·H_pad) f-major chunks
            m = w.shape[0]
            hp, cf, f_pad, n_ch = _layer_geom(f_k, h, sub)
            dw = (
                dw3.transpose(1, 0, 2)        # (M, n_ch, CF·H_pad)
                .reshape(m, f_pad, hp)[:, :f, :h]  # drop padding
                .transpose(0, 2, 1)           # back to h-major
                .reshape(m, h * f)
            )
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
        bf16 = _use_bf16(x0)
        tb = _tile_for(bsz, f, d, bwd=True, bf16=bf16)
        if tb is None:
            return backward_xla(x0, weights, biases, g)
        return backward_pallas(x0, weights, biases, g, tb, bf16)

    cin_stack.defvjp(fwd, bwd)
    cin_stack.output_dim = output_dim
    return cin_stack
