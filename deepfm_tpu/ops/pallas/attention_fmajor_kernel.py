"""Pallas TPU kernels: feature-major (sample-in-lanes) fused attention block.

A sample-major fused kernel (round 2, deleted round 5) lost to XLA at
Criteo field counts because every tensor it touched had a tiny trailing
dim (head_dim=16, F=27) that Mosaic pads to 128 lanes — 4-8x wasted
VMEM/bandwidth. The XLA fallback in turn burns ~12 ms/step in pure
layout churn (profiled round 3: ``{1,0,3,2}``-layout reshapes and
lane-padded fusions around ~20 GFLOP of real work).

These kernels flip the layout: the BATCH tile rides the 128-lane axis
and fields/channels live on sublanes/leading dims, so *nothing* is
lane-padded at any field count:

* input/output blocks are ``(F, d, TB)`` — d sublanes, TB=128 lanes;
* QKV is ONE batched-over-F MXU matmul ``(F,3a,d)·(F,d,TB)→(F,3a,TB)``;
* scores/softmax/context run per query field i (fori loop): pure VPU
  broadcast-multiplies + reductions over ``(F,H,hd,TB)`` tensors — the
  per-sample (F,hd)x(hd,F) matmuls the MXU hates (which forced the old
  kernel into 128 tiny batched matmuls per tile) never appear;
* the output projection is one batched MXU matmul back to ``(F,d,TB)``.

Per-query reads come from the REFS (``qkv_scr[i, ...]``, ``dctx_scr[i]``)
— value-level ``q4[i]`` lowers to dynamic_slice, which Mosaic TC does
not implement (round-4 on-hardware finding; interpret mode hides it).
All leading-dim ref slices are free; the only
relayouts are F·H single-row moves per query field (``wi[:, :, None]``,
moving the head axis sublane->leading). Sublane splits are tile-clean
(64 -> (4,16); 16 rows = 2 whole f32 tiles) — never by a non-multiple
of 8, the round-2 silent-miscompile trap.

The backward kernel recomputes the forward per query field (recompute
beats stashing: softmax weights for the whole batch would be ~226 MB in
HBM) and emits dx plus every weight/bias gradient via grid-accumulated
constant-index output refs, so training never touches the XLA tower.

Weights are cast to the input's compute dtype before use (bf16 on the
flagship), matching the module's promotion semantics and the MXU's
internal bf16 quantization of f32 operands; score/softmax/context
accumulation stays f32 in scratch.

Semantics match the reference block exactly (reference:
deepfm/models/layers/attention.py:67-120 — QKV projection, scaled
dot-product softmax over the F fields, output projection back to
embed_dim, residual + LayerNorm).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5
_VMEM_BUDGET = 14 * 1024 * 1024


def block_oracle(x, p, num_heads, use_residual):
    """jnp reference of one attention block (same math as ops/attention.py).

    Params are cast to the input's compute dtype FIRST — matching the
    module's jnp path. Round-3 find: without the cast, ``x(bf16) @
    w(f32)`` promotes the ENTIRE attention tower (q/k/v, scores,
    softmax, context, and all their adjoints) to f32, so the F-major
    kernel's parity target (and the module's XLA fallback) was paying
    2x bytes on every attention tensor.
    """
    b, f, d = x.shape
    a = p["wq"].shape[1]
    hd = a // num_heads
    p = {k: v.astype(x.dtype) for k, v in p.items()}

    def proj(w, bias):
        return x.reshape(b * f, d) @ w + bias

    q = proj(p["wq"], p["bq"]).reshape(b, f, num_heads, hd)
    k = proj(p["wk"], p["bk"]).reshape(b, f, num_heads, hd)
    v = proj(p["wv"], p["bv"]).reshape(b, f, num_heads, hd)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, x.dtype))
    # einsum form deliberately (round-3 measured negative result: the
    # broadcast-reduce alternative was slower end to end — see
    # ops/attention.py)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhij,bjhd->bihd", w, v).reshape(b * f, a)
    out = (ctx @ p["wo"] + p["bo"]).reshape(b, f, d)
    if use_residual:
        y = out + x
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        out = yn * p["ln_scale"] + p["ln_bias"]
    return out


def _split_heads(qkv, a, num_heads, head_dim, part):
    """(F, 3a, TB) -> (F, H, hd, TB) for part 0/1/2 (q/k/v).

    The sublane slice starts at a multiple of a (a >= 8) and the
    (a,) -> (H, hd) sublane split groups hd rows; hd is asserted to be a
    multiple of 8 at wrapper level, so both are tile-clean (pure
    re-indexing, no data movement, no miscompile risk).
    """
    f, _, tb = qkv.shape
    sl = qkv[:, part * a:(part + 1) * a, :]
    return sl.reshape(f, num_heads, head_dim, tb)


def _attn_fwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ls_ref, lb_ref,
    out_ref, qkv_scr, ctx_scr, s_scr,
    *, num_heads, head_dim, use_residual,
):
    F, d, TB = x_ref.shape
    H, hd = num_heads, head_dim
    a = H * hd
    x = x_ref[:]
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    # batched-over-F QKV projection: (F, 3a, d) . (F, d, TB) -> (F, 3a, TB)
    qkv_scr[:] = jax.lax.dot_general(
        wqkv_ref[:], x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]

    k4 = _split_heads(qkv_scr[:], a, H, hd, 1)
    v4 = _split_heads(qkv_scr[:], a, H, hd, 2)

    def body(i, carry):
        # read query i from the REF: a value-level q4[i] would lower to
        # dynamic_slice, which Mosaic TC does not implement (interpret
        # mode hides this); dynamic leading-index ref loads are fine
        qi = qkv_scr[i, pl.ds(0, a), :].reshape(H, hd, TB)
        # round-trip the scores through VMEM: the hd-reduction leaves a
        # replicated-sublane layout Mosaic cannot relayout for the
        # softmax chain ("Invalid relayout", round-4 hardware finding)
        s_scr[:] = jnp.sum(qi[None] * k4, axis=2) * scale
        si = s_scr[:]                                   # (F, H, TB)
        m = jnp.max(si, axis=0, keepdims=True)
        e = jnp.exp(si - m)
        wi = e / jnp.sum(e, axis=0, keepdims=True)      # (F, H, TB)
        # head axis sublane -> leading: F*H single-row moves
        wi_r = wi[:, :, None, :]                        # (F, H, 1, TB)
        ctx_scr[i] = jnp.sum(wi_r * v4, axis=0)         # (H, hd, TB)
        return carry

    jax.lax.fori_loop(0, F, body, 0)

    ctx = ctx_scr[:].reshape(F, a, TB)                  # tile-clean merge
    out = jax.lax.dot_general(
        wo_ref[:], ctx.astype(wo_ref.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]                                       # (F, d, TB)
    if use_residual:
        y = out + x.astype(jnp.float32)
        mean = jnp.mean(y, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(var + _LN_EPS)
        out = yn * ls_ref[:] + lb_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def _attn_bwd_kernel(
    x_ref, g_ref, wqkv_ref, bqkv_ref, wo_ref, wof_ref, wqkvt_ref,
    bo_ref, ls_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dls_ref, dlb_ref,
    qkv_scr, ctx_scr, dctx_scr, dk_scr, dv_scr, s_scr,
    *, num_heads, head_dim, use_residual,
):
    """Fused backward: recomputes the forward, emits dx + all param grads.

    Weight/bias grads accumulate across the (sequential on TPU) batch
    grid into constant-index output refs, zero-initialised on the first
    grid step — the CIN stack kernel's proven accumulator pattern.

    VMEM discipline: dwo is computed BEFORE the attention adjoint loop
    (the last use of the recomputed context), so ``ctx_scr`` is then
    reused as the dq accumulator — one less (F, H, hd, TB) f32 scratch
    keeps the flagship shapes (F=27, a=64) under the VMEM budget.
    """
    F, d, TB = x_ref.shape
    H, hd = num_heads, head_dim
    a = H * hd
    cdt = x_ref.dtype
    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)

    # ---- forward recompute (same ops as _attn_fwd_kernel) ----
    qkv_scr[:] = jax.lax.dot_general(
        wqkv_ref[:], x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    k4 = _split_heads(qkv_scr[:], a, H, hd, 1)
    v4 = _split_heads(qkv_scr[:], a, H, hd, 2)

    def fwd_body(i, carry):
        qi = qkv_scr[i, pl.ds(0, a), :].reshape(H, hd, TB)  # ref load
        s_scr[:] = jnp.sum(qi[None] * k4, axis=2) * scale  # layout fix
        si = s_scr[:]
        m = jnp.max(si, axis=0, keepdims=True)
        e = jnp.exp(si - m)
        wi = e / jnp.sum(e, axis=0, keepdims=True)
        ctx_scr[i] = jnp.sum(wi[:, :, None, :] * v4, axis=0)
        return carry

    jax.lax.fori_loop(0, F, fwd_body, 0)
    ctx = ctx_scr[:].reshape(F, a, TB)

    # ---- LayerNorm / residual adjoint ----
    if use_residual:
        out = jax.lax.dot_general(
            wo_ref[:], ctx.astype(wo_ref.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:]
        y = out + x.astype(jnp.float32)
        mean = jnp.mean(y, axis=1, keepdims=True)
        yc = y - mean
        var = jnp.mean(jnp.square(yc), axis=1, keepdims=True)
        inv = jax.lax.rsqrt(var + _LN_EPS)
        yn = yc * inv
        dls_ref[:] += jnp.sum(g * yn, axis=0)           # (d, TB)
        dlb_ref[:] += jnp.sum(g, axis=0)
        dyn = g * ls_ref[:]
        dy = inv * (
            dyn
            - jnp.mean(dyn, axis=1, keepdims=True)
            - yn * jnp.mean(dyn * yn, axis=1, keepdims=True)
        )
        dout = dy
        dx_res = dy
    else:
        dout = g
        dx_res = None

    dbo_ref[:] += jnp.sum(dout, axis=0)                 # (d, TB)

    # ---- weight grads that need ctx / dout, BEFORE ctx_scr is reused ----
    xt = jnp.swapaxes(x, 1, 2)                          # (F, TB, d) cdt
    doutt = jnp.swapaxes(dout.astype(cdt), 1, 2)        # (F, TB, d)
    dwo_ref[:] += jnp.sum(jax.lax.dot_general(
        ctx.astype(cdt), doutt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ), axis=0)                                          # (a, d)

    # dctx: (F, a, d) . (F, d, TB) -> (F, a, TB)   [wof = wo broadcast]
    dctx_scr[:] = jax.lax.dot_general(
        wof_ref[:], dout.astype(cdt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(F, H, hd, TB)

    # ---- attention core adjoint, per query field ----
    dq_scr = ctx_scr                                    # ctx is dead; reuse
    dk_scr[:] = jnp.zeros((F, H, hd, TB), jnp.float32)
    dv_scr[:] = jnp.zeros((F, H, hd, TB), jnp.float32)

    def bwd_body(i, carry):
        # qkv_scr still holds (q|k|v) here — it is repacked with the
        # adjoints only AFTER this loop
        qi = qkv_scr[i, pl.ds(0, a), :].reshape(H, hd, TB)  # ref load
        s_scr[:] = jnp.sum(qi[None] * k4, axis=2) * scale  # layout fix
        si = s_scr[:]
        m = jnp.max(si, axis=0, keepdims=True)
        e = jnp.exp(si - m)
        wi = e / jnp.sum(e, axis=0, keepdims=True)      # (F, H, TB)
        dctx_i = dctx_scr[i]                            # (H, hd, TB) ref load
        s_scr[:] = jnp.sum(dctx_i[None] * v4, axis=2)   # layout fix
        dwi = s_scr[:]                                  # (F, H, TB)
        dsi = wi * (dwi - jnp.sum(dwi * wi, axis=0, keepdims=True))
        dsi = dsi * scale
        dsi_r = dsi[:, :, None, :]                      # F*H row moves
        wi_r = wi[:, :, None, :]
        dq_scr[i] = jnp.sum(dsi_r * k4, axis=0)         # (H, hd, TB)
        dk_scr[:] += dsi_r * qi[None]
        dv_scr[:] += wi_r * dctx_i[None]
        return carry

    jax.lax.fori_loop(0, F, bwd_body, 0)

    # ---- QKV weight grads + dx, as ONE K=3a batched matmul each ----
    # q4/k4/v4 (the qkv value) are dead after the loop, so qkv_scr is
    # repacked with (dq | dk | dv) — sublane-aligned writes at multiples
    # of a — and the three per-part contractions collapse into single
    # batched matmuls. Slicing wqkvt's LANE dim per part (the obvious
    # formulation) is a Mosaic sub-128 lane-slice hazard; contracting the
    # whole 3a axis at once never slices lanes and feeds the MXU K=3a.
    qkv_scr[:, pl.ds(0, a), :] = dq_scr[:].reshape(F, a, TB)
    qkv_scr[:, pl.ds(a, a), :] = dk_scr[:].reshape(F, a, TB)
    qkv_scr[:, pl.ds(2 * a, a), :] = dv_scr[:].reshape(F, a, TB)
    dall = qkv_scr[:]                                   # (F, 3a, TB) f32

    dwqkv_ref[:] += jnp.sum(jax.lax.dot_general(
        dall.astype(cdt), xt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ), axis=0)                                          # (3a, d)
    dbqkv_ref[:] += jnp.sum(dall, axis=0)               # (3a, TB)

    # dx += Wqkv^T . dall : (F, d, 3a) . (F, 3a, TB) -> (F, d, TB)
    dx = dx_res if dx_res is not None else jnp.zeros((F, d, TB), jnp.float32)
    dx = dx + jax.lax.dot_general(
        wqkvt_ref[:], dall.astype(cdt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _vmem_bytes(F, d, a, H, tb, itemsize):
    """Lane-padding-aware VMEM estimate for the backward kernel (the
    bigger of the two). Every lane dim here is tb (=128) except the
    broadcast weights, whose trailing dims pad to 128 lanes."""
    hd = a // H
    lane = 128

    def pad(x):
        return -(-x // lane) * lane

    def sub(x):
        return -(-x // 8) * 8

    blocks = 2 * 2 * F * sub(d) * tb * itemsize         # x, g (dbl-buf)
    blocks += 2 * F * sub(d) * tb * 4                   # dx
    weights = (
        F * sub(3 * a) * pad(d)                         # wqkv
        + F * sub(d) * pad(a)                           # wo
        + F * sub(a) * pad(d)                           # wof
        + F * sub(d) * pad(3 * a)                       # wqkvt
    ) * itemsize
    weights += (sub(3 * a) + 3 * sub(d)) * tb * 4       # biases / ln
    scratch = (
        F * sub(3 * a) * tb                             # qkv
        + 4 * F * H * sub(hd) * tb                      # ctx|dq/dctx/dk/dv
    ) * 4
    temps = 3 * F * H * sub(hd) * tb * 4                # per-i products
    temps += 2 * F * sub(tb) * pad(d) * itemsize        # xt, doutt
    outs = (sub(3 * a) + sub(a)) * pad(d) * 4 + sub(3 * a) * tb * 4
    outs += 3 * sub(d) * tb * 4
    return blocks + weights + scratch + temps + outs


def fmajor_tile(batch: int, F: int, d: int, a: int, H: int,
                itemsize: int) -> int | None:
    """Pick the batch tile (lane) size, or None if ineligible."""
    if a % H != 0 or (a // H) % 8 != 0 or a % 8 != 0 or d % 8 != 0:
        return None
    for tb in (128,):
        if batch % tb == 0 and _vmem_bytes(F, d, a, H, tb,
                                           itemsize) <= _VMEM_BUDGET:
            return tb
    return None


def fmajor_eligible(batch: int, F: int, d: int, a: int, H: int,
                    itemsize: int) -> bool:
    """True when the feature-major kernels can run these shapes.

    On CPU the kernels would run in INTERPRET mode — a serial fori_loop
    over F per block, orders of magnitude slower than the XLA tower —
    so real CPU runs (e.g. evaluating a TPU-trained checkpoint on a CPU
    host) take the oracle path. Tests opt in with
    DEEPFM_TPU_FORCE_ATTN_KERNEL=1 (set by tests/conftest.py) to keep
    the CPU suite exercising the same code path the TPU takes.
    """
    if a % H != 0 or (a // H) % 8 != 0 or a % 8 != 0 or d % 8 != 0:
        return False
    if jax.default_backend() == "cpu":
        import os

        return os.environ.get("DEEPFM_TPU_FORCE_ATTN_KERNEL") == "1"
    return fmajor_tile(batch, F, d, a, H, itemsize) is not None


def make_attention_block_fmajor(num_heads: int, use_residual: bool):
    """Returns fn(x_fm (F,d,B), params) -> (F,d,B), fully fused fwd+bwd.

    ``x_fm`` is feature-major (batch LAST). The caller transposes once
    around the whole block stack (``ops/attention.py``).
    """
    H = num_heads

    def _prep(p, F, tb, cdt):
        a = p["wq"].shape[1]
        d = p["wq"].shape[0]
        f32 = jnp.float32
        wqkv = jnp.concatenate(
            [p["wq"].T, p["wk"].T, p["wv"].T], axis=0).astype(cdt)
        wqkv_b = jnp.broadcast_to(wqkv, (F, 3 * a, d))
        bqkv = jnp.concatenate(
            [p["bq"], p["bk"], p["bv"]], axis=0).astype(f32)
        bqkv_b = jnp.broadcast_to(bqkv.reshape(1, 3 * a, 1), (1, 3 * a, tb))
        wo_b = jnp.broadcast_to(p["wo"].T.astype(cdt), (F, d, a))
        bo_b = jnp.broadcast_to(
            p["bo"].astype(f32).reshape(1, d, 1), (1, d, tb))
        ls = p.get("ln_scale", jnp.ones((d,), f32))
        lb = p.get("ln_bias", jnp.zeros((d,), f32))
        ls_b = jnp.broadcast_to(
            jnp.asarray(ls, f32).reshape(1, d, 1), (1, d, tb))
        lb_b = jnp.broadcast_to(
            jnp.asarray(lb, f32).reshape(1, d, 1), (1, d, tb))
        return wqkv_b, bqkv_b, wo_b, bo_b, ls_b, lb_b

    def _rep(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def forward(x_fm, p):
        F, d, B = x_fm.shape
        a = p["wq"].shape[1]
        hd = a // H
        cdt = x_fm.dtype
        interpret = jax.default_backend() == "cpu"
        tb = B if interpret else fmajor_tile(B, F, d, a, H, cdt.itemsize)
        wqkv_b, bqkv_b, wo_b, bo_b, ls_b, lb_b = _prep(p, F, tb, cdt)
        kernel = partial(_attn_fwd_kernel, num_heads=H, head_dim=hd,
                         use_residual=use_residual)
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((F, d, tb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                _rep((F, 3 * a, d)), _rep((1, 3 * a, tb)),
                _rep((F, d, a)), _rep((1, d, tb)),
                _rep((1, d, tb)), _rep((1, d, tb)),
            ],
            out_specs=pl.BlockSpec((F, d, tb), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, d, B), cdt),
            scratch_shapes=[
                pltpu.VMEM((F, 3 * a, tb), jnp.float32),
                pltpu.VMEM((F, H, hd, tb), jnp.float32),
                pltpu.VMEM((F, H, tb), jnp.float32),  # score layout fix
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * F * (3 * d * a + 2 * F * a + a * d),
                bytes_accessed=2 * B * F * d * cdt.itemsize,
                transcendentals=B * H * F * F,
            ),
        )(x_fm, wqkv_b, bqkv_b, wo_b, bo_b, ls_b, lb_b)

    def backward(x_fm, p, g):
        F, d, B = x_fm.shape
        a = p["wq"].shape[1]
        hd = a // H
        cdt = x_fm.dtype
        f32 = jnp.float32
        interpret = jax.default_backend() == "cpu"
        tb = B if interpret else fmajor_tile(B, F, d, a, H, cdt.itemsize)
        wqkv_b, bqkv_b, wo_b, bo_b, ls_b, _ = _prep(p, F, tb, cdt)
        wof_b = jnp.broadcast_to(p["wo"].astype(cdt), (F, a, d))
        wqkvt = jnp.concatenate(
            [p["wq"], p["wk"], p["wv"]], axis=1).astype(cdt)  # (d, 3a)
        wqkvt_b = jnp.broadcast_to(wqkvt, (F, d, 3 * a))
        kernel = partial(_attn_bwd_kernel, num_heads=H, head_dim=hd,
                         use_residual=use_residual)
        dx, dwqkv, dbqkv, dwo, dbo, dls, dlb = pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((F, d, tb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, d, tb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                _rep((F, 3 * a, d)), _rep((1, 3 * a, tb)),
                _rep((F, d, a)), _rep((F, a, d)), _rep((F, d, 3 * a)),
                _rep((1, d, tb)), _rep((1, d, tb)),
            ],
            out_specs=[
                pl.BlockSpec((F, d, tb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                _rep((3 * a, d)), _rep((3 * a, tb)), _rep((a, d)),
                _rep((d, tb)), _rep((d, tb)), _rep((d, tb)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, d, B), cdt),
                jax.ShapeDtypeStruct((3 * a, d), f32),
                jax.ShapeDtypeStruct((3 * a, tb), f32),
                jax.ShapeDtypeStruct((a, d), f32),
                jax.ShapeDtypeStruct((d, tb), f32),
                jax.ShapeDtypeStruct((d, tb), f32),
                jax.ShapeDtypeStruct((d, tb), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((F, 3 * a, tb), f32),
                pltpu.VMEM((F, H, hd, tb), f32),  # ctx, reused as dq
                pltpu.VMEM((F, H, hd, tb), f32),  # dctx
                pltpu.VMEM((F, H, hd, tb), f32),  # dk
                pltpu.VMEM((F, H, hd, tb), f32),  # dv
                pltpu.VMEM((F, H, tb), f32),      # score layout fix
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=6 * B * F * (3 * d * a + 2 * F * a + a * d),
                bytes_accessed=4 * B * F * d * cdt.itemsize,
                transcendentals=B * H * F * F,
            ),
        )(x_fm, g, wqkv_b, bqkv_b, wo_b, wof_b, wqkvt_b, bo_b, ls_b)

        dp = {
            "wq": dwqkv[0:a].T, "wk": dwqkv[a:2 * a].T,
            "wv": dwqkv[2 * a:].T,
            "bq": jnp.sum(dbqkv[0:a], axis=-1),
            "bk": jnp.sum(dbqkv[a:2 * a], axis=-1),
            "bv": jnp.sum(dbqkv[2 * a:], axis=-1),
            "wo": dwo, "bo": jnp.sum(dbo, axis=-1),
        }
        if use_residual:
            dp["ln_scale"] = jnp.sum(dls, axis=-1)
            dp["ln_bias"] = jnp.sum(dlb, axis=-1)
        return dx, dp

    @jax.custom_vjp
    def attn_block_fm(x_fm, p):
        return forward(x_fm, p)

    def fwd(x_fm, p):
        return forward(x_fm, p), (x_fm, p)

    def bwd(res, g):
        x_fm, p = res
        dx, dp = backward(x_fm, p, g)
        dp = {k: v.astype(p[k].dtype) for k, v in dp.items()}
        return dx, dp

    attn_block_fm.defvjp(fwd, bwd)
    return attn_block_fm
