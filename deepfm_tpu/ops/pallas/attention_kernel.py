"""Pallas TPU kernel: fully-fused field self-attention block.

One kernel per attention block computes QKV projections, per-head scaled
dot-product softmax over the F fields, the context matmul, the output
projection and the residual + LayerNorm — entirely in VMEM per batch tile.
The XLA path materializes Q/K/V (B,F,A), scores (B,H,F,F), weights, context
and the pre-norm sum in HBM (7+ round trips of B-sized tensors); here only
x comes in and the normalized output goes out.

Field attention has tiny F (~16 fields) so the whole score tensor for a
128-sample tile is a few hundred KB — no flash-attention tiling needed;
the fusion, not the algorithm, is the win (reference semantics:
deepfm/models/layers/attention.py:91-120).

Backward: custom_vjp recomputing through the jnp oracle (cheap relative to
saved HBM traffic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_oracle(x, p, num_heads, use_residual):
    """jnp reference of one attention block (same math as ops/attention.py).

    Params are cast to the input's compute dtype FIRST — matching the
    module's jnp path. Round-3 find: without the cast, ``x(bf16) @
    w(f32)`` promotes the ENTIRE attention tower (q/k/v, scores,
    softmax, context, and all their adjoints) to f32 — and since this
    oracle serves as the F>16 fallback AND the backward recompute
    target, the flagship F=27 model was paying 2x bytes on every
    attention tensor.
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


def _attn_kernel(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ls_ref, lb_ref, out_ref, *, num_heads, use_residual, f_real,
):
    # Weights arrive PRE-SPLIT per head on an untiled leading axis:
    #   wq/wk/wv (H, d, hd), bq/bk/bv (H, 1, hd), wo (H, hd, d).
    # Heads run in a fori_loop with the output projection folded in
    # (out = Σ_h ctx_h @ wo_h), so per-head Q/K/V/score buffers are
    # allocated ONCE — the unrolled-head version held every head's
    # temporaries live simultaneously (Mosaic does not reuse stack slots
    # across unrolled iterations) and blew scoped vmem at F=32/TB=128.
    tb, f, d = x_ref.shape
    hd = wq_ref.shape[2]
    x = x_ref[:]
    x2 = x.reshape(tb * f, d)

    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    def proj(w, b):
        return jax.lax.dot_general(
            x2, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b

    def head_body(h, out_acc):
        qh = proj(wq_ref[h], bq_ref[h]).reshape(tb, f, hd)
        kh = proj(wk_ref[h], bk_ref[h]).reshape(tb, f, hd)
        vh = proj(wv_ref[h], bv_ref[h]).reshape(tb, f, hd)
        scores = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (TB, F, F)
        if f_real < f:
            # field axis zero-padded to the sublane grid: padded KEYS
            # must not receive attention mass (padded queries emit
            # garbage rows that the caller slices off)
            key_pad = (
                jax.lax.broadcasted_iota(jnp.int32, (tb, f, f), 2)
                >= f_real
            )
            scores = jnp.where(key_pad, -1e30, scores)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx_h = jax.lax.dot_general(
            w, vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(tb * f, hd)
        return out_acc + jax.lax.dot_general(
            ctx_h, wo_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = jax.lax.fori_loop(
        0, num_heads, head_body, jnp.zeros((tb * f, d), jnp.float32)
    )
    out = out + bo_ref[:]

    if use_residual:
        y = out + x2
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        out = yn * ls_ref[:] + lb_ref[:]
    out_ref[:] = out.reshape(tb, f, d)


def _pick_tile(b: int, f: int, d: int, a: int, num_heads: int) -> int | None:
    # LANE-PADDING-AWARE accounting: every materialized value in this
    # kernel has a small trailing dim (d=16, hd=16, f<=32) that Mosaic
    # pads to 128 lanes, so useful-byte accounting under-counts ~4-8x
    # (measured: 17.2 MB actual vs 4.2 MB naive at f=32/tb=128). Count
    # each buffer at 128 lanes. Per-head buffers live once (fori over
    # heads).
    budget = 14 * 1024 * 1024
    for tb in (128, 64):
        if b % tb != 0:
            continue
        lanes = 128
        elems = (
            2 * 2 * tb * f * lanes  # x in + out blocks, double-buffered
            + 3 * tb * f * lanes  # per-head q, k, v
            + 3 * tb * f * lanes  # score chain (scores, exp, weights)
            + tb * f * lanes  # context
            + 2 * tb * f * lanes  # out accumulator + carry copy
        )
        if 4 * elems <= budget:
            return tb
    return None


def make_attention_block_pallas(num_heads: int, use_residual: bool):
    """Returns fn(x (B,F,D), params) -> (B,F,D) fused on TPU."""
    oracle = partial(
        _block_oracle, num_heads=num_heads, use_residual=use_residual
    )

    def forward(x, p):
        b, f_real, d = x.shape
        a = p["wq"].shape[1]
        # Fused attention wins at SMALL field counts (F<=16: 3.4x faster
        # forward, hardware-validated). At Criteo field counts the
        # kernel's buffers are dominated by 128-lane padding of the tiny
        # trailing dims (d/hd=16) and the fused path measures SLOWER
        # than XLA (188k vs 238k ex/s end-to-end at F=27) — so larger F
        # deliberately falls back to the oracle.
        if f_real > 16:
            return oracle(x, p)
        # Pad the field axis to the sublane grid (multiple of 8): the
        # in-kernel (TB·F, ·) <-> (TB, F, ·) regroupings are only
        # tile-exact when F divides the 8-row sublane tile — an odd F
        # would silently relayout wrong. Padded keys are masked out of
        # the softmax; padded query rows are sliced off below.
        f = -(-f_real // 8) * 8
        if jax.default_backend() == "cpu":
            tb = b
        else:
            tb = _pick_tile(b, f, d, a, num_heads)
        if tb is None:
            return oracle(x, p)

        kernel = partial(
            _attn_kernel, num_heads=num_heads, use_residual=use_residual,
            f_real=f_real,
        )
        x32 = x.astype(jnp.float32)
        if f != f_real:
            x32 = jnp.pad(x32, ((0, 0), (0, f - f_real), (0, 0)))

        def rep(shape):
            nd = len(shape)
            return pl.BlockSpec(
                shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM
            )

        ls = p.get("ln_scale", jnp.ones((d,), jnp.float32))
        lb = p.get("ln_bias", jnp.zeros((d,), jnp.float32))
        hd = a // num_heads

        # pre-split per head on an untiled leading axis (columns are
        # h-major: column index = h*hd + j)
        def qkv(w):
            return (
                w.astype(jnp.float32)
                .reshape(d, num_heads, hd)
                .transpose(1, 0, 2)
            )

        def bias(bv):
            return bv.astype(jnp.float32).reshape(num_heads, 1, hd)

        wo3 = p["wo"].astype(jnp.float32).reshape(num_heads, hd, d)

        out = pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec(
                    (tb, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                rep((num_heads, d, hd)), rep((num_heads, 1, hd)),
                rep((num_heads, d, hd)), rep((num_heads, 1, hd)),
                rep((num_heads, d, hd)), rep((num_heads, 1, hd)),
                rep((num_heads, hd, d)), rep((1, d)),
                rep((1, d)), rep((1, d)),
            ],
            out_specs=pl.BlockSpec(
                (tb, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, f, d), jnp.float32),
            interpret=jax.default_backend() == "cpu",
            cost_estimate=pl.CostEstimate(
                flops=2 * b * f * (3 * d * a + 2 * f * a + a * d),
                bytes_accessed=8 * b * f * d,
                transcendentals=b * num_heads * f * f,
            ),
        )(
            x32,
            qkv(p["wq"]), bias(p["bq"]),
            qkv(p["wk"]), bias(p["bk"]),
            qkv(p["wv"]), bias(p["bv"]),
            wo3, p["bo"].astype(jnp.float32).reshape(1, d),
            jnp.asarray(ls, jnp.float32).reshape(1, d),
            jnp.asarray(lb, jnp.float32).reshape(1, d),
        )
        if f != f_real:
            out = out[:, :f_real, :]
        # match the oracle's promotion semantics (bf16 x with f32 params
        # -> f32), so the custom_vjp cotangent dtype is consistent with
        # jax.vjp(oracle) in the backward
        return out.astype(jnp.result_type(x.dtype, p["wq"].dtype))

    @jax.custom_vjp
    def attn_block(x, p):
        return forward(x, p)

    def fwd(x, p):
        return forward(x, p), (x, p)

    def bwd(res, g):
        x, p = res
        _, vjp = jax.vjp(oracle, x, p)
        return vjp(g)

    attn_block.defvjp(fwd, bwd)
    return attn_block
