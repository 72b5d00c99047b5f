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
    """jnp reference of one attention block (same math as ops/attention.py)."""
    b, f, d = x.shape
    a = p["wq"].shape[1]
    hd = a // num_heads

    def proj(w, bias):
        return x.reshape(b * f, d) @ w + bias

    q = proj(p["wq"], p["bq"]).reshape(b, f, num_heads, hd)
    k = proj(p["wk"], p["bk"]).reshape(b, f, num_heads, hd)
    v = proj(p["wv"], p["bv"]).reshape(b, f, num_heads, hd)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k) / jnp.sqrt(
        jnp.asarray(hd, x.dtype)
    )
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
    tb, f, d = x_ref.shape
    a = wq_ref.shape[1]
    hd = a // num_heads
    x = x_ref[:]
    x2 = x.reshape(tb * f, d)

    def mm(z, w_r, b_r):
        return (
            jax.lax.dot_general(
                z, w_r[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_r[:]
        )

    q = mm(x2, wq_ref, bq_ref)  # (TB*F, A)
    k = mm(x2, wk_ref, bk_ref)
    v = mm(x2, wv_ref, bv_ref)

    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    # Mosaic matmuls support one batch dim, so heads unroll statically:
    # per head, a lane slice of Q/K/V and a (TB)-batched (F, hd) matmul.
    ctx_heads = []
    for h in range(num_heads):
        qh = q[:, h * hd : (h + 1) * hd].reshape(tb, f, hd)
        kh = k[:, h * hd : (h + 1) * hd].reshape(tb, f, hd)
        vh = v[:, h * hd : (h + 1) * hd].reshape(tb, f, hd)
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
        )  # (TB, F, hd)
        ctx_heads.append(ctx_h.reshape(tb * f, hd))
    ctx = jnp.concatenate(ctx_heads, axis=-1)  # (TB*F, A)
    out = mm(ctx, wo_ref, bo_ref)

    if use_residual:
        y = out + x2
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        out = yn * ls_ref[:] + lb_ref[:]
    out_ref[:] = out.reshape(tb, f, d)


def _pick_tile(b: int, f: int, d: int, a: int, num_heads: int) -> int | None:
    # Accounting counts every live buffer across the unrolled head loop
    # (Mosaic does not reuse stack slots between unrolled iterations);
    # the budget leaves headroom under the 16 MB scoped-vmem limit.
    # Tile fixed at 128: the one hardware-validated configuration — the
    # accounting's headroom factor is only calibrated there, and larger
    # tiles risk a runtime scoped-vmem compile failure (no oracle
    # fallback possible at that point) for no measured gain.
    budget = 12 * 1024 * 1024
    for tb in (128,):
        if b % tb != 0:
            continue
        elems = (
            2 * 2 * tb * f * d  # x in + out, double-buffered
            + 3 * tb * f * a  # q, k, v
            + 2 * num_heads * tb * f * f  # scores + weights (per head,
            + tb * f * a  # context               unrolled -> all live)
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
        # Pad the field axis to the sublane grid (multiple of 8): the
        # in-kernel (TB·F, ·) <-> (TB, F, ·) regroupings are only
        # tile-exact when F divides the 8-row sublane tile — an odd F
        # (Criteo: 27 fields) would silently relayout wrong. Padded keys
        # are masked out of the softmax; padded query rows are sliced
        # off below.
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
        out = pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec(
                    (tb, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                rep((d, a)), rep((1, a)),
                rep((d, a)), rep((1, a)),
                rep((d, a)), rep((1, a)),
                rep((a, d)), rep((1, d)),
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
            p["wq"].astype(jnp.float32), p["bq"].astype(jnp.float32).reshape(1, a),
            p["wk"].astype(jnp.float32), p["bk"].astype(jnp.float32).reshape(1, a),
            p["wv"].astype(jnp.float32), p["bv"].astype(jnp.float32).reshape(1, a),
            p["wo"].astype(jnp.float32), p["bo"].astype(jnp.float32).reshape(1, d),
            jnp.asarray(ls, jnp.float32).reshape(1, d),
            jnp.asarray(lb, jnp.float32).reshape(1, d),
        )
        if f != f_real:
            out = out[:, :f_real, :]
        return out.astype(x.dtype)

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
