"""Pallas TPU kernel: fused CIN outer-product + compression.

One CIN layer computes out[b,m,d] = sum_{h,f} W[m, h*F+f] * hid[b,h,d] *
x0[b,f,d] + bias[m]. The jnp oracle (deepfm_tpu/ops/cin.py:cin_compress,
mirroring the reference's einsum+Conv1d, reference
deepfm/models/layers/cin.py:84-91) materializes the (B, H*F, D) outer
product in HBM — 3x the traffic of the inputs for H=F.

This kernel keeps the outer product entirely in VMEM and feeds the MXU one
large matmul per batch tile:

  layout: hid -> (H, D, B), x0 -> (F, D, B)   [D*B contiguous = TPU lanes]
  per tile of TB samples:
    outer (H*F, D*TB) = hid_tile broadcast-times x0_tile   (VPU)
    out   (M,   D*TB) = W (M, H*F) @ outer + bias          (MXU)

MXU operands are (M x HF) @ (HF x D*TB): K = H*F (256 for the first layer of
a 16-field model), N = D*TB = 2048 for TB=128 — full 128-lane utilization,
vs N=16 if batch were kept as the leading axis.

Backward is standard einsum contraction (linear op), left to XLA via
custom_vjp — the fusion win is forward-only traffic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cin_kernel(hid_ref, x0_ref, w_ref, b_ref, out_ref):
    # hid_ref: (H, D, TB); x0_ref: (F, D, TB); w_ref: (M, H*F); b_ref: (M, 1)
    h, d, tb = hid_ref.shape
    f = x0_ref.shape[0]
    hid = hid_ref[:].reshape(h, 1, d * tb)
    x0 = x0_ref[:].reshape(1, f, d * tb)
    outer = (hid * x0).reshape(h * f, d * tb)
    out = jax.lax.dot_general(
        w_ref[:],
        outer,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (out + b_ref[:]).reshape(out_ref.shape)


def _pick_tile(b: int, h: int, f: int, d: int, m: int) -> int | None:
    """Batch tile (TPU lane dim, must be a multiple of 128) fitting ~14 MB of
    VMEM; None -> caller falls back to the jnp path.

    Accounting: pipelined in/out blocks are double-buffered by Pallas (x2),
    the outer-product scratch is single-buffered.
    """
    budget = 14 * 1024 * 1024
    for tb in (512, 384, 256, 128):
        if b % tb != 0:
            continue
        elems = (
            2 * (h + f + m) * d * tb  # hid/x0/out blocks, double-buffered
            + 2 * m * (h * f + 1)  # weights + bias
            + h * f * d * tb  # outer-product scratch
        )
        if 4 * elems <= budget:
            return tb
    return None


@partial(jax.custom_vjp, nondiff_argnums=())
def cin_compress_pallas(hidden, x0, w, b):
    """(B,H,D),(B,F,D),(M,H*F),(M,) -> (B,M,D) pre-ReLU, fused on TPU."""
    return _cin_forward(hidden, x0, w, b)


def _cin_forward(hidden, x0, w, b):
    from deepfm_tpu.ops.cin import cin_compress

    bsz, h, d = hidden.shape
    f = x0.shape[1]
    m = w.shape[0]
    if jax.default_backend() == "cpu":
        tb = bsz  # interpreter mode: no tiling constraints
    else:
        tb = _pick_tile(bsz, h, f, d, m)
    if tb is None:
        return cin_compress(hidden, x0, w, b)

    hid_t = jnp.transpose(hidden, (1, 2, 0))  # (H, D, B)
    x0_t = jnp.transpose(x0, (1, 2, 0))  # (F, D, B)
    w32 = w.astype(jnp.float32)
    b32 = b.astype(jnp.float32)

    grid = (bsz // tb,)
    out_t = pl.pallas_call(
        _cin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (h, d, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f, d, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((m, h * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m, d, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, d, bsz), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * m * h * f * d + bsz * h * f * d,
            bytes_accessed=4 * bsz * d * (h + f + m) + 4 * m * h * f,
            transcendentals=0,
        ),
    )(
        hid_t.astype(jnp.float32),
        x0_t.astype(jnp.float32),
        w32,
        b32.reshape(-1, 1),
    )
    return jnp.transpose(out_t, (2, 0, 1)).astype(hidden.dtype)  # (B, M, D)


def _cin_fwd(hidden, x0, w, b):
    return _cin_forward(hidden, x0, w, b), (hidden, x0, w)


def _cin_bwd(residuals, g):
    hidden, x0, w = residuals
    bsz, h, d = hidden.shape
    f = x0.shape[1]
    m = w.shape[0]
    w3 = w.reshape(m, h, f)
    g = g.astype(jnp.float32)
    hid32 = hidden.astype(jnp.float32)
    x032 = x0.astype(jnp.float32)
    dhid = jnp.einsum("bmd,mhf,bfd->bhd", g, w3, x032).astype(hidden.dtype)
    dx0 = jnp.einsum("bmd,mhf,bhd->bfd", g, w3, hid32).astype(x0.dtype)
    dw = (
        jnp.einsum("bmd,bhd,bfd->mhf", g, hid32, x032)
        .reshape(m, h * f)
        .astype(w.dtype)
    )
    db = jnp.sum(g, axis=(0, 2)).astype(w.dtype)
    return dhid, dx0, dw, db


cin_compress_pallas.defvjp(_cin_fwd, _cin_bwd)
