"""Kernel-level A/B at small field counts: XLA tower vs feature-major.

VERDICT r4 #8 asked for "one attention kernel, or a measured reason for
two". Running this harness settled it: the round-2 sample-major kernel's
backward CRASHED under bf16 compute (its forward promoted the output to
f32 while its oracle-vjp expected bf16 cotangents — a latent bug in its
only remaining domain, masked in production because the f-major kernel
is preferred whenever eligible and the CPU suite runs f32). The
sample-major kernel was deleted (round 5); this harness now measures the
surviving two paths — XLA tower vs the f-major kernel — at the small
field counts that were the sample-major kernel's niche, pinning whether
the f-major kernel should stay engaged there (it is eligible at any F).

Measures ONE attention block at kernel granularity (identical raw
params, no flax indirection), forward and forward+backward, chained-
scan timing with a terminal host readback per CLAUDE.md.

Usage: PYTHONPATH=/root/.axon_site:. \
       python scripts/bench_attention_smajor_ab.py --fields 8 16 27 \
       [--json outputs/attention_smajor_ab/results.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters=20, warmup=1):
    """One lax.scan dispatch of `iters` chained calls; host readback."""

    @jax.jit
    def run(x):
        def body(carry, _):
            bump = jnp.minimum(jax.lax.optimization_barrier(carry), 0.0)
            out = fn(x + bump.astype(x.dtype))
            leaf = jax.tree_util.tree_leaves(out)[0]
            new_carry = jnp.abs(leaf.reshape(-1)[0]).astype(jnp.float32)
            return new_carry, ()

        carry, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return carry

    for _ in range(warmup):
        _ = run(x).item()
    t0 = time.perf_counter()
    _ = run(x).item()
    return (time.perf_counter() - t0) / iters * 1e3


def make_params(d: int, a: int, rng) -> dict:
    def w(*shape):
        return jnp.asarray(
            rng.normal(size=shape, scale=0.05).astype(np.float32)
        )

    return {
        "wq": w(d, a), "bq": w(a), "wk": w(d, a), "bk": w(a),
        "wv": w(d, a), "bv": w(a), "wo": w(a, d), "bo": w(d),
        "ln_scale": jnp.ones((d,), jnp.float32),
        "ln_bias": jnp.zeros((d,), jnp.float32),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--fields", nargs="*", type=int, default=[8, 16])
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--attn-dim", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from deepfm_tpu.ops.pallas.attention_fmajor_kernel import (
        block_oracle,
        make_attention_block_fmajor,
    )

    cdt = jnp.dtype(args.dtype)
    B, D, H, A = args.batch, args.embed, args.heads, args.attn_dim
    rng = np.random.default_rng(0)
    p = make_params(D, A, rng)
    fmajor = make_attention_block_fmajor(H, True)

    out: dict = {}
    for F in args.fields:
        x = jnp.asarray(
            rng.normal(size=(B, F, D)).astype(np.float32)
        ).astype(cdt)
        print(f"backend={jax.default_backend()} B={B} F={F} d={D} a={A} "
              f"H={H} dtype={args.dtype}", flush=True)

        def via_fmajor(z):
            zf = jnp.transpose(z, (1, 2, 0))
            return jnp.transpose(fmajor(zf, p), (2, 0, 1))

        variants = {
            "xla": lambda z: block_oracle(z, p, H, True),
            "fmajor": via_fmajor,
        }
        rows = {}
        for name, fn in variants.items():
            def fwdbwd(z, fn=fn):
                def loss(zz):
                    return jnp.sum(fn(zz).astype(jnp.float32) ** 2)
                return jax.grad(loss)(z)

            t_f = timeit(jax.jit(fn), x, iters=args.iters)
            t_fb = timeit(jax.jit(fwdbwd), x, iters=args.iters)
            rows[name] = {"fwd_ms": t_f, "fwdbwd_ms": t_fb}
            print(f"  {name:8s} fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms",
                  flush=True)
        win_f = min(rows, key=lambda k: rows[k]["fwd_ms"])
        win_fb = min(rows, key=lambda k: rows[k]["fwdbwd_ms"])
        print(f"  F={F}: fastest fwd={win_f}, fwd+bwd={win_fb}", flush=True)
        out[F] = rows

    if args.json:
        path = Path(args.json)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(out, indent=2))
        print(f"written to {path}", flush=True)


if __name__ == "__main__":
    main()
