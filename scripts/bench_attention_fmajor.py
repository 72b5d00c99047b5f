"""A/B the feature-major fused attention block vs the XLA tower on TPU.

Round-3 context: at flagship shapes (B=16384, F=27, d=16, a=64, H=4,
bf16) the XLA attention tower costs ~30 ms of the 57 ms
AttentionDeepFM step, ~12 ms of which is pure layout churn (profiled;
RESULTS.md). The sample-major fused kernel loses at F=27 (lane padding)
and is gated to F<=16. The feature-major kernel
(ops/pallas/attention_fmajor_kernel.py) puts the batch in lanes so
nothing lane-pads at any F; this tool measures whether it wins.

Variants (full value+grad of the MHSA tower, i.e. what training runs):
  xla     — plain einsum path (use_pallas=False), XLA autodiff
  fmajor  — feature-major fused fwd+bwd kernels (use_pallas=True)

Chained-scan timing with a terminal host readback, per CLAUDE.md (the
axon relay makes un-chained microbenchmarks lie).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_attention_fmajor.py
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--fields", type=int, default=27)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--attn-dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from deepfm_tpu.ops.attention import MultiHeadSelfAttention

    cdt = jnp.dtype(args.dtype)
    B, F, D = args.batch, args.fields, args.embed
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32)).astype(cdt)
    print(f"backend={jax.default_backend()} B={B} F={F} d={D} "
          f"a={args.attn_dim} H={args.heads} layers={args.layers} "
          f"dtype={args.dtype}", flush=True)

    results = {}
    for name, use_pallas in (("xla", False), ("fmajor", True)):
        m = MultiHeadSelfAttention(
            embed_dim=D, num_heads=args.heads, attention_dim=args.attn_dim,
            num_layers=args.layers, use_residual=True,
            compute_dtype=cdt, use_pallas=use_pallas,
        )
        v = m.init(jax.random.PRNGKey(0), x)

        def fwd(z, m=m, v=v):
            return m.apply(v, z)

        def fwdbwd(z, m=m, v=v):
            def loss(params, zz):
                return jnp.sum(m.apply(params, zz).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(v, z)

        t_f = timeit(jax.jit(fwd), x, iters=args.iters)
        t_fb = timeit(jax.jit(fwdbwd), x, iters=args.iters)
        results[name] = (t_f, t_fb)
        print(f"{name:8s} fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms",
              flush=True)

    if all(k in results for k in ("xla", "fmajor")):
        f_ratio = results["xla"][0] / results["fmajor"][0]
        fb_ratio = results["xla"][1] / results["fmajor"][1]
        print(f"fmajor speedup: fwd {f_ratio:.2f}x  fwd+bwd {fb_ratio:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
