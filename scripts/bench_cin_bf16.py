"""A/B the CIN stack kernels' bf16 MXU-operand path on TPU.

``pallas.cin_bf16_operands`` (round 4) feeds the CIN forward/backward
matmuls bf16 operands with f32 accumulation when activations are
already bfloat16 — halving operand VMEM/HBM traffic and pinning
single-pass MXU issue. The round-3 CIN backward sat at ~45% MXU
utilization (RESULTS.md step breakdown, 14.4 ms at bench scale); this
measures whether bf16 operands move it, at two granularities:

  kernel — CIN fwd and fwd+bwd in isolation at the bench shape
           (B=16384, F=27 incl. dense-bucket field, d=16, layers
           (128,128) split_half), f32 vs bf16 operands;
  step   — the full xdeepfm train step via bench.py's harness,
           pallas.cin_bf16_operands off vs on.

The flag stays off by default unless this wins (VERDICT r3 #5
protocol: gate kernels on measured outcomes).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_cin_bf16.py
       [--skip-step] [--iters 20]
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


def kernel_ab(args) -> None:
    from deepfm_tpu.ops.pallas.cin_stack_kernel import make_cin_stack_pallas

    B, F, D = args.batch, args.fields, args.embed
    layer_sizes = tuple(args.layers)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.normal(size=(B, F, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    from deepfm_tpu.ops.cin import cin_layer_sizes

    ds_, ns_ = cin_layer_sizes(layer_sizes, True)
    ws, bs = [], []
    prev = F
    for i, ls in enumerate(layer_sizes):
        ws.append(jnp.asarray(
            rng.normal(size=(ls, prev * F)).astype(np.float32) * 0.1))
        bs.append(jnp.zeros((ls,), jnp.float32))
        prev = ns_[i] if i < len(layer_sizes) - 1 else ls

    print(f"kernel A/B: B={B} F={F} d={D} layers={layer_sizes} "
          f"backend={jax.default_backend()}", flush=True)
    for name, bf16 in (("f32-ops", False), ("bf16-ops", True)):
        fn = make_cin_stack_pallas(layer_sizes, True, bf16_operands=bf16)

        def fwd(z, fn=fn):
            return fn(z, ws, bs)

        def fwdbwd(z, fn=fn):
            def loss(zz, w):
                return jnp.sum(fn(zz, w, bs).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(z, ws)

        t_f = timeit(jax.jit(fwd), x0, iters=args.iters)
        t_fb = timeit(jax.jit(fwdbwd), x0, iters=args.iters)
        print(f"{name:9s} fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms",
              flush=True)


def step_ab(args) -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    for name, flag in (("cin_bf16=off", False), ("cin_bf16=on", True)):
        ex_s, engagement = bench.bench_tpu(
            "xdeepfm", pallas_overrides={"cin_bf16_operands": flag}
        )
        print(f"step {name:13s} {ex_s:,.0f} ex/s  "
              f"kernels={engagement.get('kernels')}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--fields", type=int, default=27)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--layers", nargs="*", type=int, default=[128, 128])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    kernel_ab(args)
    if not args.skip_step:
        step_ab(args)


if __name__ == "__main__":
    main()
