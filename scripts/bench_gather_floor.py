"""Measure the TPU gather engine's per-row floor vs the step's passes.

The round-3 DeepFM roofline (RESULTS.md) has two row-latency-bound
passes left: the forward packed-row gather (3.46 ms, 8.1 ns/row) and
the backward's ``ct[order]`` permute in the densify prologue (2.70 ms,
6.3 ns/row). VERDICT r3 #6 asks either to fuse the permute away or to
prove those passes already run at the gather engine's speed-of-light.

Fusing is a structural loser on this hardware: an in-kernel per-row
DMA gather is scalar-core issue-rate bound (~tens of ns/row — worse
than the 6-8 ns/row XLA already gets from the gather unit), and an
MXU one-hot permute needs the full n-wide stream as an operand
(426k columns — no VMEM tile). So this tool measures the RAW floor:

  permute — y = x[order] for a random permutation at the exact
            backward-prologue shape/dtype ((n, d+1) f32 -> transposed
            f32 stream, fused exactly as sort_pairs builds it);
  gather  — y = table[ids] at the forward's packed-row shape
            ((phys, 128) f32 table, n random row ids).

If raw ns/row here matches the in-step pass, the pass IS at engine
speed-of-light and the roofline can say so with a measurement.

Chained-scan timing with terminal host readback per CLAUDE.md.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_gather_floor.py
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
    ap.add_argument("--rows", type=int, default=16384 * 26,
                    help="sparse pairs per step (batch x lookup fields)")
    ap.add_argument("--width", type=int, default=17,
                    help="cotangent row width (d + first-order col)")
    ap.add_argument("--phys", type=int, default=1_486_000,
                    help="packed physical table rows (10.4M/7 at d=16)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    n, w = args.rows, args.width
    rng = np.random.default_rng(0)
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, args.phys, n).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(args.phys, 128)).astype(np.float32)
    )

    print(f"backend={jax.default_backend()} n={n} w={w} "
          f"phys={args.phys}", flush=True)

    # backward prologue: permute + transpose, as sort_pairs builds ctsT
    def permute(x):
        return x[order].astype(jnp.float32).T

    # forward: full packed-row gather
    def gather(x):
        return jnp.take(x, ids, axis=0)

    t_p = timeit(permute, ct, iters=args.iters)
    t_g = timeit(gather, table, iters=args.iters)
    res = {
        "permute_ms": t_p,
        "permute_ns_per_row": t_p * 1e6 / n,
        "gather_ms": t_g,
        "gather_ns_per_row": t_g * 1e6 / n,
        "n": n,
        "width": w,
        "phys": args.phys,
    }
    print(f"permute (n,{w}) f32 -> T : {t_p:7.3f} ms  "
          f"{res['permute_ns_per_row']:.2f} ns/row", flush=True)
    print(f"gather  (n,128) rows    : {t_g:7.3f} ms  "
          f"{res['gather_ns_per_row']:.2f} ns/row", flush=True)

    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(res, indent=2))
        print(f"written to {args.out}", flush=True)


if __name__ == "__main__":
    main()
