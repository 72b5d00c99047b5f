"""A/B the packed-lookup forward modes on the real TPU.

"window" gathers whole (n, 128) physical rows then lane-extracts with
``pack`` masked selects (re-reading the gathered rows per select);
"flat" gathers dcol-element contiguous slices from the flat view.

Relay-attached TPU benchmarking rules (see CLAUDE.md): iterations chain
through a carry and END WITH A HOST READBACK — block_until_ready alone
can report ~0 ms for unconsumed results here.

Usage: python scripts/bench_packed_fwd.py [--rows 1485824] [--n 442368]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepfm_tpu.ops.pallas.packed_grad_kernel import make_packed_lookup


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_485_824)  # phys rows
    ap.add_argument("--n", type=int, default=442_368)  # 16384 * 27
    ap.add_argument("--dcol", type=int, default=17)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    pack = 128 // args.dcol

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (args.rows, 128), jnp.float32)
    ids = jax.random.randint(
        key, (args.n,), 0, args.rows * pack, jnp.int32
    )

    for mode in ("window", "flat"):
        fn = make_packed_lookup(args.dcol, pack, fwd_mode=mode)

        @jax.jit
        def chain(table, ids, fn=fn):
            def body(carry, _):
                rows = fn(table, ids)
                s = jnp.sum(rows[:, 0])
                # perturb ids so iterations can't CSE away
                return (carry + s).astype(jnp.float32), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=args.iters
            )
            return out

        _ = chain(table, ids).item()  # compile + warm
        t0 = time.perf_counter()
        _ = chain(table, ids).item()  # host readback forces execution
        dt = (time.perf_counter() - t0) / args.iters
        gb = args.n * (128 if mode == "window" else args.dcol) * 4 / 1e9
        print(
            f"{mode:>7}: {dt * 1e3:7.3f} ms/lookup  "
            f"({args.n} ids, ~{gb:.2f} GB min traffic, "
            f"{gb / dt:.0f} GB/s effective)"
        )


if __name__ == "__main__":
    main()
