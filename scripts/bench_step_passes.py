"""Microbench the DeepFM step's heavy passes, in isolation, on the TPU.

Round-3 profile of the 26.9 ms step (scripts/profile_step.py):
  7.95 ms fused table Adam      (5.3 GB @ ~670 GB/s — HBM-bound)
  5.41 ms packed grad densify   (~335 GFLOP of one-hot matmuls -> 6x SoL)
  3.46 ms forward gather+convert fusion (426k rows, latency-bound)
  2.70 ms ct[order] permute     (29 MB, row-latency-bound)
  2.01 ms decayed-norm sumsq    (g+p = 1.5 GB @ ~760 GB/s — HBM-bound)

This tool A/Bs candidate cuts for the non-HBM-bound passes:
  gather:  fused gather+convert  vs  gather f32 -> extract -> late convert
  permute: ct[order] take        vs  multi-operand lax.sort carrying ct
  densify: TILE_PHYS / CHUNK variants

Chain iterations through a carry and END WITH A HOST READBACK — on the
axon relay, block_until_ready alone under-reports (CLAUDE.md).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_step_passes.py
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

B, F, D = 16384, 26, 16
DCOL = D + 1
PACK = 128 // DCOL
VOCAB = 400_000 * F
PHYS = -(-(-(-VOCAB // PACK)) // 128) * 128


def timeit(fn, *args, iters=10, warmup=1):
    """Time fn via ONE lax.scan dispatch of `iters` chained iterations.

    Per-call dispatches ride the relay (~4-8 ms each) and swamp
    millisecond-scale passes; the scan amortizes one dispatch. The
    first operand is perturbed through an optimization_barrier'd carry
    so XLA cannot hoist the body out of the loop, and the run ends with
    a host readback (block_until_ready alone under-reports here).
    """

    # perturb the cheapest-to-touch operand (the 1-D id stream when
    # present): adding the bump to a giant table would itself cost a
    # full memory pass per iteration
    idx = 0
    for i, a in enumerate(args):
        if jnp.issubdtype(a.dtype, jnp.integer):
            idx = i
            break

    @jax.jit
    def run(args):
        def body(carry, _):
            bump = jnp.minimum(
                jax.lax.optimization_barrier(carry), 0
            ).astype(args[idx].dtype)
            it_args = tuple(
                a + bump if i == idx else a for i, a in enumerate(args)
            )
            out = fn(*it_args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            new_carry = jnp.abs(leaf.reshape(-1)[0]).astype(jnp.int32)
            return new_carry, ()

        carry, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), None, length=iters
        )
        return carry

    for _ in range(warmup):
        _ = run(args).item()  # compile + warm, full sync
    t0 = time.perf_counter()
    _ = run(args).item()  # one dispatch, host readback sync
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=["all", "gather", "permute", "densify",
                             "sparse_adam"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = B * F
    ids = jnp.asarray(rng.integers(0, VOCAB, n).astype(np.int32))
    print(f"n={n} ids, table ({PHYS}, 128) f32 "
          f"({PHYS * 128 * 4 / 2**30:.2f} GiB)", flush=True)

    if args.which in ("all", "gather"):
        table = jnp.zeros((PHYS, 128), jnp.float32)

        @jax.jit
        def fused(table, ids):
            rows = jnp.take(table, ids // PACK, axis=0)
            sub = ids % PACK
            out = jnp.zeros((n, DCOL), table.dtype)
            for k in range(PACK):
                out = jnp.where(
                    (sub == k)[:, None],
                    jax.lax.dynamic_slice_in_dim(rows, k * DCOL, DCOL, 1),
                    out,
                )
            return out.astype(jnp.bfloat16)  # convert fuses into gather

        @jax.jit
        def late_convert(table, ids):
            rows = jnp.take(table, ids // PACK, axis=0)
            sub = ids % PACK
            out = jnp.zeros((n, DCOL), table.dtype)
            for k in range(PACK):
                out = jnp.where(
                    (sub == k)[:, None],
                    jax.lax.dynamic_slice_in_dim(rows, k * DCOL, DCOL, 1),
                    out,
                )
            # barrier pins the extract in f32; convert runs on the
            # (n, 17) block instead of fusing into the row gather
            out = jax.lax.optimization_barrier(out)
            return out.astype(jnp.bfloat16)

        @jax.jit
        def barrier_rows(table, ids):
            rows = jnp.take(table, ids // PACK, axis=0)
            rows = jax.lax.optimization_barrier(rows)
            sub = ids % PACK
            out = jnp.zeros((n, DCOL), jnp.bfloat16)
            rows16 = rows.astype(jnp.bfloat16)
            for k in range(PACK):
                out = jnp.where(
                    (sub == k)[:, None],
                    jax.lax.dynamic_slice_in_dim(rows16, k * DCOL, DCOL, 1),
                    out,
                )
            return out

        print(f"gather fused(conv-in-gather): "
              f"{timeit(fused, table, ids):7.2f} ms", flush=True)
        print(f"gather f32 + late convert:    "
              f"{timeit(late_convert, table, ids):7.2f} ms", flush=True)
        print(f"gather f32 (barrier) + bf16 extract: "
              f"{timeit(barrier_rows, table, ids):7.2f} ms", flush=True)

    if args.which in ("all", "permute"):
        ct = jnp.asarray(rng.normal(size=(n, DCOL)).astype(np.float32))

        @jax.jit
        def take_permute(ct, ids):
            sids, order = jax.lax.sort_key_val(
                ids, jnp.arange(n, dtype=jnp.int32)
            )
            return sids, ct[order].T

        @jax.jit
        def multi_sort(ct, ids):
            ops = (ids,) + tuple(ct[:, j] for j in range(DCOL))
            sorted_ops = jax.lax.sort(ops, num_keys=1)
            return sorted_ops[0], jnp.stack(sorted_ops[1:], axis=0)

        @jax.jit
        def take_permute_bf16(ct, ids):
            sids, order = jax.lax.sort_key_val(
                ids, jnp.arange(n, dtype=jnp.int32)
            )
            # 3-way exact split BEFORE the permute: moves 3x2B instead
            # of 4B+transpose; planes stay (dcol, n)-major
            bits = jax.lax.bitcast_convert_type(ct.T, jnp.uint32)
            t16 = jax.lax.bitcast_convert_type(
                bits & np.uint32(0xFFFF0000), jnp.float32)
            t24 = jax.lax.bitcast_convert_type(
                bits & np.uint32(0xFFFFFF00), jnp.float32)
            planes = jnp.concatenate(
                [t16.astype(jnp.bfloat16),
                 (t24 - t16).astype(jnp.bfloat16),
                 (jax.lax.bitcast_convert_type(bits, jnp.float32) - t24
                  ).astype(jnp.bfloat16)], axis=0)  # (3*dcol, n)
            return sids, planes[:, order]

        print(f"permute ct[order] (rows):     "
              f"{timeit(take_permute, ct, ids):7.2f} ms", flush=True)
        print(f"permute multi-operand sort:   "
              f"{timeit(multi_sort, ct, ids):7.2f} ms", flush=True)
        print(f"permute bf16-planes lanes:    "
              f"{timeit(take_permute_bf16, ct, ids):7.2f} ms", flush=True)

    if args.which in ("all", "densify"):
        from deepfm_tpu.ops.pallas import packed_grad_kernel as pgk

        ct = jnp.asarray(
            rng.normal(size=(n, DCOL)).astype(np.float32)
        )
        saved = (pgk.TILE_PHYS, pgk.CHUNK, pgk.WIN)
        for tile, chunk in [(512, 128), (1024, 128), (512, 256),
                            (1024, 256), (2048, 128)]:
            pgk.TILE_PHYS, pgk.CHUNK = tile, chunk
            pgk.WIN = 2 * chunk
            pgk.densify_rows_grad_packed.clear_cache()

            def run(ct, ids):
                return pgk.densify_rows_grad_packed(
                    ct, ids, PHYS * PACK, PACK
                )

            try:
                ms = timeit(run, ct, ids, iters=5)
                print(f"densify TILE={tile} CHUNK={chunk}: {ms:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"densify TILE={tile} CHUNK={chunk}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        pgk.TILE_PHYS, pgk.CHUNK, pgk.WIN = saved
        pgk.densify_rows_grad_packed.clear_cache()

    if args.which in ("all", "sparse_adam"):
        # A/B the fused sparse backward-optimizer against the two-pass
        # (densify -> decayed-norm sumsq -> fused Adam) chain it
        # replaces, at bench shapes. p/mu/nu thread through the scan
        # CARRY so the aliased kernels update in place across
        # iterations (matching the donated trainer state) instead of
        # paying a defensive copy per step.
        from deepfm_tpu.ops.pallas.adam_kernel import fused_table_adam
        from deepfm_tpu.ops.pallas.packed_grad_kernel import (
            densify_rows_grad_packed,
        )
        from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
            sort_pairs,
            sorted_segment_sumsq,
            sparse_table_adam_packed,
        )

        rng2 = np.random.default_rng(1)
        p0 = jnp.asarray(
            (rng2.normal(size=(PHYS, 128)) * 0.01).astype(np.float32)
        )
        mu0 = jnp.zeros((PHYS, 128), jnp.float32)
        nu0 = jnp.zeros((PHYS, 128), jnp.float32)
        ct = jnp.asarray(
            (rng2.normal(size=(n, DCOL)) * 0.1).astype(np.float32)
        )
        lr, wd, clip = 1e-3, 2e-5, 1.0
        step = jnp.asarray(1, jnp.int32)

        def time_update(body, tag):
            # the iteration counter k rolls (ids, ct) each step — the
            # SAME pair multiset (identical numerics), but no longer
            # loop-invariant, so XLA cannot hoist the sort / segsumsq /
            # densify out of the scan (it DID hoist the constant-input
            # sort, which silently excluded the merged path's prologue
            # from the timing). The roll costs two ~30 MB stream copies
            # per iteration, identical for both variants.
            @jax.jit
            def run(p, mu, nu, psq):
                carry, _ = jax.lax.scan(
                    body, (p, mu, nu, psq, jnp.int32(0)), None, length=10
                )
                return carry[0][0, 0]

            _ = run(p0, mu0, nu0, jnp.sum(jnp.square(p0))).item()
            t0 = time.perf_counter()
            _ = run(p0, mu0, nu0, jnp.sum(jnp.square(p0))).item()
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"table update [{tag}]: {ms:7.2f} ms", flush=True)

        def two_pass(carry, _):
            p, mu, nu, psq, k = carry
            ids_k = jnp.roll(ids, k)
            ct_k = jnp.roll(ct, k, axis=0)
            g = densify_rows_grad_packed(ct_k, ids_k, PHYS * PACK, PACK)[:PHYS]
            gn = jnp.sqrt(jnp.sum(jnp.square(g + wd * p)))
            p, mu, nu = fused_table_adam(
                p, mu, nu, g, lr, wd, gn, clip, step
            )
            return (p, mu, nu, psq, k + 1), ()

        def merged(carry, _):
            p, mu, nu, psq, k = carry
            ids_k = jnp.roll(ids, k)
            ct_k = jnp.roll(ct, k, axis=0)
            sids, ctsT = sort_pairs(ids_k, ct_k)
            ssq = sorted_segment_sumsq(sids, ctsT)
            # <g, p> stand-in (the trainer reduces ct * gathered_rows,
            # a 2x29MB elementwise pass — negligible either way)
            gn = jnp.sqrt(ssq + 2.0 * wd * jnp.sum(ct_k) + wd * wd * psq)
            p, mu, nu, psq = sparse_table_adam_packed(
                p, mu, nu, sids, ctsT, lr, wd, gn, clip, step, PACK
            )
            return (p, mu, nu, psq, k + 1), ()

        time_update(two_pass, "two-pass densify+sumsq+adam")
        time_update(merged, "merged sparse adam")


if __name__ == "__main__":
    main()
