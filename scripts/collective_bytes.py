"""Measure collective traffic of the sharded embedding strategies.

Wall-clock on the virtual CPU mesh is noise; what IS meaningful there is
the compiled program's collective inventory — which collectives run and
how many bytes each moves. This script lowers/compiles each lookup
strategy (logical + packed layouts) on an 8-virtual-device mesh, parses
the optimized HLO for collective ops, and prints per-strategy byte
totals for the main (non-fallback) path. The a2a overflow fallback sits
under an HLO conditional (see parallel/embedding_shard.py) and is
reported separately.

Usage: python scripts/collective_bytes.py [--n 4096] [--d 16] [--v 131072]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deepfm_tpu.utils.hlo import collective_inventory  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096, help="flat ids per batch")
    ap.add_argument("--d", type=int, default=16, help="embedding width")
    ap.add_argument("--v", type=int, default=131072, help="table rows")
    args = ap.parse_args()

    from deepfm_tpu.parallel import (
        build_mesh,
        make_a2a_lookup,
        make_a2a_lookup_packed,
        make_psum_lookup,
        make_psum_lookup_packed,
    )
    from deepfm_tpu.utils.layout import pack_table

    dcol = args.d + 1
    pack = 128 // dcol
    phys = -(-(-(-args.v // pack)) // 128) * 128

    rng = np.random.default_rng(0)
    logical = jnp.asarray(
        rng.normal(size=(args.v, dcol)).astype(np.float32)
    )
    packed = jnp.asarray(
        pack_table(np.asarray(logical), dcol, pack, phys)
    )
    ids = jnp.asarray(rng.integers(0, args.v, args.n).astype(np.int32))

    print(
        f"workload: n={args.n} ids, dcol={dcol}, V={args.v} "
        f"(packed: {phys}x128, pack={pack})\n"
    )
    for mesh_shape in [(4, 2), (2, 4), (1, 8)]:
        mesh = build_mesh(*mesh_shape)
        cases = {
            "psum/logical": (make_psum_lookup(mesh), logical),
            "a2a/logical": (make_a2a_lookup(mesh), logical),
            "psum/packed": (
                make_psum_lookup_packed(mesh, dcol, pack), packed,
            ),
            "a2a/packed": (
                make_a2a_lookup_packed(mesh, dcol, pack), packed,
            ),
        }
        print(f"mesh data={mesh_shape[0]} model={mesh_shape[1]}")
        for name, (fn, table) in cases.items():
            hlo = jax.jit(fn).lower(table, ids).compile().as_text()
            inv = collective_inventory(hlo)
            main_b = sum(b for _, b in inv["main"].values())
            cond_b = sum(b for _, b in inv["conditional"].values())
            detail = ", ".join(
                f"{op} x{c} {b/1024:.0f}KiB"
                for op, (c, b) in sorted(inv["main"].items())
            )
            line = (
                f"  {name:<14} main={main_b/1024:8.0f} KiB"
                f"  fallback(cond)={cond_b/1024:6.0f} KiB   [{detail}]"
            )
            print(line)
        print()


if __name__ == "__main__":
    main()
