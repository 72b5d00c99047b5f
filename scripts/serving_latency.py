"""Serving latency through the exported StableHLO artifact: p50/p99.

VERDICT r3 #9's missing piece: docs/SERVING.md describes the export
path but publishes no latency numbers. This tool trains (or reuses) a
checkpoint, exports the StableHLO artifact exactly as the `export`
command does, deserializes it the way a CONSUMER would (jax.export
only), and measures per-request wall latency — including host->device
transfer and the host readback, i.e. what an online scorer pays — at
several batch sizes.

Each timed call is one full round trip (`.call(ids, dense)` then
`np.asarray(probs)`): online scoring cannot chain requests on-device,
so unlike the throughput microbenches this intentionally measures the
dispatch+relay overhead too.

Usage:
    PYTHONPATH=/root/.axon_site:. python scripts/serving_latency.py \
        --data-dir /tmp/mlsynth --out-dir /tmp/out_deepfm_v \
        --batches 1 32 256 --reps 200 \
        --json outputs/serving_latency/results.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "--cpu" in sys.argv:  # must precede backend init; axon ignores env
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", required=True,
                    help="trained experiment dir (train first if absent)")
    ap.add_argument("--config", default="configs/deepfm_movielens.yaml")
    ap.add_argument("--batches", nargs="*", type=int, default=[1, 32, 256])
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--quantize", default="", choices=["", "int8"])
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled at import)")
    args = ap.parse_args()

    import jax

    from deepfm_tpu import cli

    artifact = Path(args.out_dir) / "serving_latency.stablehlo"
    argv = [
        "export",
        "--config", args.config,
        "--override", f"data.data_dir={args.data_dir}",
        f"output_dir={args.out_dir}",
        "--output", str(artifact),
    ]
    if args.quantize:
        argv += ["--quantize", args.quantize]
    cli.main(argv)

    from jax import export as jexport

    scorer = jexport.deserialize(artifact.read_bytes())

    # shape template from the experiment's schema: the exported fn takes
    # (ids int32 (B, F), dense f32 (B, Fd))
    in_avals = scorer.in_avals
    f_ids = in_avals[0].shape[-1]
    f_dense = in_avals[1].shape[-1] if len(in_avals) > 1 else 0

    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    rows = {}
    for b in args.batches:
        ids = rng.integers(0, 2, size=(b, f_ids)).astype(np.int32)
        dense = rng.normal(size=(b, f_dense)).astype(np.float32)
        call = (lambda: scorer.call(ids, dense)) if f_dense else (
            lambda: scorer.call(ids)
        )
        for _ in range(args.warmup):
            np.asarray(call())
        lat = np.empty(args.reps)
        for i in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(call())
            lat[i] = (time.perf_counter() - t0) * 1e3
        rows[b] = {
            "p50_ms": float(np.percentile(lat, 50)),
            "p90_ms": float(np.percentile(lat, 90)),
            "p99_ms": float(np.percentile(lat, 99)),
            "mean_ms": float(lat.mean()),
            "rows_per_sec_p50": b / float(np.percentile(lat, 50)) * 1e3,
        }
        print(f"batch {b:5d}: p50 {rows[b]['p50_ms']:7.2f} ms  "
              f"p90 {rows[b]['p90_ms']:7.2f}  p99 {rows[b]['p99_ms']:7.2f}"
              f"  ({rows[b]['rows_per_sec_p50']:,.0f} rows/s at p50)",
              flush=True)

    result = {
        "backend": backend,
        "reps": args.reps,
        "quantize": args.quantize or "none",
        "batches": rows,
    }
    if args.json:
        p = Path(args.json)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(result, indent=2))
        print(f"written to {p}", flush=True)


if __name__ == "__main__":
    main()
