"""Hardware A/B: fused sparse backward-optimizer vs two-pass, per family.

VERDICT r3 #2: the fused default must be justified by a measurement.
Runs bench.py's exact train-step harness (epoch-scan dispatch, Criteo-
scale workload) twice per model — training.fused_backward on/off — and
writes the table RESULTS.md needs. Engagement telemetry is recorded so
a silently-gated run can't masquerade as an A/B.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_fused_ab.py \
           [--models deepfm xdeepfm attention_deepfm] \
           [--json outputs/fused_step_ab/results.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*",
                    default=["deepfm", "xdeepfm", "attention_deepfm"])
    ap.add_argument("--json", default="outputs/fused_step_ab/results.json")
    args = ap.parse_args()

    import bench

    out: dict = {}
    for model in args.models:
        row = {}
        for fused in (True, False):
            tag = "fused" if fused else "two_pass"
            ex_s, engagement = bench.bench_tpu(model, fused_backward=fused)
            row[tag] = {
                "examples_per_sec": ex_s,
                "backward": engagement.get("backward"),
                "kernels": engagement.get("kernels"),
            }
            print(f"{model:18s} {tag:9s} {ex_s:12,.0f} ex/s  "
                  f"backward={engagement.get('backward')}", flush=True)
        row["speedup"] = (
            row["fused"]["examples_per_sec"]
            / row["two_pass"]["examples_per_sec"]
        )
        print(f"{model:18s} fused/two_pass = {row['speedup']:.3f}x",
              flush=True)
        out[model] = row

    p = Path(args.json)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out, indent=2))
    print(f"written to {p}", flush=True)


if __name__ == "__main__":
    main()
