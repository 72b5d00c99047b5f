"""Hardware A/B: f32 vs bf16 Adam-moment storage, per model family.

VERDICT r4 #2: the bf16-moments quality evidence is committed
(outputs/moments_dtype_ab/, 3 seeds, AUC deltas <= 2e-4) but the
throughput side was never measured on hardware — and the fused Adam
pass is the largest line in the step roofline (moments are ~57% of its
bytes). Runs bench.py's exact train-step harness (epoch-scan dispatch,
Criteo-scale workload) twice per model — training.moments_dtype
float32 vs bfloat16 — so the default flip (or the reason not to) is a
measurement. Engagement telemetry recorded per run.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_moments_ab.py \
           [--models deepfm xdeepfm attention_deepfm] \
           [--json outputs/moments_step_ab/results.json]
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
    ap.add_argument("--json", default="outputs/moments_step_ab/results.json")
    args = ap.parse_args()

    import bench

    out: dict = {}
    for model in args.models:
        row = {}
        for dtype in ("float32", "bfloat16"):
            ex_s, engagement = bench.bench_tpu(model, moments_dtype=dtype)
            row[dtype] = {
                "examples_per_sec": ex_s,
                "backward": engagement.get("backward"),
                "kernels": engagement.get("kernels"),
            }
            print(f"{model:18s} moments={dtype:8s} {ex_s:12,.0f} ex/s  "
                  f"backward={engagement.get('backward')}", flush=True)
        row["speedup"] = (
            row["bfloat16"]["examples_per_sec"]
            / row["float32"]["examples_per_sec"]
        )
        print(f"{model:18s} bf16/f32 moments = {row['speedup']:.3f}x",
              flush=True)
        out[model] = row

    p = Path(args.json)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out, indent=2))
    print(f"written to {p}", flush=True)


if __name__ == "__main__":
    main()
