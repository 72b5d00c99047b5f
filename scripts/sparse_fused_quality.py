"""Fused sparse backward-optimizer convergence evidence, per family.

For every model family x seed, trains the full reference protocol twice
on identical data — ``training.fused_backward=true`` (merged backward-
optimizer kernel) vs ``false`` (two-pass control) — and records both
metric sets plus their max absolute difference. The two paths are
bit-identical at the step level (tests/test_sparse_fused.py); this
artifact closes the loop at the convergence level for deepfm, xdeepfm
AND attention_deepfm (VERDICT r3 #7 — round 3 shipped one deepfm seed).

Runs on the CPU backend with packed tables (the fused path's layout);
``DEEPFM_TPU_FORCE_FUSED_ADAM=1`` lifts the TPU-backend gate the same
way the sparse-fused test suite does. The pallas CIN/attention kernels
are disabled for speed (interpret mode is slow on one host core) — they
are orthogonal to the table-backward path under test.

    python scripts/sparse_fused_quality.py --data-dir /tmp/mlsynth_full \
        --seeds 42 43 44 --out outputs/sparse_fused_quality
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("DEEPFM_TPU_FORCE_FUSED_ADAM", "1")

import jax

jax.config.update("jax_platforms", "cpu")

CFG = {
    "deepfm": "configs/deepfm_movielens.yaml",
    "xdeepfm": "configs/xdeepfm_movielens.yaml",
    "attention_deepfm": "configs/attention_deepfm_movielens.yaml",
}


def run_one(model_name: str, data_dir: str, seed: int, fused: bool,
            out_dir: str, num_neg_eval: int) -> dict:
    from deepfm_tpu.config import load_config
    from deepfm_tpu.data.movielens import MovieLensAdapter
    from deepfm_tpu.data.packing import pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer
    from deepfm_tpu.utils import seed_everything

    config = load_config(
        CFG[model_name],
        [
            f"data.data_dir={data_dir}",
            f"data.num_neg_eval={num_neg_eval}",
            f"seed={seed}",
            f"output_dir={out_dir}",
            f"model_name={model_name}",
            f"training.fused_backward={'true' if fused else 'false'}",
            "pallas.table_layout=packed",
            "pallas.use_cin_kernel=false",
            "pallas.use_attention_kernel=false",
        ],
    )
    seed_everything(config.seed)
    adapter = MovieLensAdapter(config.data, seed=config.seed)
    packed_schema_ds = adapter.build()
    schema, train_ds, val_ds, test_ds = packed_schema_ds
    packed = pack_schema(schema)
    model = create_model(config.model_name, packed, config)
    trainer = Trainer(
        model, packed, config,
        train_ds.pack(packed), val_ds.pack(packed), test_ds.pack(packed),
        adapter=adapter,
    )
    trainer.train()
    trainer.load_best()
    metrics = {k: float(v) for k, v in trainer.evaluate(
        test_ds.pack(packed), "test"
    ).items()}
    results_file = Path(out_dir) / "results.json"
    if results_file.exists():
        info = json.loads(results_file.read_text()).get("training_info", {})
        metrics["_backward"] = info.get("backward", "?")
    return metrics


# metrics where an absolute diff is meaningful as-is (all in [0, 1]);
# pcoc is an unbounded ratio (~27 under the sampled-negatives protocol,
# see docs/SERVING.md "Calibration") and would dominate a naive max
RANKING_METRICS = (
    "auc", "logloss", "HR@1", "HR@5", "HR@10", "HR@20",
    "NDCG@1", "NDCG@5", "NDCG@10", "NDCG@20",
)


def _pair_row(seed: int, pair: dict) -> dict:
    diffs = {
        k: abs(pair["fused"][k] - pair["two_pass"][k])
        for k in pair["fused"]
        if not k.startswith("_") and k in pair["two_pass"]
    }
    rank_diff = max(
        (v for k, v in diffs.items() if k in RANKING_METRICS), default=0.0
    )
    return {
        "seed": seed,
        "fused": pair["fused"],
        "two_pass": pair["two_pass"],
        "max_abs_ranking_metric_diff": rank_diff,
        "max_abs_metric_diff": max(diffs.values()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--models", nargs="*", default=list(CFG))
    ap.add_argument("--seeds", nargs="*", type=int, default=[42, 43, 44])
    ap.add_argument("--num-neg-eval", type=int, default=199)
    ap.add_argument("--out", default="outputs/sparse_fused_quality")
    ap.add_argument("--summarize-only", action="store_true",
                    help="rebuild summary.json from existing /tmp/sfq_* "
                    "run dirs without retraining")
    args = ap.parse_args()

    summary: dict = {"seeds": args.seeds, "models": {}}
    worst_rank = 0.0
    for model in args.models:
        rows = []
        for seed in args.seeds:
            pair = {}
            for fused in (True, False):
                tag = "fused" if fused else "two_pass"
                out_dir = f"/tmp/sfq_{model}_s{seed}_{tag}"
                if args.summarize_only:
                    r = json.loads(
                        (Path(out_dir) / "results.json").read_text()
                    )
                    m = {k: float(v)
                         for k, v in r["test_metrics"].items()}
                    m["_backward"] = r.get("training_info", {}).get(
                        "backward", "?"
                    )
                    pair[tag] = m
                else:
                    pair[tag] = run_one(
                        model, args.data_dir, seed, fused, out_dir,
                        args.num_neg_eval,
                    )
            row = _pair_row(seed, pair)
            worst_rank = max(worst_rank, row["max_abs_ranking_metric_diff"])
            rows.append(row)
            print(
                f"{model} seed={seed}: fused auc={pair['fused']['auc']:.6f}"
                f" two_pass auc={pair['two_pass']['auc']:.6f}"
                f" max|rank diff|={row['max_abs_ranking_metric_diff']:.2e}",
                flush=True,
            )
        summary["models"][model] = rows

    summary["worst_max_abs_ranking_metric_diff"] = worst_rank
    out_path = Path(args.out)
    out_path.mkdir(parents=True, exist_ok=True)
    (out_path / "summary.json").write_text(json.dumps(summary, indent=2))
    print(f"\nworst |fused - two_pass| over ranking metrics: "
          f"{worst_rank:.3e}")
    print(f"summary written to {out_path / 'summary.json'}")


if __name__ == "__main__":
    main()
