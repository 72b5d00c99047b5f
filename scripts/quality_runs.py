"""Seed-averaged quality protocol: N seeds x M models, mean +/- std.

The reference's eval sets are tiny (tens of users), so single-run metrics
swing by up to ~0.05 AUC between identical configs (SURVEY.md §6). This
harness makes quality claims honest: it trains every model to early stop
under the full reference protocol for several seeds and reports
mean +/- std per metric, plus a machine-readable summary JSON.

    python scripts/quality_runs.py --data-dir /tmp/mlsynth --seeds 42 43 44
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_one(model_name: str, data_dir: str, seed: int, out_dir: str,
            num_neg_eval: int) -> dict:
    from deepfm_tpu.config import load_config
    from deepfm_tpu.data.movielens import MovieLensAdapter
    from deepfm_tpu.data.packing import pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer
    from deepfm_tpu.utils import seed_everything

    cfg_file = {
        "deepfm": "configs/deepfm_movielens.yaml",
        "xdeepfm": "configs/xdeepfm_movielens.yaml",
        "attention_deepfm": "configs/attention_deepfm_movielens.yaml",
        # ablation baselines ride the deepfm config (shared embedding/
        # training hyperparameters; the registry name picks the heads)
        "lr": "configs/deepfm_movielens.yaml",
        "fm": "configs/deepfm_movielens.yaml",
        "dnn": "configs/deepfm_movielens.yaml",
    }[model_name]
    config = load_config(
        cfg_file,
        [
            f"data.data_dir={data_dir}",
            f"data.num_neg_eval={num_neg_eval}",
            f"seed={seed}",
            f"output_dir={out_dir}",
            f"model_name={model_name}",
        ],
    )
    seed_everything(config.seed)
    adapter = MovieLensAdapter(config.data, seed=config.seed)
    schema, train_ds, val_ds, test_ds = adapter.build()
    packed = pack_schema(schema)
    model = create_model(config.model_name, packed, config)
    trainer = Trainer(
        model, packed, config,
        train_ds.pack(packed), val_ds.pack(packed), test_ds.pack(packed),
        adapter=adapter,
    )
    trainer.train()
    trainer.load_best()
    return {k: float(v) for k, v in trainer.evaluate(
        test_ds.pack(packed), "test"
    ).items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--models", nargs="*",
                    default=["deepfm", "xdeepfm", "attention_deepfm"])
    ap.add_argument("--seeds", nargs="*", type=int, default=[42, 43, 44])
    ap.add_argument("--num-neg-eval", type=int, default=199)
    ap.add_argument("--out", default="outputs/quality_runs")
    ap.add_argument(
        "--platform", default="auto", choices=["auto", "cpu"],
        help="cpu forces the host backend (the axon TPU plugin ignores "
        "JAX_PLATFORMS, so this must go through jax.config before init)",
    )
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    summary: dict = {}
    for model in args.models:
        per_seed = []
        for seed in args.seeds:
            out_dir = f"{args.out}/{model}_s{seed}"
            m = run_one(model, args.data_dir, seed, out_dir, args.num_neg_eval)
            per_seed.append(m)
            print(f"{model} seed={seed}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())
                             if k in ("auc", "logloss", "HR@10", "NDCG@10")),
                  flush=True)
        keys = sorted(per_seed[0])
        summary[model] = {
            k: {
                "mean": float(np.mean([m[k] for m in per_seed])),
                "std": float(np.std([m[k] for m in per_seed])),
            }
            for k in keys
        }

    out_path = Path(args.out) / "summary.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(
        {"seeds": args.seeds, "models": summary}, indent=2
    ))

    print("\nmodel              metric     mean +/- std")
    for model, stats in summary.items():
        for k in ("auc", "logloss", "HR@10", "NDCG@10"):
            if k in stats:
                s = stats[k]
                print(f"{model:18s} {k:9s} {s['mean']:.4f} +/- {s['std']:.4f}")
    print(f"\nsummary written to {out_path}")


if __name__ == "__main__":
    main()
