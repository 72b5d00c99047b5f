"""Quality A/B of the int8-quantized serving export vs f32, full protocol.

Trains DeepFM to early stop on the committed synthetic ML-100K instance
(the same protocol as scripts/quality_runs.py), exports BOTH serving
artifacts, scores the test split through the DESERIALIZED artifacts
(batched through the symbolic batch dim), and reports every test metric
(AUC/LogLoss/HR@K/NDCG@K via the same grouped ranking rules the trainer
uses) for f32 vs int8, plus artifact sizes.

    python scripts/quantized_export_quality.py --data-dir data/mlsynth_ab
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def score_with_artifact(path: Path, arrays, chunk: int = 65536) -> np.ndarray:
    from deepfm_tpu.utils.export import load_scoring

    score = load_scoring(path)
    parts = []
    for start in range(0, len(arrays), chunk):
        sl = slice(start, start + chunk)
        parts.append(score(arrays.ids[sl], arrays.dense[sl]))
    return np.concatenate(parts)


def full_metrics(arrays, scores, ks=(1, 5, 10, 20)) -> dict:
    from deepfm_tpu.training.metrics import (
        compute_auc,
        compute_calibration,
        compute_logloss,
        grouped_ranking_metrics,
    )

    out = {
        "auc": compute_auc(arrays.labels, scores),
        "logloss": compute_logloss(arrays.labels, scores),
        **compute_calibration(arrays.labels, scores),
    }
    if arrays.user_ids is not None:
        out.update(
            grouped_ranking_metrics(
                arrays.user_ids, scores, arrays.labels, list(ks)
            )
        )
    return {k: float(v) for k, v in out.items()}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="data/mlsynth_ab")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="outputs/quantized_export_quality")
    args = p.parse_args()

    from deepfm_tpu.config import load_config
    from deepfm_tpu.data.movielens import MovieLensAdapter
    from deepfm_tpu.data.packing import pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer
    from deepfm_tpu.utils import seed_everything
    from deepfm_tpu.utils.export import (
        export_scoring,
        quantized_scoring_model,
        save_scoring,
        serving_config,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    config = load_config(
        "configs/deepfm_movielens.yaml",
        [
            f"data.data_dir={args.data_dir}",
            f"seed={args.seed}",
            f"output_dir={out_dir / 'train_run'}",
        ],
    )
    scfg = serving_config(config)  # logical tables end to end on CPU
    seed_everything(scfg.seed)
    adapter = MovieLensAdapter(scfg.data, seed=scfg.seed)
    schema, train_ds, val_ds, test_ds = adapter.build()
    packed = pack_schema(schema)
    model = create_model(scfg.model_name, packed, scfg)
    test_d = test_ds.pack(packed)
    trainer = Trainer(
        model, packed, scfg,
        train_ds.pack(packed), val_ds.pack(packed), test_d,
        adapter=adapter,
    )
    trainer.train()
    trainer.load_best()

    params = trainer.state.params
    bstats = trainer.state.batch_stats
    f32_path = out_dir / "deepfm_f32.stablehlo"
    int8_path = out_dir / "deepfm_int8.stablehlo"
    n_f32 = save_scoring(
        f32_path,
        export_scoring(
            model, params, bstats, packed.num_slots, packed.num_dense
        ),
    )
    qmodel = quantized_scoring_model(config, packed, params)
    n_int8 = save_scoring(
        int8_path,
        export_scoring(
            qmodel, params, bstats, packed.num_slots, packed.num_dense
        ),
    )

    f32_scores = score_with_artifact(f32_path, test_d)
    int8_scores = score_with_artifact(int8_path, test_d)
    m_f32 = full_metrics(test_d, f32_scores)
    m_int8 = full_metrics(test_d, int8_scores)

    table_bytes = sum(
        int(np.asarray(p).nbytes)
        for name, p in params["embedding"].items()
        if name.startswith("table_w")
    )
    total_bytes = sum(
        int(np.asarray(p).nbytes)
        for p in jax.tree_util.tree_leaves(params)
    )
    results = {
        "protocol": "synthetic ML-100K, reference temporal split, "
        "999 popularity-weighted eval negatives, full train to early stop",
        "seed": args.seed,
        "test_rows": int(len(test_d)),
        "artifact_bytes": {"f32": n_f32, "int8": n_int8,
                           "ratio": round(n_f32 / n_int8, 2)},
        "param_bytes": {"tables": table_bytes, "total": total_bytes},
        "size_note": "the int8 ratio tracks the TABLE share of the "
        "artifact — tiny-vocab ML-100K is DNN-dominated, so the full "
        "3.2x table cut moves the total only modestly; at production "
        "vocab the tables ARE the artifact (tests/test_export.py "
        "asserts <0.55x total at 9k rows, and the share grows with V)",
        "calibration_note": "PCOC >> 1 is a property of the EVAL "
        "distribution (1 positive per 1000 sampled candidates, ~0.1% "
        "positive rate, vs 1:4 at training) — it measures the protocol, "
        "not miscalibration on the training distribution; the A/B "
        "signal is that int8 matches f32 on it to 3 decimals",
        "max_abs_prob_delta": float(
            np.abs(f32_scores - int8_scores).max()
        ),
        "test_metrics_f32": m_f32,
        "test_metrics_int8": m_int8,
        "deltas": {
            k: round(m_int8[k] - m_f32[k], 6)
            for k in m_f32 if k in m_int8
        },
    }
    (out_dir / "results.json").write_text(json.dumps(results, indent=1))
    # keep only the summary in git (artifacts are large); the run dir
    # holds the checkpoints for reproduction
    f32_path.unlink()
    int8_path.unlink()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
