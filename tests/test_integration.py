"""Slow integration test: full pipeline on generated ML-100K-format data
(reference test strategy: tests/test_integration.py — train 2 epochs,
assert AUC beats chance and checkpoint exists)."""

import numpy as np
import pytest

from deepfm_tpu.config import config_from_dict
from deepfm_tpu.data.packing import pack_schema
from deepfm_tpu.data.synthetic import generate_movielens_like
from deepfm_tpu.models import create_model
from deepfm_tpu.training.trainer import Trainer


@pytest.mark.slow
def test_full_pipeline_deepfm(tmp_path):
    data_dir = tmp_path / "ml"
    generate_movielens_like(
        data_dir, num_users=200, num_items=250, num_rows=12000, seed=0
    )
    cfg = config_from_dict(
        {
            "output_dir": str(tmp_path / "out"),
            "data": {
                "data_dir": str(data_dir),
                "num_neg_train": 4,
                "num_neg_eval": 99,
                "use_native_sampler": True,
            },
            "dnn": {"hidden_units": [64, 32], "dropout": 0.1},
            # 5 epochs: at 3 the AUC sits right at the 0.5 assert line and
            # flips with the init draw (verified by a param-transplant A/B:
            # model math is bit-identical across the fused-fo refactor;
            # only the rng draw layout changed). By epoch 5 the margin is
            # comfortable (~0.56) across seeds.
            "training": {
                "batch_size": 4096,
                "num_epochs": 5,
                "scheduler": "reduce_on_plateau",
            },
        }
    )
    from deepfm_tpu.data.movielens import MovieLensAdapter

    adapter = MovieLensAdapter(cfg.data, seed=cfg.seed)
    schema, train_ds, val_ds, test_ds = adapter.build()
    packed = pack_schema(schema)
    model = create_model("deepfm", packed, cfg)
    trainer = Trainer(
        model,
        packed,
        cfg,
        train_ds.pack(packed),
        val_ds.pack(packed),
        test_ds.pack(packed),
        adapter=adapter,
    )
    best = trainer.train()
    assert best["auc"] > 0.5
    assert (tmp_path / "out" / "best_model").exists()
    assert (tmp_path / "out" / "results.json").exists()
    import json

    results = json.loads((tmp_path / "out" / "results.json").read_text())
    assert "test_metrics" in results and "val_metrics" in results
    assert results["training_info"]["best_epoch"] >= 1
    assert np.isfinite(results["test_metrics"]["auc"])
