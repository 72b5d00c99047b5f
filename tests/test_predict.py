"""Batch scoring (serving) path: adapter.score_interactions +
Trainer.predict + the `predict` CLI command.

Serving is out of the reference's scope (reference prd.md:23-27); this
path reuses the fitted training pipeline and the compiled eval scan, so
the tests pin (a) transform parity with the training-time assembly,
(b) unknown-id dropping, and (c) the CLI round trip on synthetic data.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.synthetic import generate_movielens_like  # noqa: E402


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlsynth")
    generate_movielens_like(
        d, num_users=60, num_items=80, num_rows=3000, seed=7
    )
    return d


@pytest.fixture(scope="module")
def built_adapter(synth_dir):
    from deepfm_tpu.data.movielens import MovieLensAdapter

    cfg = config_from_dict(
        {
            "data": {
                "data_dir": str(synth_dir),
                "num_neg_train": 1,
                "num_neg_eval": 5,
            },
            "output_dir": "/tmp/predict_test",
        }
    )
    adapter = MovieLensAdapter(cfg.data, seed=42)
    schema, train, val, test = adapter.build()
    return adapter, schema


class TestScoreInteractions:
    def test_matches_training_transform_on_udata(
        self, built_adapter, synth_dir
    ):
        """Scoring the dataset's own u.data reproduces the pipeline's
        per-interaction features (the positives' assembly path)."""
        adapter, schema = built_adapter
        ds, kept, total = adapter.score_interactions(synth_dir / "u.data")
        assert total == len(kept)  # every id has metadata here
        # labels follow the threshold rule on the rating column
        raw = np.loadtxt(synth_dir / "u.data", dtype=np.int64).reshape(-1, 4)
        want = (
            raw[:, 2].astype(np.float64)
            >= adapter.config.label_threshold
        ).astype(np.float32)
        np.testing.assert_array_equal(ds.labels, want)
        # features carry the fitted encoders' codes: spot-check that the
        # user_id column equals the encoder table indexed by the raw id
        uidx = np.asarray(
            [adapter._uid_pos[int(u)] for u in raw[:, 0]], np.int64
        )
        np.testing.assert_array_equal(
            ds.features["user_id"],
            adapter._user_enc["user_id"][uidx],
        )
        # engineered time features: recompute one row by hand
        ts = raw[0, 3]
        hour = (ts % 86400) // 3600
        assert ds.features["hour_sin"][0] == pytest.approx(
            np.sin(2 * np.pi * hour / 24), abs=1e-6
        )

    def test_unknown_ids_dropped(self, built_adapter, tmp_path):
        adapter, schema = built_adapter
        rows = [
            "1\t1\t5\t880000000",
            "999999\t1\t4\t880000000",  # unknown user
            "1\t999999\t3\t880000000",  # unknown item
            "2\t2\t1\t880000500",
        ]
        p = tmp_path / "traffic.tsv"
        p.write_text("\n".join(rows) + "\n")
        ds, kept, total = adapter.score_interactions(p)
        assert total == 4
        assert list(kept) == [0, 3]
        assert len(ds) == 2

    def test_requires_build(self, synth_dir):
        from deepfm_tpu.data.movielens import MovieLensAdapter

        cfg = config_from_dict(
            {
                "data": {"data_dir": str(synth_dir)},
                "output_dir": "/tmp/predict_test2",
            }
        )
        adapter = MovieLensAdapter(cfg.data, seed=0)
        with pytest.raises(RuntimeError, match="build"):
            adapter.score_interactions(synth_dir / "u.data")


class TestPredictCLI:
    @pytest.mark.slow
    def test_train_then_predict_roundtrip(self, synth_dir, tmp_path):
        """Full CLI round trip: train 1 epoch, batch-score u.data,
        output has one (user, item, score in [0,1]) line per row."""
        from deepfm_tpu.cli import main

        out_dir = tmp_path / "run"
        overrides = [
            f"data.data_dir={synth_dir}",
            "data.num_neg_train=1",
            "data.num_neg_eval=5",
            "training.num_epochs=1",
            "training.batch_size=512",
            "dnn.hidden_units=[16,8]",
            f"output_dir={out_dir}",
        ]
        main(
            ["train", "--config", "configs/deepfm_movielens.yaml",
             "--override", *overrides]
        )
        scores_path = tmp_path / "scores.tsv"
        main(
            ["predict", "--config", "configs/deepfm_movielens.yaml",
             "--input", str(synth_dir / "u.data"),
             "--output", str(scores_path),
             "--override", *overrides]
        )
        lines = scores_path.read_text().splitlines()
        raw = np.loadtxt(synth_dir / "u.data", dtype=np.int64).reshape(-1, 4)
        assert len(lines) == len(raw)
        u, m, s = lines[0].split("\t")
        assert int(u) == raw[0, 0] and int(m) == raw[0, 1]
        vals = np.asarray([float(ln.split("\t")[2]) for ln in lines])
        assert np.all((vals >= 0.0) & (vals <= 1.0))
        assert np.std(vals) > 0  # not a constant output


class TestRecommendCandidates:
    def test_feature_parity_with_score_interactions(
        self, built_adapter, tmp_path
    ):
        """Candidates for (user x all items) carry exactly the features
        score_interactions derives for the same (user, item, ts) rows."""
        adapter, schema = built_adapter
        uid = int(adapter._uid_raw[0])
        ts = 880_000_000
        ds, items = adapter.recommend_candidates(
            uid, exclude_seen=False, timestamp=ts
        )
        assert len(ds) == len(items) == adapter._n_items

        raw = np.stack(
            [
                np.full(len(items), uid, np.int64),
                items,
                np.zeros(len(items), np.int64),
                np.full(len(items), ts, np.int64),
            ],
            axis=1,
        )
        path = tmp_path / "cand.data"
        np.savetxt(path, raw, fmt="%d", delimiter="\t")
        ds2, kept, total = adapter.score_interactions(path)
        assert total == len(kept)
        for name in ds.features:
            np.testing.assert_array_equal(
                ds.features[name], ds2.features[name], err_msg=name
            )

    def test_exclude_seen_drops_interacted_items(self, built_adapter):
        adapter, schema = built_adapter
        uid = int(adapter._uid_raw[0])
        upos = adapter._uid_pos[uid]
        ds, items = adapter.recommend_candidates(uid)  # exclude_seen
        assert len(items) == adapter._n_items - adapter._seen[upos].sum()
        seen_raw = set(adapter._mid_raw[adapter._seen[upos]].tolist())
        assert not (set(items.tolist()) & seen_raw)

    def test_unknown_user_raises(self, built_adapter):
        adapter, schema = built_adapter
        with pytest.raises(ValueError, match="Unknown user"):
            adapter.recommend_candidates(10_000_000)
