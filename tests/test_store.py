"""On-disk packed datasets (data/store.py): schema/array round-trips,
bounded-memory synthetic generation, and out-of-core training via the
"packed" dataset registry entry.

The contract under test: a directory of .npy files + schema.json is a
complete dataset — memory-mapped on load, streamed chunk-by-chunk by
the trainer's epoch plan, model rebuilt purely from the stored schema.
Beyond the reference's scope (its data layer is all-in-memory pandas,
reference deepfm/data/dataset.py:28-38).
"""

import dataclasses
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from conftest import make_synth_schema  # noqa: E402

from deepfm_tpu.config import DataConfig, config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import PackedArrays, pack_schema  # noqa: E402
from deepfm_tpu.data.store import (  # noqa: E402
    PackedDirAdapter,
    load_packed,
    load_schema,
    save_packed,
    save_schema,
    write_synthetic_packed,
)


def _small_dcfg(rows=3000, fields=4, vocab=500):
    return dataclasses.replace(
        DataConfig(),
        dataset_name="criteo_synthetic",
        synthetic_num_rows=rows,
        synthetic_num_fields=fields,
        synthetic_vocab_size=vocab,
    )


class TestSchemaRoundtrip:
    def test_all_field_kinds(self, tmp_path):
        schema = make_synth_schema()  # sparse + sequence + dense
        save_schema(schema, tmp_path / "schema.json")
        back = load_schema(tmp_path / "schema.json")
        assert back == schema  # frozen dataclasses: deep equality
        assert back.fields["tags"].max_length == 4
        assert back.fields["tags"].combiner == "mean"


class TestPackedRoundtrip:
    def test_save_load_mmap(self, tmp_path):
        rng = np.random.default_rng(0)
        arrays = PackedArrays(
            ids=rng.integers(0, 50, (100, 6)).astype(np.int32),
            dense=rng.normal(size=(100, 2)).astype(np.float32),
            labels=rng.integers(0, 2, 100).astype(np.float32),
            weights=np.ones(100, np.float32),
            user_ids=rng.integers(1, 20, 100).astype(np.int64),
        )
        save_packed(arrays, tmp_path / "train")
        back = load_packed(tmp_path / "train", mmap=True)
        assert isinstance(back.ids, np.memmap)  # rows stay on disk
        np.testing.assert_array_equal(back.ids, arrays.ids)
        np.testing.assert_array_equal(back.dense, arrays.dense)
        np.testing.assert_array_equal(back.labels, arrays.labels)
        np.testing.assert_array_equal(back.user_ids, arrays.user_ids)
        # fancy indexing a memmap materializes ONLY the selected rows
        sel = back.ids[[5, 50, 99]]
        assert not isinstance(sel, np.memmap)
        np.testing.assert_array_equal(sel, arrays.ids[[5, 50, 99]])

    def test_user_ids_optional(self, tmp_path):
        arrays = PackedArrays(
            ids=np.zeros((10, 3), np.int32),
            dense=np.zeros((10, 1), np.float32),
            labels=np.zeros(10, np.float32),
            weights=np.ones(10, np.float32),
        )
        save_packed(arrays, tmp_path / "s")
        assert load_packed(tmp_path / "s").user_ids is None

    def test_missing_schema_raises(self, tmp_path):
        cfg = dataclasses.replace(
            DataConfig(), dataset_name="packed", data_dir=str(tmp_path)
        )
        with pytest.raises(FileNotFoundError, match="synth-packed"):
            PackedDirAdapter(cfg)


class TestSyntheticPackedWriter:
    def test_chunked_generation(self, tmp_path):
        dcfg = _small_dcfg(rows=2500)
        write_synthetic_packed(
            tmp_path / "ds", dcfg, seed=1, chunk_rows=1000  # 3 chunks
        )
        schema = load_schema(tmp_path / "ds" / "schema.json")
        packed = pack_schema(schema)
        train = load_packed(tmp_path / "ds" / "train")
        val = load_packed(tmp_path / "ds" / "val")
        assert train.ids.shape == (2500, packed.num_slots)
        assert val.ids.shape == (250, packed.num_slots)
        # ids respect the vocab bound and reserve 0 for OOV
        assert train.ids.min() >= 0 and train.ids.max() < 500
        # planted signal: labels are a real mixture, not constant
        assert 0.1 < float(np.asarray(train.labels).mean()) < 0.9
        assert np.all(np.asarray(train.weights) == 1.0)


class TestPackDataCommand:
    def test_movielens_roundtrip_preserves_everything(self, tmp_path):
        """pack-data converts a fitted MovieLens pipeline to disk; the
        reloaded splits are bit-identical to the in-memory build
        (same seed -> same adapter state), including user_ids."""
        import yaml

        from deepfm_tpu.cli import _build_data, main
        from deepfm_tpu.data.synthetic import generate_movielens_like

        data_dir = tmp_path / "ml"
        generate_movielens_like(
            data_dir, num_users=50, num_items=60, num_rows=2000, seed=5
        )
        overrides = {
            "output_dir": str(tmp_path / "out"),
            "data": {
                "data_dir": str(data_dir),
                "num_neg_train": 1,
                "num_neg_eval": 5,
            },
        }
        cfg_path = tmp_path / "c.yaml"
        cfg_path.write_text(yaml.safe_dump(overrides))
        out = tmp_path / "packed"
        main(["pack-data", "--config", str(cfg_path), "--out", str(out)])

        cfg = config_from_dict(overrides)
        _, schema, packed, train_d, val_d, test_d = _build_data(cfg)
        for split, want in (("train", train_d), ("val", val_d),
                            ("test", test_d)):
            got = load_packed(out / split)
            np.testing.assert_array_equal(got.ids, want.ids)
            np.testing.assert_array_equal(got.labels, want.labels)
            assert got.user_ids is not None
            np.testing.assert_array_equal(got.user_ids, want.user_ids)
        assert load_schema(out / "schema.json") == schema


class TestOutOfCoreTraining:
    def test_trainer_runs_from_memmap(self, tmp_path):
        from deepfm_tpu.cli import _build_data
        from deepfm_tpu.models import create_model
        from deepfm_tpu.training.trainer import Trainer

        dcfg = _small_dcfg(rows=2000, fields=3, vocab=200)
        write_synthetic_packed(tmp_path / "ds", dcfg, seed=2)
        cfg = config_from_dict(
            {
                "output_dir": str(tmp_path / "out"),
                "data": {
                    "dataset_name": "packed",
                    "data_dir": str(tmp_path / "ds"),
                },
                "feature": {"fm_embed_dim": 8},
                "dnn": {"hidden_units": [16], "dropout": 0.0},
                "training": {
                    "batch_size": 256,
                    "num_epochs": 1,
                    # zero budget -> one batch per chunk: forces a
                    # MULTI-chunk epoch plan, the out-of-core streaming
                    # path (8 chunks here)
                    "stage_budget_mb": 0,
                },
            }
        )
        adapter, schema, packed, train_d, val_d, test_d = _build_data(cfg)
        assert isinstance(train_d.ids, np.memmap)
        model = create_model("deepfm", packed, cfg)
        trainer = Trainer(
            model, packed, cfg, train_d, val_d, test_d, adapter=None
        )
        best = trainer.train()
        assert np.isfinite(best["auc"]) and 0.0 <= best["auc"] <= 1.0
