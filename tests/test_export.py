"""Serving export (utils/export.py + the `export` CLI command).

The artifact contract under test: a single serialized StableHLO blob,
parameters baked in, symbolic batch dimension, loadable with nothing
but jax.export.deserialize — and numerically equal to the in-process
predict path. Serving/export is out of the reference's scope
(reference prd.md:23-27); it extends the batch-scoring path.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from conftest import make_synth_schema  # noqa: E402

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import pack_schema  # noqa: E402
from deepfm_tpu.models import create_model  # noqa: E402
from deepfm_tpu.utils.export import (  # noqa: E402
    export_scoring,
    load_scoring,
    save_scoring,
    serving_config,
)


def _init_model(model_name="deepfm"):
    import jax

    cfg = config_from_dict(
        {
            "feature": {"fm_embed_dim": 8},
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "cin": {"layer_sizes": [8, 8]},
            "attention": {"num_heads": 2, "attention_dim": 8},
            "training": {"batch_size": 16},
        }
    )
    scfg = serving_config(cfg)
    packed = pack_schema(make_synth_schema())
    model = create_model(model_name, packed, scfg)
    ids = np.zeros((16, packed.num_slots), np.int32)
    dense = np.zeros((16, packed.num_dense), np.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, dense, train=False)
    return model, variables, packed


def _reference_scores(model, variables, ids, dense):
    probs = model.apply(variables, ids, dense, method=model.predict)
    return np.asarray(probs)[:, 0]


class TestExportScoring:
    @pytest.mark.parametrize(
        "model_name", ["deepfm", "xdeepfm", "attention_deepfm"]
    )
    def test_roundtrip_matches_predict(self, model_name, tmp_path):
        model, variables, packed = _init_model(model_name)
        exported = export_scoring(
            model,
            variables["params"],
            variables.get("batch_stats", {}),
            packed.num_slots,
            packed.num_dense,
        )
        path = tmp_path / "model.stablehlo"
        n = save_scoring(path, exported)
        assert n == path.stat().st_size > 0

        score = load_scoring(path)
        rng = np.random.default_rng(0)
        # symbolic batch: the SAME artifact serves several batch sizes
        for b in (5, 32):
            ids = rng.integers(0, 3, (b, packed.num_slots)).astype(np.int32)
            dense = rng.normal(size=(b, packed.num_dense)).astype(np.float32)
            got = score(ids, dense)
            want = _reference_scores(model, variables, ids, dense)
            assert got.shape == (b,)
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_symbolic_batch_aval(self):
        model, variables, packed = _init_model()
        exported = export_scoring(
            model,
            variables["params"],
            variables.get("batch_stats", {}),
            packed.num_slots,
            packed.num_dense,
        )
        shapes = [str(a.shape) for a in exported.in_avals]
        assert shapes[0].startswith("(b,")  # symbolic leading dim
        assert "cpu" in exported.platforms

    def test_static_batch_pin(self, tmp_path):
        model, variables, packed = _init_model()
        exported = export_scoring(
            model,
            variables["params"],
            variables.get("batch_stats", {}),
            packed.num_slots,
            packed.num_dense,
            batch_size=8,
        )
        assert exported.in_avals[0].shape == (8, packed.num_slots)
        path = tmp_path / "static.stablehlo"
        save_scoring(path, exported)
        score = load_scoring(path)
        ids = np.zeros((8, packed.num_slots), np.int32)
        dense = np.zeros((8, packed.num_dense), np.float32)
        assert score(ids, dense).shape == (8,)
        with pytest.raises(ValueError):
            score(
                np.zeros((4, packed.num_slots), np.int32),
                np.zeros((4, packed.num_dense), np.float32),
            )

    def test_serving_config_strips_kernels_and_mesh(self):
        cfg = config_from_dict(
            {"pallas": {"table_layout": "packed", "use_cin_kernel": True}}
        )
        scfg = serving_config(cfg)
        assert scfg.pallas.table_layout == "logical"
        assert not scfg.pallas.use_cin_kernel
        assert not scfg.pallas.use_attention_kernel
        assert not scfg.pallas.use_grad_kernel
        assert scfg.mesh.data_axis == 1 and scfg.mesh.model_axis == 1
        # the original is untouched
        assert cfg.pallas.table_layout == "packed"
        assert cfg.pallas.use_cin_kernel


class TestQuantizedExport:
    def test_per_row_error_bound(self):
        from deepfm_tpu.utils.export import quantize_embedding_tables

        rng = np.random.default_rng(0)
        t = rng.normal(size=(64, 17)).astype(np.float32) * 0.1
        t[0] = 0.0  # the OOV row invariant
        qtabs = quantize_embedding_tables({"embedding": {"table_w16": t}})
        q, scale = qtabs[17]
        assert q.dtype == np.int8 and scale.dtype == np.float32
        deq = q.astype(np.float32) * scale[:, None]
        # symmetric per-row quantization: error <= scale/2 elementwise
        assert np.all(np.abs(deq - t) <= scale[:, None] / 2 + 1e-7)
        np.testing.assert_array_equal(deq[0], 0.0)  # OOV row exact

    def test_quantized_artifact_smaller_and_close(self, tmp_path):
        """Tables dominate a CTR artifact: the int8 export must shrink it
        substantially and score within quantization tolerance."""
        import jax

        from deepfm_tpu.data.schema import (
            DatasetSchema,
            FeatureType,
            FieldSchema,
        )
        from deepfm_tpu.utils.export import quantized_scoring_model

        fields = {
            "user": FieldSchema("user", FeatureType.SPARSE, 4000, 8, "user"),
            "item": FieldSchema("item", FeatureType.SPARSE, 5000, 8, "item"),
        }
        packed = pack_schema(DatasetSchema(fields=fields))
        cfg = config_from_dict(
            {
                "feature": {"fm_embed_dim": 8},
                "dnn": {"hidden_units": [16], "dropout": 0.0},
            }
        )
        scfg = serving_config(cfg)
        model = create_model("deepfm", packed, scfg)
        ids = np.zeros((8, packed.num_slots), np.int32)
        dense = np.zeros((8, packed.num_dense), np.float32)
        variables = model.init(jax.random.PRNGKey(1), ids, dense, train=False)
        params = variables["params"]
        bstats = variables.get("batch_stats", {})

        f32_path = tmp_path / "f32.stablehlo"
        q_path = tmp_path / "int8.stablehlo"
        n_f32 = save_scoring(
            f32_path,
            export_scoring(
                model, params, bstats, packed.num_slots, packed.num_dense
            ),
        )
        qmodel = quantized_scoring_model(cfg, packed, params)
        n_q = save_scoring(
            q_path,
            export_scoring(
                qmodel, params, bstats, packed.num_slots, packed.num_dense
            ),
        )
        # f32 tables: 9002 rows x 9 cols x 4 B; int8: 9 B + 4 B scale.
        # The f32 constants must be DCE'd out of the quantized program.
        assert n_q < 0.55 * n_f32, (n_q, n_f32)

        rng = np.random.default_rng(2)
        b = 64
        tids = rng.integers(0, 1000, (b, packed.num_slots)).astype(np.int32)
        tdense = np.zeros((b, packed.num_dense), np.float32)
        got = load_scoring(q_path)(tids, tdense)
        want = load_scoring(f32_path)(tids, tdense)
        assert got.shape == (b,)
        assert np.abs(got - want).max() < 0.02
    @pytest.fixture(scope="class")
    def trained_dir(self, tmp_path_factory):
        """One tiny trained run (packed layout, so the export exercises
        the cross-layout checkpoint restore)."""
        from deepfm_tpu.data.movielens import MovieLensAdapter
        from deepfm_tpu.data.synthetic import generate_movielens_like
        from deepfm_tpu.training.trainer import Trainer

        root = tmp_path_factory.mktemp("export_cli")
        data_dir = root / "ml"
        generate_movielens_like(
            data_dir, num_users=60, num_items=80, num_rows=2500, seed=3
        )
        overrides = {
            "output_dir": str(root / "out"),
            "data": {
                "data_dir": str(data_dir),
                "num_neg_train": 1,
                "num_neg_eval": 5,
            },
            "feature": {"fm_embed_dim": 8},
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 512, "num_epochs": 1},
            "pallas": {"table_layout": "packed"},
        }
        cfg = config_from_dict(overrides)
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
        trainer.train()
        return root, overrides

    def test_export_command_writes_verified_artifact(self, trained_dir):
        import yaml

        from deepfm_tpu.cli import main

        root, overrides = trained_dir
        cfg_path = root / "config.yaml"
        cfg_path.write_text(yaml.safe_dump(overrides))
        artifact = root / "deepfm.stablehlo"
        main(
            [
                "export",
                "--config",
                str(cfg_path),
                "--output",
                str(artifact),
            ]
        )
        assert artifact.stat().st_size > 0

        # consumer side: nothing but the artifact
        score = load_scoring(artifact)
        in_avals = score.exported.in_avals
        b = 7
        ids = np.zeros((b, in_avals[0].shape[1]), np.int32)
        dense = np.zeros((b, in_avals[1].shape[1]), np.float32)
        probs = score(ids, dense)
        assert probs.shape == (b,)
        assert np.all((probs >= 0) & (probs <= 1))

    def test_export_command_quantized(self, trained_dir):
        import yaml

        from deepfm_tpu.cli import main

        root, overrides = trained_dir
        cfg_path = root / "config_q.yaml"
        cfg_path.write_text(yaml.safe_dump(overrides))
        artifact = root / "deepfm_int8.stablehlo"
        main(
            [
                "export",
                "--config",
                str(cfg_path),
                "--output",
                str(artifact),
                "--quantize",
                "int8",
            ]
        )
        f32 = root / "deepfm.stablehlo"
        if f32.exists():  # ordering-dependent; only compare when present
            assert artifact.stat().st_size < f32.stat().st_size
        score = load_scoring(artifact)
        in_avals = score.exported.in_avals
        ids = np.zeros((5, in_avals[0].shape[1]), np.int32)
        dense = np.zeros((5, in_avals[1].shape[1]), np.float32)
        probs = score(ids, dense)
        assert np.all((probs >= 0) & (probs <= 1))

    def test_export_command_static_batch_exceeding_val(self, trained_dir):
        """--batch-size bigger than the val split: verification pads
        with OOV rows instead of crashing on the pinned shape."""
        import yaml

        from deepfm_tpu.cli import main

        root, overrides = trained_dir
        cfg_path = root / "config_bs.yaml"
        cfg_path.write_text(yaml.safe_dump(overrides))
        artifact = root / "deepfm_bs.stablehlo"
        main(
            [
                "export",
                "--config",
                str(cfg_path),
                "--output",
                str(artifact),
                "--batch-size",
                "65536",
            ]
        )
        score = load_scoring(artifact)
        assert score.exported.in_avals[0].shape[0] == 65536

    def test_export_command_rejects_bad_platform_verify(self, trained_dir):
        """--platforms with only a foreign platform skips verification
        but still writes a loadable artifact description."""
        import yaml

        from deepfm_tpu.cli import main

        root, overrides = trained_dir
        cfg_path = root / "config2.yaml"
        cfg_path.write_text(yaml.safe_dump(overrides))
        artifact = root / "deepfm_tpuonly.stablehlo"
        main(
            [
                "export",
                "--config",
                str(cfg_path),
                "--output",
                str(artifact),
                "--platforms",
                "tpu",
            ]
        )
        from jax import export as jax_export

        exported = jax_export.deserialize(artifact.read_bytes())
        assert exported.platforms == ("tpu",)
