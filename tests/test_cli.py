"""CLI surface tests: compare table rendering, synth-data, arg handling."""

import json

import numpy as np
import pytest

from deepfm_tpu.cli import main, print_comparison_table


def _fake_run(run_id="run1", model="deepfm", auc=0.87):
    return {
        "run_id": run_id,
        "config": {
            "model_name": model,
            "training": {"lr": 0.001, "batch_size": 4096},
            "feature": {"fm_embed_dim": 16},
        },
        "val_metrics": {"auc": auc, "logloss": 0.4},
        "test_metrics": {
            "auc": auc - 0.01,
            "logloss": 0.41,
            "HR@10": 0.6,
            "NDCG@10": 0.33,
        },
        "training_info": {
            "best_epoch": 7,
            "total_epochs": 12,
            "examples_per_sec": 123456.0,
        },
    }


def test_compare_table_renders(capsys):
    print_comparison_table([_fake_run(), _fake_run("run2", "xdeepfm", 0.9)])
    out = capsys.readouterr().out
    assert "run1" in out and "run2" in out
    assert "0.8700" in out and "0.9000" in out
    assert "HR@10" in out and "NDCG@10" in out
    assert "123,456" in out  # throughput column


def test_compare_command_scans_directory(tmp_path, capsys):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "results.json").write_text(json.dumps(_fake_run()))
    main(["compare", "--dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "run1" in out


def test_compare_empty_dir(tmp_path, capsys):
    main(["compare", "--dir", str(tmp_path)])
    assert "No results.json" in capsys.readouterr().out


def test_synth_data_command(tmp_path, capsys):
    main(
        [
            "synth-data", "--dir", str(tmp_path / "ml"), "--users", "20",
            "--items", "30", "--rows", "500",
        ]
    )
    assert (tmp_path / "ml" / "u.data").exists()
    assert (tmp_path / "ml" / "u.user").exists()
    assert (tmp_path / "ml" / "u.item").exists()
    # format check: u.data is tab-separated ints
    line = (tmp_path / "ml" / "u.data").read_text().splitlines()[0]
    parts = line.split("\t")
    assert len(parts) == 4
    int(parts[0]); int(parts[1]); int(parts[2]); int(parts[3])


def test_missing_command_rejected():
    with pytest.raises(SystemExit):
        main([])


def test_train_requires_config():
    with pytest.raises(SystemExit):
        main(["train"])


def test_ranking_column_ordering(capsys):
    run = _fake_run()
    run["test_metrics"].update({"HR@1": 0.1, "HR@5": 0.3, "NDCG@5": 0.2})
    print_comparison_table([run])
    out = capsys.readouterr().out
    # HR columns sorted by K, then NDCG columns
    assert out.index("HR@1") < out.index("HR@5") < out.index("HR@10")
    assert out.index("HR@10") < out.index("NDCG@5") < out.index("NDCG@10")


def test_synthetic_adapter_registry():
    from deepfm_tpu.config import DataConfig
    from deepfm_tpu.data.synthetic import SyntheticCTRAdapter, build_adapter

    cfg = DataConfig(
        dataset_name="criteo_synthetic",
        synthetic_num_rows=200,
        synthetic_num_fields=4,
        synthetic_vocab_size=50,
    )
    ad = build_adapter(cfg, seed=0)
    assert isinstance(ad, SyntheticCTRAdapter)
    schema, train, val, test = ad.build()
    assert schema.num_fields == 5  # 4 categorical + 1 dense
    assert len(train) == 200
    # labels correlate with the planted structure: both classes present
    assert 0 < train.labels.mean() < 1
    # resample gives fresh rows
    t2 = ad.resample_train()
    assert not np.array_equal(t2.features["cat_0"], train.features["cat_0"])


def test_unknown_dataset_rejected():
    from deepfm_tpu.config import DataConfig
    from deepfm_tpu.data.synthetic import build_adapter

    with pytest.raises(ValueError, match="Unknown dataset"):
        build_adapter(DataConfig(dataset_name="nope"))


def test_resolve_device_knob(monkeypatch):
    import dataclasses

    import jax

    from deepfm_tpu.cli import assert_device, resolve_device
    from deepfm_tpu.config import ExperimentConfig

    calls = []
    monkeypatch.setattr(
        jax.config, "update", lambda k, v: calls.append((k, v))
    )
    cfg = ExperimentConfig()
    assert cfg.device == "auto"
    resolve_device(cfg)  # auto: no forcing
    assert calls == []

    resolve_device(dataclasses.replace(cfg, device="cpu"))
    assert calls == [("jax_platforms", "cpu")]

    # resolve_device never touches the backend; device=tpu validation
    # happens post-multihost-init in assert_device
    tpu_cfg = dataclasses.replace(cfg, device="tpu")
    resolve_device(tpu_cfg)
    assert calls == [("jax_platforms", "cpu")]  # no new config writes
    with pytest.raises(RuntimeError, match="backend"):
        assert_device(tpu_cfg)  # CPU-only backend must fail fast
    assert_device(cfg)  # auto: no-op

    with pytest.raises(ValueError, match="auto|cpu|tpu"):
        resolve_device(dataclasses.replace(cfg, device="banana"))


def test_maybe_init_multihost(monkeypatch):
    import dataclasses

    from deepfm_tpu.cli import maybe_init_multihost
    from deepfm_tpu.config import ExperimentConfig
    from deepfm_tpu.parallel import mesh as mesh_mod

    cfg = ExperimentConfig()
    assert maybe_init_multihost(cfg) is False  # multihost off: no-op

    on = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, multihost=True)
    )
    # no coordinator found (probe failed) -> HARD ERROR by default: N
    # silent single-process trainings sharing an output_dir is the
    # failure mode this guards (round-2 advisor finding)
    monkeypatch.setattr(
        mesh_mod, "initialize_distributed", lambda **kw: False
    )
    with pytest.raises(RuntimeError, match="allow_single_process"):
        maybe_init_multihost(on)
    # explicit opt-in -> warn-and-continue fallback
    allowed = dataclasses.replace(
        on,
        mesh=dataclasses.replace(on.mesh, allow_single_process=True),
    )
    assert maybe_init_multihost(allowed) is False
    # coordinator present -> initialization runs
    monkeypatch.setattr(
        mesh_mod, "initialize_distributed", lambda **kw: True
    )
    assert maybe_init_multihost(on) is True


def test_compare_ece_column_conditional(capsys):
    """The calibration column appears only when some run reports it."""
    old = _fake_run()
    print_comparison_table([old])
    assert "Tst ECE" not in capsys.readouterr().out

    new = _fake_run("run3")
    new["test_metrics"]["ece"] = 0.0123
    print_comparison_table([old, new])
    out = capsys.readouterr().out
    assert "Tst ECE" in out and "0.0123" in out
