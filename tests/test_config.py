"""Config system tests (reference test surface: config load + overrides)."""

import pytest

from deepfm_tpu.config import (
    ConfigError,
    ExperimentConfig,
    _parse_value,
    config_from_dict,
    load_config,
)


def test_defaults():
    cfg = ExperimentConfig()
    assert cfg.model_name == "deepfm"
    assert cfg.training.batch_size == 4096
    assert cfg.feature.fm_embed_dim == 16
    assert cfg.dnn.hidden_units == (256, 128, 64)
    assert cfg.training.ranking_ks == (1, 5, 10, 20)


def test_yaml_load(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "model_name: xdeepfm\n"
        "training:\n  lr: 0.01\n  batch_size: 128\n"
        "cin:\n  layer_sizes: [32, 16]\n"
    )
    cfg = load_config(p)
    assert cfg.model_name == "xdeepfm"
    assert cfg.training.lr == 0.01
    assert cfg.training.batch_size == 128
    assert cfg.cin.layer_sizes == (32, 16)
    # untouched sections keep defaults
    assert cfg.dnn.activation == "relu"


def test_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model_name: deepfm\n")
    cfg = load_config(
        p,
        [
            "training.lr=0.005",
            "training.num_epochs=3",
            "dnn.use_batch_norm=false",
            "dnn.hidden_units=[64, 32]",
            "data.dataset_name=synthetic",
        ],
    )
    assert cfg.training.lr == 0.005
    assert cfg.training.num_epochs == 3
    assert cfg.dnn.use_batch_norm is False
    assert cfg.dnn.hidden_units == (64, 32)
    assert cfg.data.dataset_name == "synthetic"


def test_parse_value_types():
    assert _parse_value("true") is True
    assert _parse_value("False") is False
    assert _parse_value("3") == 3
    assert _parse_value("3.5") == 3.5
    assert _parse_value("1e-4") == 1e-4
    assert _parse_value("[1, 2]") == [1, 2]
    assert _parse_value("hello") == "hello"


def test_unknown_key_rejected():
    with pytest.raises(ConfigError, match="unknown keys"):
        config_from_dict({"nope": 1})
    with pytest.raises(ConfigError, match="unknown keys"):
        config_from_dict({"training": {"nope": 1}})


def test_type_errors():
    with pytest.raises(ConfigError):
        config_from_dict({"training": {"batch_size": "big"}})
    with pytest.raises(ConfigError):
        config_from_dict({"training": {"lr": "fast"}})


def test_int_accepted_for_float():
    cfg = config_from_dict({"training": {"lr": 1}})
    assert cfg.training.lr == 1.0


def test_to_dict_roundtrip():
    cfg = config_from_dict({"training": {"lr": 0.01}})
    d = cfg.to_dict()
    assert d["training"]["lr"] == 0.01
    cfg2 = config_from_dict(
        {
            k: v
            for k, v in d.items()
            if k in ("model_name", "training", "dnn")
        }
    )
    assert cfg2.training.lr == 0.01


def test_all_shipped_configs_load():
    """Every YAML under configs/ constructs a valid ExperimentConfig —
    schema changes cannot silently orphan a shipped recipe."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(paths) >= 6
    for p in paths:
        cfg = load_config(p)
        assert cfg.model_name in (
            "deepfm", "xdeepfm", "attention_deepfm"
        ), p
