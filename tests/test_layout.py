"""Table-layout conversion (packed <-> logical) and checkpoint
portability across layouts/backends (round-1 advisor finding: layout must
not be silently pinned to the build-time backend)."""

import dataclasses
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "tests")
from conftest import make_synth_batch, make_synth_schema  # noqa: E402

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import pack_features, pack_schema  # noqa: E402
from deepfm_tpu.models import create_model, resolve_table_layout  # noqa: E402
from deepfm_tpu.training.trainer import Trainer  # noqa: E402
from deepfm_tpu.utils.layout import (  # noqa: E402
    pack_table,
    table_specs,
    tree_layout,
    unpack_table,
)


@pytest.mark.parametrize("dcol,pack,v", [(17, 7, 1000), (9, 14, 300), (5, 25, 64)])
def test_pack_unpack_round_trip(dcol, pack, v):
    rng = np.random.default_rng(0)
    logical = rng.normal(size=(v, dcol)).astype(np.float32)
    phys = -(-(-(-v // pack)) // 128) * 128
    packed = pack_table(logical, dcol, pack, phys)
    # dead lanes zero
    assert np.all(packed[:, pack * dcol :] == 0)
    back = unpack_table(packed, dcol, pack, v)
    np.testing.assert_array_equal(back, logical)


def test_table_specs_geometry():
    packed = pack_schema(make_synth_schema())
    specs = table_specs(packed)
    # widths 16 and 8 exist in the synth schema
    assert specs["table_w16"]["dcol"] == 17
    assert specs["table_w16"]["pack"] == 7
    assert specs["table_w8"]["pack"] == 14
    for spec in specs.values():
        lg, pk = spec["logical_shape"], spec["packed_shape"]
        assert lg[0] % 128 == 0 and pk[0] % 128 == 0 and pk[1] == 128


def _small_cfg(tmp_path, layout):
    return config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {
                "batch_size": 32,
                "num_epochs": 1,
                "scheduler": "none",
            },
            "pallas": {"table_layout": layout},
        }
    )


def _data():
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 64, seed=7)
    feats["user_id"] = feats["user"]
    return packed, pack_features(packed, feats, labels)


def test_resolve_table_layout():
    cfg = config_from_dict({"pallas": {"table_layout": "packed"}})
    assert resolve_table_layout(cfg) is True
    cfg = config_from_dict({"pallas": {"table_layout": "logical"}})
    assert resolve_table_layout(cfg) is False
    # lazy_adam composes with the packed layout (physical-row lazy
    # updates, see sparse_opt.table_ids_for_batch) — no more coercion
    cfg = config_from_dict(
        {
            "pallas": {"table_layout": "packed"},
            "training": {"optimizer": "lazy_adam"},
        }
    )
    assert resolve_table_layout(cfg) is True
    # auto follows the backend (CPU in tests)
    cfg = config_from_dict({})
    assert resolve_table_layout(cfg) is False


def test_checkpoint_restores_across_layouts(tmp_path):
    """Train with PACKED tables, restore the best checkpoint into a
    LOGICAL model: predictions must be identical (storage-only change)."""
    packed, arr = _data()

    cfg_p = _small_cfg(tmp_path, "packed")
    m_p = create_model("deepfm", packed, cfg_p)
    assert m_p.packed_tables
    tr_p = Trainer(m_p, packed, cfg_p, arr, arr, arr)
    tr_p.train()
    assert tree_layout(jax.device_get(tr_p.state.params), packed) == "packed"
    metrics_p = tr_p.evaluate(arr)

    cfg_l = dataclasses.replace(_small_cfg(tmp_path, "logical"))
    m_l = create_model("deepfm", packed, cfg_l)
    assert not m_l.packed_tables
    tr_l = Trainer(m_l, packed, cfg_l, arr, arr, arr)
    tr_l.load_best()  # converts packed -> logical on restore
    metrics_l = tr_l.evaluate(arr)

    assert metrics_l["auc"] == pytest.approx(metrics_p["auc"], abs=1e-6)
    assert metrics_l["logloss"] == pytest.approx(
        metrics_p["logloss"], abs=1e-6
    )


def test_checkpoint_restores_logical_into_packed(tmp_path):
    packed, arr = _data()

    cfg_l = _small_cfg(tmp_path, "logical")
    tr_l = Trainer(
        create_model("deepfm", packed, cfg_l), packed, cfg_l, arr, arr, arr
    )
    tr_l.train()
    metrics_l = tr_l.evaluate(arr)

    cfg_p = _small_cfg(tmp_path, "packed")
    tr_p = Trainer(
        create_model("deepfm", packed, cfg_p), packed, cfg_p, arr, arr, arr
    )
    tr_p.load_best()
    metrics_p = tr_p.evaluate(arr)
    assert metrics_p["auc"] == pytest.approx(metrics_l["auc"], abs=1e-6)


def test_resume_layout_mismatch_raises(tmp_path):
    packed, arr = _data()
    cfg_p = dataclasses.replace(
        _small_cfg(tmp_path, "packed"),
        training=dataclasses.replace(
            _small_cfg(tmp_path, "packed").training, resume=True
        ),
    )
    tr_p = Trainer(
        create_model("deepfm", packed, cfg_p), packed, cfg_p, arr, arr, arr
    )
    tr_p.train()

    cfg_l = dataclasses.replace(
        _small_cfg(tmp_path, "logical"),
        training=dataclasses.replace(
            _small_cfg(tmp_path, "logical").training, resume=True
        ),
    )
    tr_l = Trainer(
        create_model("deepfm", packed, cfg_l), packed, cfg_l, arr, arr, arr
    )
    with pytest.raises(ValueError, match="table_layout"):
        tr_l._try_resume()


def test_bad_table_layout_value_raises():
    from deepfm_tpu.config import ConfigError

    cfg = config_from_dict({"pallas": {"table_layout": "banana"}})
    with pytest.raises(ConfigError, match="table_layout"):
        resolve_table_layout(cfg)
