"""Engagement telemetry: the reported backward path / kernel list must
track the trainer's actual gate resolutions (training/telemetry.py).

The eligibility matrix (optimizer x layout x mesh x strategy) is the
riskiest code in the trainer — a gating regression already shipped once
(round-3 49ec8b3, TPU-only silent disable). These tests pin the
expected engagement for every (config, mesh) cell the suite can build
on the virtual CPU mesh, and assert results.json carries the record.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from deepfm_tpu.config import config_from_dict
from deepfm_tpu.data.packing import pack_features, pack_schema
from deepfm_tpu.data.schema import DatasetSchema, FeatureType, FieldSchema
from deepfm_tpu.models import create_model
from deepfm_tpu.parallel.mesh import build_mesh
from deepfm_tpu.training.telemetry import (
    expected_mosaic_kernels,
    trainer_engagement,
)
from deepfm_tpu.training.trainer import Trainer


def _data(nf=4, vocab=128, rows=64):
    fields = {
        f"cat_{i}": FieldSchema(
            f"cat_{i}", FeatureType.SPARSE, vocab, 16, "user"
        )
        for i in range(nf)
    }
    packed = pack_schema(DatasetSchema(fields=fields))
    rng = np.random.default_rng(0)
    feats = {f"cat_{i}": rng.integers(1, vocab, rows) for i in range(nf)}
    labels = rng.integers(0, 2, rows).astype(np.float32)
    return packed, pack_features(packed, feats, labels)


def _trainer(model_name, cfg_extra, mesh=None, tmp=None):
    packed, arrays = _data()
    cfg_d = {
        "model_name": model_name,
        "training": {"batch_size": 32, "num_epochs": 1},
        "output_dir": str(tmp or "/tmp/telemetry_test"),
    }
    for k, v in cfg_extra.items():
        if isinstance(v, dict):
            cfg_d.setdefault(k, {}).update(v)
        else:
            cfg_d[k] = v
    cfg = config_from_dict(cfg_d)
    model = create_model(model_name, packed, cfg, mesh=mesh)
    return Trainer(
        model=model,
        packed_schema=packed,
        config=cfg,
        train_data=arrays,
        val_data=arrays,
        test_data=arrays,
        mesh=mesh,
    )


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    # execute the TPU gate resolutions on the CPU suite
    monkeypatch.setenv("DEEPFM_TPU_FORCE_FUSED_ADAM", "1")


CASES = [
    # (model, cfg_extra, mesh_shape, expected_backward, expected_kernels)
    ("deepfm", {"pallas": {"table_layout": "packed"}}, None,
     "sparse_fused", ["packed_window_gather", "sparse_adam_merged"]),
    ("deepfm", {"pallas": {"table_layout": "logical"}}, None,
     "fused_two_pass", ["fused_table_adam"]),
    ("deepfm", {"pallas": {"table_layout": "packed"},
                "training": {"batch_size": 32, "fused_backward": False}},
     None, "fused_two_pass", ["packed_window_gather", "fused_table_adam"]),
    ("deepfm", {"pallas": {"table_layout": "logical"},
                "training": {"batch_size": 32, "optimizer": "lazy_adam"}},
     None, "lazy_adam", []),
    ("xdeepfm", {"pallas": {"table_layout": "packed"}}, None,
     "sparse_fused",
     ["packed_window_gather", "sparse_adam_merged", "cin_stack"]),
    ("attention_deepfm", {"pallas": {"table_layout": "packed"}}, None,
     "sparse_fused",
     ["packed_window_gather", "sparse_adam_merged", "attn_fmajor"]),
    # bf16 CIN operands: engages only with bfloat16 compute AND a
    # 16-aligned geometry — the label must track the kernel's own gate
    ("xdeepfm", {"pallas": {"table_layout": "packed",
                            "cin_bf16_operands": True},
                 "training": {"compute_dtype": "bfloat16"}}, None,
     "sparse_fused",
     ["packed_window_gather", "sparse_adam_merged", "cin_stack_bf16"]),
    ("xdeepfm", {"pallas": {"table_layout": "packed",
                            "cin_bf16_operands": True},
                 "training": {"compute_dtype": "bfloat16"},
                 "cin": {"layer_sizes": [128, 72]}}, None,
     "sparse_fused",
     ["packed_window_gather", "sparse_adam_merged", "cin_stack"]),
    ("xdeepfm", {"pallas": {"table_layout": "packed",
                            "cin_bf16_operands": True}}, None,
     "sparse_fused",
     ["packed_window_gather", "sparse_adam_merged", "cin_stack"]),
    # pure-DP mesh: fused sparse path with replicated pairs
    ("deepfm", {"pallas": {"table_layout": "packed"}}, (8, 1),
     "sparse_fused_replicated",
     ["packed_window_gather", "sparse_adam_merged"]),
    # model-sharded, owner-routed pairs
    ("deepfm", {"pallas": {"table_layout": "packed"},
                "mesh": {"embedding_strategy": "all_to_all"}}, (4, 2),
     "sparse_fused_routed",
     ["lookup_all_to_all_packed", "sparse_adam_merged"]),
    # model-sharded psum strategy: globally sorted pairs, shifted slabs
    ("deepfm", {"pallas": {"table_layout": "packed"},
                "mesh": {"embedding_strategy": "psum"}}, (4, 2),
     "sparse_fused_sharded",
     ["lookup_psum_packed", "sparse_adam_merged"]),
    # logical + sharded: two-pass chain, logical psum lookup
    ("deepfm", {"pallas": {"table_layout": "logical"},
                "mesh": {"embedding_strategy": "psum"}}, (4, 2),
     "fused_two_pass", ["lookup_psum", "fused_table_adam"]),
]


@pytest.mark.parametrize(
    "model_name,cfg_extra,mesh_shape,backward,kernels", CASES
)
def test_engagement_matrix(model_name, cfg_extra, mesh_shape, backward,
                           kernels):
    mesh = build_mesh(*mesh_shape) if mesh_shape else None
    tr = _trainer(model_name, cfg_extra, mesh=mesh)
    eng = trainer_engagement(tr)
    assert eng["backward"] == backward
    assert eng["kernels"] == kernels
    if mesh_shape:
        assert eng["mesh"] == {"data": mesh_shape[0], "model": mesh_shape[1]}


def test_plain_optax_path():
    """fused_table_adam off everywhere -> the plain optax chain."""
    os.environ.pop("DEEPFM_TPU_FORCE_FUSED_ADAM", None)
    tr = _trainer(
        "deepfm",
        {"pallas": {"table_layout": "logical"},
         "training": {"batch_size": 32, "fused_table_adam": False}},
    )
    eng = trainer_engagement(tr)
    assert eng["backward"] == "plain_optax"
    assert eng["kernels"] == []


def test_results_json_carries_engagement(tmp_path):
    tr = _trainer(
        "deepfm", {"pallas": {"table_layout": "packed"}}, tmp=tmp_path
    )
    tr.train()
    results = json.loads((tmp_path / "results.json").read_text())
    info = results["training_info"]
    assert info["backward"] == "sparse_fused"
    assert "sparse_adam_merged" in info["kernels"]
    assert info["table_layout"] == "packed"


def test_expected_mosaic_kernels_mapping():
    tr = _trainer("xdeepfm", {"pallas": {"table_layout": "packed"}})
    eng = trainer_engagement(tr)
    expected = expected_mosaic_kernels(eng)
    # sparse_adam + cin_stack both lower to Mosaic custom calls
    flat = [n for alts in expected for n in alts]
    assert "_sparse_adam_kernel" in flat
    assert "_stack_kernel" in flat
