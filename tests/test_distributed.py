"""True multi-process jax.distributed test (round-2 verdict: multihost
init had only monkeypatch coverage; this actually runs a 2-process
coordinator + cross-process collectives).

Two subprocesses each contribute 2 virtual CPU devices to one global
(4, 1) mesh and execute a sharded DeepFM train step (gloo CPU
collectives); the resulting parameters must match a single-process run
of the identical step bit-near. Slow-marked: spawns processes and
compiles in each.
"""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TESTS_DIR = Path(__file__).resolve().parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(
    nproc: int, out: Path, mode: str | None, dev_per_proc: int = 2,
    timeout: int = 600,
) -> None:
    """Run N worker processes against one coordinator; assert all OK."""
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(nproc):
        env = {
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "JAX_PLATFORMS": "cpu",
            # workers share the persistent compile cache
            "JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_deepfm",
        }
        cmd = [
            sys.executable,
            str(TESTS_DIR / "two_process_worker.py"),
            str(pid), str(nproc), coordinator, str(out),
        ]
        if mode is not None:
            cmd += [mode, str(dev_per_proc)]
        procs.append(
            subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                cwd=str(TESTS_DIR),
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log}"
        assert f"worker {pid} OK" in log, log


def _single_process_reference():
    import jax

    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 32, seed=5)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": "/tmp/two_proc_ref",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 32, "optimizer": "sgd"},
        }
    )
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    ids, dense, lab, w = tr._put_batch(
        arr.ids, arr.dense, arr.labels, np.ones((32,), np.float32)
    )
    state, loss = tr._train_step(tr.state, ids, dense, lab, w)
    flat = np.concatenate(
        [
            np.asarray(jax.device_get(leaf)).ravel()
            for leaf in jax.tree_util.tree_leaves(
                jax.device_get(state.params)
            )
        ]
    )
    return float(loss), flat


def test_two_process_train_step_matches_single_process(tmp_path):
    out = tmp_path / "proc0.npz"
    _spawn_workers(2, out, mode=None)

    got = np.load(out)
    ref_loss, ref_params = _single_process_reference()
    assert got["loss"] == pytest.approx(ref_loss, rel=1e-5)
    np.testing.assert_allclose(
        got["params"], ref_params, rtol=1e-5, atol=2e-5
    )


def _routed_single_process_reference(monkeypatch):
    """Same (2, 2) routed-fused step on 4 in-process devices."""
    import jax

    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.parallel import build_mesh
    from deepfm_tpu.training.trainer import Trainer

    monkeypatch.setenv("DEEPFM_TPU_FORCE_FUSED_ADAM", "1")
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 32, seed=5)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": "/tmp/two_proc_routed_ref",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "pallas": {"table_layout": "packed"},
            "mesh": {"embedding_strategy": "all_to_all"},
            "training": {"batch_size": 32, "gradient_clip_norm": 0.0},
        }
    )
    mesh = build_mesh(2, 2, devices=jax.devices()[:4])
    model = create_model("deepfm", packed, cfg, mesh=mesh)
    tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
    assert tr.sparse_fused
    ids, dense, lab, w = tr._put_batch(
        arr.ids, arr.dense, arr.labels, np.ones((32,), np.float32)
    )
    state, loss = tr._train_step(tr.state, ids, dense, lab, w)
    dense_leaves = [
        np.asarray(jax.device_get(leaf)).ravel()
        for key, leaf in sorted(
            (
                (jax.tree_util.keystr(path), leaf)
                for path, leaf in jax.tree_util.tree_leaves_with_path(
                    state.params
                )
                if "table_w" not in jax.tree_util.keystr(path)
                and "fo_table" not in jax.tree_util.keystr(path)
            )
        )
    ]
    psq = np.asarray(
        [float(state.table_psq[k]) for k in sorted(state.table_psq)]
    )
    return float(loss), np.concatenate(dense_leaves), psq


def test_two_process_routed_fused_matches_single_process(
    tmp_path, monkeypatch
):
    """The routed fused backward's collectives (owner filter + capacity
    all-gather + psum'd segsumsq/psq) cross a REAL process boundary:
    (2, 2) mesh over two gloo-connected processes, model axis spanning
    them. Loss, dense params, and the psq full-table checksums must
    match the identical single-process mesh step."""
    out = tmp_path / "proc0_routed.npz"
    _spawn_workers(2, out, mode="routed")

    got = np.load(out)
    ref_loss, ref_dense, ref_psq = _routed_single_process_reference(
        monkeypatch
    )
    assert got["loss"] == pytest.approx(ref_loss, rel=1e-5)
    # Adam's first step amplifies cross-process (gloo) psum reduce-order
    # perturbations of NEAR-ZERO dense grads into +-lr sign flips
    # (CLAUDE.md: DP comparisons are ~1e-3 loose for exactly this
    # reason; the SGD dp-mode test stays at 2e-5 because SGD lacks the
    # amplification). Bound the few flipped elements by ~lr and require
    # the overwhelming majority to match tightly.
    diff = np.abs(got["params"] - ref_dense)
    np.testing.assert_allclose(
        got["params"], ref_dense, rtol=1e-4, atol=3e-3
    )
    assert (diff <= 2e-5).mean() > 0.95, (diff > 2e-5).sum()
    # psq = sumsq of each UPDATED table — a full-table checksum of the
    # routed fused update across the process boundary
    np.testing.assert_allclose(got["psq"], ref_psq, rtol=1e-5)


def test_four_process_routed_fused_matches_single_process(
    tmp_path, monkeypatch
):
    """(2, 2) mesh over FOUR gloo-connected processes at one device
    each: both the data axis (pair all-gather, dense-grad psum) and the
    model axis (owner routing, slab psum) cross real process
    boundaries — the 2-process layout keeps data intra-process. Same
    loss/dense-params/psq checksum contract vs the single-process mesh."""
    out = tmp_path / "proc0_routed4.npz"
    _spawn_workers(4, out, mode="routed", dev_per_proc=1, timeout=900)

    got = np.load(out)
    ref_loss, ref_dense, ref_psq = _routed_single_process_reference(
        monkeypatch
    )
    assert got["loss"] == pytest.approx(ref_loss, rel=1e-5)
    diff = np.abs(got["params"] - ref_dense)
    np.testing.assert_allclose(
        got["params"], ref_dense, rtol=1e-4, atol=3e-3
    )
    assert (diff <= 2e-5).mean() > 0.95, (diff > 2e-5).sum()
    np.testing.assert_allclose(got["psq"], ref_psq, rtol=1e-5)
