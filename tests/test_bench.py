"""Unit tests for bench.py's tunnel-resilience orchestration.

The orchestrator is driver-critical: a wedged TPU tunnel once zeroed a
whole round's bench artifact (BENCH_r03 rc=124). These tests pin the
contract without any hardware: stale last-known-good emission, the
last-good ledger round trip, and the per-model subprocess loop's
emit/record/fallback behavior (subprocess + probes faked).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    # never touch the repo's real ledger from tests
    monkeypatch.setattr(mod, "LAST_GOOD", tmp_path / "last_good.json")
    yield mod
    sys.modules.pop("bench", None)


def _args(**over):
    base = dict(
        models="xdeepfm,attention_deepfm,deepfm",
        moments_dtype="float32",
        no_fused_backward=False,
        inference=False,
    )
    base.update(over)
    return argparse.Namespace(**base)


def _json_lines(capsys):
    out = capsys.readouterr().out
    return [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]


def test_stale_line_without_ledger(bench):
    line = bench._stale_line("deepfm", "TPU tunnel wedged")
    assert line["stale"] is True
    assert line["value"] == 0.0
    assert line["metric"] == "deepfm_train_step_throughput"
    assert "never" in line["note"]
    assert "TPU tunnel wedged" in line["note"]


def test_record_good_round_trips_through_stale_line(bench):
    measured = {
        "metric": "deepfm_train_step_throughput",
        "value": 711979.2,
        "unit": "examples/sec/chip",
        "vs_baseline": 114.77,
        "backward": "sparse_fused",
        "kernels": ["packed_window_gather", "sparse_adam_merged"],
    }
    bench._record_good("deepfm", measured)
    ledger = json.loads(bench.LAST_GOOD.read_text())
    assert ledger["deepfm"]["provenance"].startswith(
        "bench.py on-hardware run"
    )
    assert "measured" in ledger["deepfm"]

    line = bench._stale_line("deepfm", "budget exhausted")
    assert line["stale"] is True
    assert line["value"] == measured["value"]
    assert line["backward"] == "sparse_fused"
    assert line["kernels"] == measured["kernels"]
    assert "bench.py on-hardware run" in line["note"]


def test_record_good_binds_commit_and_stale_line_flags_movement(
    bench, monkeypatch
):
    """VERDICT r4 #2: the ledger must carry the measuring commit, and a
    stale replay must say when HEAD has moved past it."""
    monkeypatch.setattr(bench, "_git_sha", lambda: "abc1234")
    bench._record_good(
        "xdeepfm",
        {
            "metric": "xdeepfm_train_step_throughput",
            "value": 463900.0,
            "kernels": ["cin_stack"],
        },
    )
    ledger = json.loads(bench.LAST_GOOD.read_text())
    assert ledger["xdeepfm"]["git_sha"] == "abc1234"
    assert "abc1234" in ledger["xdeepfm"]["provenance"]

    # same commit: no movement warning
    line = bench._stale_line("xdeepfm", "wedged")
    assert "moved past" not in line["note"]
    assert line["git_sha"] == "abc1234"

    # HEAD moved: the note must say the number may describe dead code
    monkeypatch.setattr(bench, "_git_sha", lambda: "def5678")
    line = bench._stale_line("xdeepfm", "wedged")
    assert "moved past" in line["note"]
    assert "abc1234" in line["note"] and "def5678" in line["note"]


def test_record_good_survives_corrupt_ledger(bench):
    bench.LAST_GOOD.write_text("{not json")
    bench._record_good(
        "deepfm", {"metric": "deepfm_train_step_throughput", "value": 1.0}
    )
    assert json.loads(bench.LAST_GOOD.read_text())["deepfm"]["value"] == 1.0


def test_orchestrator_wedged_window_emits_stale_for_all(
    bench, monkeypatch, capsys
):
    monkeypatch.setattr(bench, "_probe_until", lambda deadline: False)
    bench.run_orchestrator(_args())
    lines = _json_lines(capsys)
    assert [ln["metric"] for ln in lines] == [
        "xdeepfm_train_step_throughput",
        "attention_deepfm_train_step_throughput",
        "deepfm_train_step_throughput",  # flagship still LAST
    ]
    assert all(ln["stale"] for ln in lines)


def test_orchestrator_happy_path_emits_and_records(
    bench, monkeypatch, capsys
):
    monkeypatch.setattr(bench, "_probe_until", lambda deadline: True)
    monkeypatch.setattr(bench, "_probe_once", lambda: True)
    monkeypatch.setattr(bench, "_git_sha", lambda: "abc1234")

    class FakeDone:
        returncode = 0
        stderr = ""

        def __init__(self, name):
            self.stdout = json.dumps({
                "metric": f"{name}_train_step_throughput",
                "value": 123.0,
                "unit": "examples/sec/chip",
                "vs_baseline": 1.0,
                "backward": "sparse_fused",
                "kernels": [],
            }) + "\n"

    def fake_run(cmd, timeout, capture_output, text):
        name = cmd[cmd.index("--worker") + 1]
        assert timeout <= bench.WORKER_TIMEOUT_CAP
        return FakeDone(name)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.run_orchestrator(_args())
    lines = _json_lines(capsys)
    assert len(lines) == 3
    assert not any(ln.get("stale") for ln in lines)
    ledger = json.loads(bench.LAST_GOOD.read_text())
    assert set(ledger) == {"xdeepfm", "attention_deepfm", "deepfm"}


def test_orchestrator_mid_bench_wedge_falls_back_for_rest(
    bench, monkeypatch, capsys
):
    bench._record_good(
        "attention_deepfm",
        {"metric": "attention_deepfm_train_step_throughput", "value": 9.0},
    )
    monkeypatch.setattr(bench, "_probe_until", lambda deadline: True)
    monkeypatch.setattr(bench, "_probe_once", lambda: False)
    monkeypatch.setattr(bench, "_git_sha", lambda: "abc1234")

    def fake_run(cmd, timeout, capture_output, text):
        raise bench.subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.run_orchestrator(_args())
    lines = _json_lines(capsys)
    # first model times out -> stale; re-probe fails -> rest stale too
    assert [ln["metric"] for ln in lines] == [
        "xdeepfm_train_step_throughput",
        "attention_deepfm_train_step_throughput",
        "deepfm_train_step_throughput",
    ]
    assert all(ln["stale"] for ln in lines)
    assert lines[1]["value"] == 9.0  # ledger value carried, not zeroed

def test_cache_warmth_heuristic(bench, monkeypatch, tmp_path):
    cache = tmp_path / "jax_cache"
    cache.mkdir()
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache))
    assert not bench._cache_is_warm()  # empty dir: cold
    for i in range(20):
        (cache / f"entry_{i}").write_text("x")
    assert bench._cache_is_warm()
    monkeypatch.setenv(
        "JAX_COMPILATION_CACHE_DIR", str(tmp_path / "missing")
    )
    assert not bench._cache_is_warm()  # unreadable dir: cold


def test_probe_window_widens_only_when_warm(bench, monkeypatch):
    """Warm cache -> probe window extends past half the budget (wedges
    last 20min-5h; warm workers only need ~5 min each). Cold cache ->
    the old half-budget split (workers need the time to compile)."""
    seen = {}

    def capture(deadline):
        seen["deadline"] = deadline
        return False

    monkeypatch.setattr(bench, "_probe_until", capture)
    monkeypatch.setattr(bench.time, "monotonic", lambda: 0.0)

    monkeypatch.setattr(bench, "_cache_is_warm", lambda: False)
    bench.run_orchestrator(_args())
    assert seen["deadline"] == bench.TOTAL_BUDGET / 2

    monkeypatch.setattr(bench, "_cache_is_warm", lambda: True)
    bench.run_orchestrator(_args())
    reserve = 120 + 300 * 3
    assert seen["deadline"] == bench.TOTAL_BUDGET - reserve
    assert seen["deadline"] > bench.TOTAL_BUDGET / 2


def test_cli_moments_default_tracks_training_config(bench):
    """The bench must measure the PRODUCTION moments_dtype default: a
    hard-pinned f32 silently measured a dead configuration after the
    round-5 bf16 flip (the config_fp failure mode, VERDICT r4 #2)."""
    from deepfm_tpu.config import TrainingConfig

    args = bench.build_parser().parse_args([])
    assert args.moments_dtype == TrainingConfig.moments_dtype
    # and bench_tpu's None sentinel defers to the config default
    import inspect

    sig = inspect.signature(bench.bench_tpu)
    assert sig.parameters["moments_dtype"].default is None
