"""Throughput benchmark: train-step examples/sec/chip on real TPU.

Workload: Criteo-scale synthetic CTR batch (26 categorical fields,
vocab 400k/field, fm_embed_dim 16, DNN [512,256,128], batch 16384,
bfloat16 compute) — BASELINE.json configs[4]. Measures the full jitted
train step (fwd + bwd + Adam update) for EVERY model family: xDeepFM
(CIN [128,128]), AttentionDeepFM (4 heads, dim 64), and the flagship
DeepFM. One JSON line per model; the flagship line prints LAST so a
tail-parse picks it up.

Tunnel resilience (the axon TPU tunnel intermittently wedges for
20 min - 5 h; a wedge once zeroed a whole round's bench artifact):

* the orchestrator PROBES the tunnel with a tiny matmul in a
  subprocess under a hard timeout before any heavy work, retrying
  within a bounded window;
* each model benches in its OWN subprocess under a timeout, and its
  JSON line is emitted (and flushed) the moment it completes — a later
  wedge cannot zero earlier results;
* a model that cannot be measured (wedged/timed out) emits its
  last-known-good value from ``.bench_last_good.json`` tagged
  ``"stale": true`` with provenance, so the artifact is parseable and
  honest either way.

Every line carries engagement telemetry (``backward`` path + engaged
kernel list, training/telemetry.py) so a silent gating regression
shows up in the artifact itself.

The reference publishes no throughput numbers (SURVEY.md §6); the
baseline for ``vs_baseline`` is an equivalent PyTorch DeepFM train step
implemented in bench_baseline_torch.py, run on this host's CPU (the
reference targets CPU/MPS eager PyTorch; reference deepfm/cli.py:16-25).
All three models are normalized against that one baseline — the
reference's own xDeepFM/AttentionDeepFM steps are strictly slower than
its DeepFM, so the ratio is conservative for them.

The baseline is PINNED: .bench_baseline.json (committed) carries one
measured value plus its environment (thread count, torch version, date).
Re-measuring every round on this shared, cgroup-limited host produced
incomparable denominators (1,088 -> 2,365 -> 4,562 ex/s across rounds-1/2
as the visible-CPU allotment changed); pass --remeasure-baseline only to
refresh the pin deliberately, on a quiet host, with the pinned thread
count.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

# Persistent compile cache, unconditionally: fresh compiles ride the
# slow remote tunnel (a full train step can take >10 min and heavy
# bursts are what wedge it). Without this a driver invocation that
# doesn't export the var recompiles all three models from scratch —
# enough on its own to blow the round budget.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_deepfm"
)

REPO = Path(__file__).parent
BASELINE_CACHE = REPO / ".bench_baseline.json"
LAST_GOOD = REPO / ".bench_last_good.json"

BATCH = 16384
NUM_FIELDS = 26
VOCAB = 400_000
WARMUP = 3
STEPS = 10

MODELS = ("xdeepfm", "attention_deepfm", "deepfm")  # flagship LAST

# orchestration budgets (seconds) — overridable via env for local runs
TOTAL_BUDGET = int(os.environ.get("DEEPFM_BENCH_BUDGET_S", "2700"))
PROBE_TIMEOUT = 100
PROBE_RETRY_SLEEP = 60
# A COLD-cache fused train-step compile measured 866s over the tunnel
# (scripts/compile_bisect.py stage 3, round 4) — the old 1200s cap
# killed workers mid-compile at exactly that point, which also wasted
# the compile (the cache only records completed RPCs). Warm-cache
# workers finish in minutes; the cap only matters cold.
WORKER_TIMEOUT_CAP = 2400


def _workload(rows: int = BATCH):
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.data.schema import DatasetSchema, FeatureType, FieldSchema

    fields = {}
    for i in range(NUM_FIELDS):
        name = f"cat_{i}"
        fields[name] = FieldSchema(
            name, FeatureType.SPARSE, VOCAB, 16, "user" if i % 2 else "item"
        )
    fields["dense_0"] = FieldSchema(
        "dense_0", FeatureType.DENSE, 0, 16, "context"
    )
    schema = DatasetSchema(fields=fields)
    packed = pack_schema(schema)

    rng = np.random.default_rng(0)
    feats = {
        f"cat_{i}": rng.integers(1, VOCAB, rows) for i in range(NUM_FIELDS)
    }
    feats["dense_0"] = rng.normal(size=rows).astype(np.float32)
    labels = rng.integers(0, 2, rows).astype(np.float32)
    return packed, pack_features(packed, feats, labels)


def bench_tpu(
    model_name: str,
    pallas_overrides: dict | None = None,
    moments_dtype: str | None = None,
    fused_backward: bool = True,
) -> tuple[float, dict]:
    """(examples/sec, engagement record) for one model's train step."""
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.telemetry import trainer_engagement
    from deepfm_tpu.training.trainer import Trainer

    packed, arrays = _workload()
    cfg_dict = {
        "model_name": model_name,
        "dnn": {
            "hidden_units": [512, 256, 128],
            "dropout": 0.0,
            "use_batch_norm": True,
        },
        "training": {
            "batch_size": BATCH,
            "compute_dtype": "bfloat16",
            "fused_backward": fused_backward,
        },
        "output_dir": "/tmp/bench_out",
    }
    if moments_dtype is not None:  # None = the TrainingConfig default
        cfg_dict["training"]["moments_dtype"] = moments_dtype
    if pallas_overrides:
        cfg_dict["pallas"] = pallas_overrides
    config = config_from_dict(cfg_dict)
    model = create_model(model_name, packed, config)
    trainer = Trainer(
        model=model,
        packed_schema=packed,
        config=config,
        train_data=arrays,
        val_data=arrays,
        test_data=arrays,
    )
    engagement = trainer_engagement(trainer)

    # measure the production path: STEPS steps per dispatch via the
    # trainer's epoch scan (one compiled program, loop chained on-device)
    def tile(a):
        return jnp.broadcast_to(jnp.asarray(a), (STEPS,) + a.shape)

    staged = (
        tile(arrays.ids),
        tile(arrays.dense),
        tile(arrays.labels),
        jnp.ones((STEPS, BATCH), jnp.float32),
    )

    for _ in range(WARMUP):
        trainer.state, loss = trainer._train_step(
            trainer.state, staged[0][0], staged[1][0], staged[2][0],
            staged[3][0],
        )
    trainer.state, _ = trainer._epoch_scan(trainer.state, staged)  # compile
    jax.block_until_ready(trainer.state)

    t0 = time.perf_counter()
    trainer.state, loss = trainer._epoch_scan(trainer.state, staged)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt, engagement


def bench_inference(model_name: str) -> float:
    """Forward-only (serving) throughput: Trainer.predict over
    STEPS x BATCH rows — the compiled eval scan, one dispatch per
    staged chunk + one host fetch, exactly the `predict` CLI's path."""
    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    packed, arrays = _workload(rows=BATCH * STEPS)
    config = config_from_dict(
        {
            "model_name": model_name,
            "dnn": {
                "hidden_units": [512, 256, 128],
                "dropout": 0.0,
                "use_batch_norm": True,
            },
            "training": {
                "batch_size": BATCH,
                "compute_dtype": "bfloat16",
            },
            "output_dir": "/tmp/bench_out",
        }
    )
    model = create_model(model_name, packed, config)
    trainer = Trainer(
        model=model,
        packed_schema=packed,
        config=config,
        train_data=arrays,
        val_data=arrays,
        test_data=arrays,
    )
    _ = trainer.predict(arrays)  # compile + stage
    t0 = time.perf_counter()
    scores = trainer.predict(arrays)  # ends with the host fetch
    dt = time.perf_counter() - t0
    return len(scores) / dt


BASELINE_THREADS = 1  # pinned: cgroup allots 1 CPU on this host


def bench_torch_baseline() -> float | None:
    try:
        import torch

        torch.set_num_threads(BASELINE_THREADS)
        from bench_baseline_torch import measure

        value = measure(
            batch=BATCH, num_fields=NUM_FIELDS, vocab=VOCAB, steps=3
        )
        BASELINE_CACHE.write_text(json.dumps({
            "baseline": value,
            "provenance": {
                "torch_threads": BASELINE_THREADS,
                "torch": torch.__version__,
                "measured": time.strftime("%Y-%m-%d"),
                "note": "eager torch DeepFM train step, this host's "
                        "cgroup-limited CPU (bench_baseline_torch.py)",
            },
        }, indent=1))
        return value
    except Exception:
        return None


def _load_baseline(remeasure: bool) -> float | None:
    baseline = bench_torch_baseline() if remeasure else None
    if baseline is None and BASELINE_CACHE.exists():
        baseline = json.loads(BASELINE_CACHE.read_text()).get("baseline")
    return baseline


def _emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


# ----------------------------------------------------------------------
# worker mode: bench ONE model in this process, print one JSON line
# ----------------------------------------------------------------------

def run_worker(args) -> None:
    name = args.worker
    degraded = None
    try:
        value, engagement = bench_tpu(
            name,
            moments_dtype=args.moments_dtype,
            fused_backward=not args.no_fused_backward,
        )
    except Exception as e:  # never lose the whole bench to one kernel
        print(
            f"# {name}: kernel path failed ({type(e).__name__}); "
            "retrying with model-tower Pallas kernels off",
            file=sys.stderr,
        )
        value, engagement = bench_tpu(
            name,
            pallas_overrides={
                "use_attention_kernel": False,
                "use_cin_kernel": False,
            },
            moments_dtype=args.moments_dtype,
            fused_backward=not args.no_fused_backward,
        )
        # mark the JSON line itself — a stderr note alone once let a
        # kernel crash ship as an unexplained "slowdown"
        degraded = f"{type(e).__name__}: model-tower kernels off"

    baseline = _load_baseline(args.remeasure_baseline)
    line = {
        "metric": f"{name}_train_step_throughput",
        "value": round(value, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else 1.0,
        "backward": engagement["backward"],
        "kernels": engagement["kernels"],
    }
    if degraded:
        line["degraded"] = degraded
    if args.inference:
        v = bench_inference(name)
        _emit({
            "metric": f"{name}_predict_throughput",
            "value": round(v, 1),
            "unit": "examples/sec/chip",
            "vs_baseline": 1.0,
        })
    _emit(line)


# ----------------------------------------------------------------------
# orchestrator mode: probe + per-model subprocess + last-known-good
# ----------------------------------------------------------------------

def _probe_once() -> bool:
    # --fresh compiles a unique shape: the tunnel has a degraded mode
    # where cached tiny ops succeed while fresh compiles hang — the
    # state that matters to a worker about to compile a train step
    try:
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "tpu_probe.py"),
             "--fresh"],
            timeout=PROBE_TIMEOUT,
            capture_output=True,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _probe_until(deadline: float) -> bool:
    """Probe the tunnel until healthy or the window closes."""
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        ok = _probe_once()
        print(
            f"# probe attempt {attempt}: "
            f"{'OK' if ok else 'wedged'} ({time.monotonic() - t0:.0f}s)",
            file=sys.stderr,
        )
        if ok:
            return True
        if time.monotonic() + PROBE_RETRY_SLEEP + PROBE_TIMEOUT > deadline:
            return False
        time.sleep(PROBE_RETRY_SLEEP)


def _git_sha() -> str:
    """Short HEAD SHA, or 'unknown' outside a usable git checkout."""
    try:
        r = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO, capture_output=True, text=True, timeout=10,
        )
        return r.stdout.strip() if r.returncode == 0 else "unknown"
    except OSError:
        return "unknown"


def _stale_line(name: str, reason: str) -> dict:
    """Last-known-good fallback line for one model, clearly marked.

    The entry is commit-bound: if HEAD has moved past the SHA the
    number was measured at, the note says so explicitly — a stale line
    must never silently describe a configuration that no longer exists
    at HEAD (BENCH_r04 shipped a pre-bf16-CIN-flip xdeepfm line whose
    kernel list was dead at HEAD; VERDICT r4 #2).
    """
    lkg = {}
    if LAST_GOOD.exists():
        lkg = json.loads(LAST_GOOD.read_text()).get(name, {})
    note = (
        f"{reason}; last-known-good {lkg.get('measured', 'never')} "
        f"({lkg.get('provenance', 'none')})"
    )
    recorded_sha = lkg.get("git_sha")
    if recorded_sha:
        head = _git_sha()
        if head != "unknown" and head != recorded_sha:
            note += (
                f"; HEAD ({head}) has moved past the recorded commit "
                f"({recorded_sha}) — this number may not describe "
                "current code"
            )
    line = {
        "metric": f"{name}_train_step_throughput",
        "value": lkg.get("value", 0.0),
        "unit": "examples/sec/chip",
        "vs_baseline": lkg.get("vs_baseline", 0.0),
        "stale": True,
        "note": note,
    }
    for k in ("backward", "kernels", "git_sha", "config_fp"):
        if k in lkg:
            line[k] = lkg[k]
    return line


def _record_good(name: str, line: dict, config_fp: str = "") -> None:
    data = {}
    if LAST_GOOD.exists():
        try:
            data = json.loads(LAST_GOOD.read_text())
        except json.JSONDecodeError:
            data = {}
    entry = {k: v for k, v in line.items() if k != "metric"}
    entry["measured"] = time.strftime("%Y-%m-%d")
    sha = _git_sha()
    entry["git_sha"] = sha
    if config_fp:
        entry["config_fp"] = config_fp
    entry["provenance"] = f"bench.py on-hardware run @ {sha}"
    data[name] = entry
    LAST_GOOD.write_text(json.dumps(data, indent=1))


def _config_fp(args) -> str:
    """Knobs that change WHAT the worker measures — recorded with each
    last-good entry so a stale replay names the configuration it
    describes, not just the commit."""
    return (
        f"moments={args.moments_dtype},"
        f"fused_backward={not args.no_fused_backward}"
    )


def _cache_is_warm() -> bool:
    """Heuristic: does the persistent compile cache already hold this
    session's programs?  Warm workers finish in minutes, so the probe
    window can eat most of the budget; cold workers need ~15 min of
    compile each, so probing must stop early enough to pay for them."""
    try:
        d = Path(os.environ["JAX_COMPILATION_CACHE_DIR"])
        return sum(1 for _ in d.iterdir()) >= 20
    except (KeyError, OSError):
        return False


def run_orchestrator(args) -> None:
    models = [m for m in args.models.split(",") if m]
    start = time.monotonic()
    deadline = start + TOTAL_BUDGET

    # Probe window (VERDICT r4 #1c: wedges last 20 min-5 h, so probe as
    # wide as the measurement budget allows): with a WARM compile cache
    # a worker needs ~5 min, so reserve 5 min per model + slack and
    # probe through everything else. With a COLD cache the old
    # half-budget split stands — workers need the time more than the
    # probe does.
    if _cache_is_warm():
        reserve = 120 + 300 * len(models)
        probe_deadline = max(
            start + TOTAL_BUDGET / 2, deadline - reserve
        )
    else:
        probe_deadline = start + TOTAL_BUDGET / 2
    probe_deadline = min(probe_deadline, deadline - 120)
    healthy = _probe_until(probe_deadline)
    if not healthy:
        print(
            "# tunnel wedged for the whole probe window; emitting "
            "last-known-good (stale) lines",
            file=sys.stderr,
        )
        for name in models:
            _emit(_stale_line(name, "TPU tunnel wedged"))
        return

    for i, name in enumerate(models):
        remaining = deadline - time.monotonic()
        models_left = len(models) - i
        # the flagship (last) gets whatever remains; earlier models
        # share fairly so a slow one can't starve the flagship
        per_model = min(WORKER_TIMEOUT_CAP, remaining / models_left)
        if per_model < 180:
            _emit(_stale_line(name, "bench budget exhausted"))
            continue
        cmd = [sys.executable, str(REPO / "bench.py"), "--worker", name,
               "--moments-dtype", args.moments_dtype]
        if args.no_fused_backward:
            cmd.append("--no-fused-backward")
        if args.inference:
            cmd.append("--inference")
        try:
            r = subprocess.run(
                cmd, timeout=per_model, capture_output=True, text=True
            )
            out_lines = [
                ln for ln in r.stdout.splitlines() if ln.startswith("{")
            ]
            if r.returncode == 0 and out_lines:
                for ln in out_lines:
                    parsed = json.loads(ln)
                    _emit(parsed)
                    if parsed["metric"].endswith("train_step_throughput"):
                        _record_good(name, parsed, _config_fp(args))
                continue
            reason = (
                f"worker rc={r.returncode}: "
                f"{(r.stderr or '').strip().splitlines()[-1:] or ['no output']}"
            )
        except subprocess.TimeoutExpired:
            reason = f"worker timed out after {per_model:.0f}s (tunnel wedge?)"
        print(f"# {name}: {reason}", file=sys.stderr)
        _emit(_stale_line(name, reason))
        # a mid-bench wedge poisons later models too — re-probe cheaply
        # before spending their budget
        if not _probe_once():
            print(
                "# tunnel unhealthy after failure; stale lines for the rest",
                file=sys.stderr,
            )
            for rest in models[i + 1:]:
                _emit(_stale_line(rest, "TPU tunnel wedged mid-bench"))
            return


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--remeasure-baseline", action="store_true",
        help="refresh the pinned torch-CPU baseline (quiet host only)",
    )
    parser.add_argument(
        "--models",
        default=",".join(MODELS),
        help="comma-separated subset of models to bench",
    )
    # default follows the production TrainingConfig default so the bench
    # measures what `train` ships (a hard-pinned "float32" here once
    # silently measured a dead configuration after the round-5 flip)
    from deepfm_tpu.config import TrainingConfig

    parser.add_argument(
        "--moments-dtype",
        default=TrainingConfig.moments_dtype,
        choices=["float32", "bfloat16"],
        help="Adam moment storage for the tables (bfloat16 cuts the "
        "HBM-bound fused-Adam pass; quality evidence in RESULTS.md)",
    )
    parser.add_argument(
        "--no-fused-backward",
        action="store_true",
        help="disable the merged sparse backward-optimizer (A/B against "
        "the densify + fused-Adam two-pass path)",
    )
    parser.add_argument(
        "--inference",
        action="store_true",
        help="also report forward-only (serving) throughput per model",
    )
    parser.add_argument(
        "--worker",
        default=None,
        metavar="MODEL",
        help="internal: bench one model in-process (no probe/orchestration)",
    )
    parser.add_argument(
        "--no-probe",
        action="store_true",
        help="skip tunnel probing/subprocess isolation (run all models "
        "in-process; CI/CPU use)",
    )
    return parser


def main() -> None:
    args = build_parser().parse_args()

    if args.worker:
        run_worker(args)
        return
    if args.no_probe:
        for name in [m for m in args.models.split(",") if m]:
            args.worker = name
            run_worker(args)
        return
    run_orchestrator(args)


if __name__ == "__main__":
    main()
