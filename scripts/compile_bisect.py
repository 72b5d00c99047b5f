"""Bisect which bench-scale program stalls the remote TPU compile.

Round-3/4 symptom: bench workers die at the 15-40 min mark on the
train-step compile while tiny probe compiles keep succeeding. This
compiles the step's pieces separately, largest-last, each timed, so
one run says WHICH unit is slow/hung:

  1. merged sparse-Adam kernel alone, bench-scale table
  2. packed forward lookup alone, bench-scale table
  3. full fused train step (one batch, no scan)
  4. full two-pass train step (control)
  5. the epoch scan over STEPS steps (what bench times)

Run each stage under an OUTER `timeout` too — a hung remote RPC never
returns. Usage:

  PYTHONPATH=/root/.axon_site:. timeout 900 \
      python scripts/compile_bisect.py --stage 1
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_deepfm"
)

import jax

if "--cpu" in sys.argv:  # must precede backend init; axon ignores env
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BATCH = 16384
NUM_FIELDS = 26
VOCAB = 400_000
D = 16
PACK = 128 // (D + 1)  # 7


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench_tables():
    fields_rows = NUM_FIELDS * VOCAB
    phys = (fields_rows + PACK - 1) // PACK
    return phys


def stage1():
    """Merged sparse-Adam kernel, bench-scale table."""
    from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
        sort_pairs,
        sparse_table_adam_packed,
    )

    phys = bench_tables()
    n = BATCH * NUM_FIELDS
    rng = np.random.default_rng(0)
    p = jnp.zeros((phys, 128), jnp.float32)
    ids = jnp.asarray(
        rng.integers(0, phys * PACK, n).astype(np.int32)
    )
    ct = jnp.asarray(rng.normal(size=(n, D + 1)).astype(np.float32))
    log(f"stage1: phys={phys} n={n} — sort_pairs + merged kernel")
    t0 = time.perf_counter()
    sids, ctsT = sort_pairs(ids, ct)
    out = sparse_table_adam_packed(
        p, p, p, sids, ctsT,
        jnp.float32(1e-3), jnp.float32(0.0), jnp.float32(1.0),
        jnp.float32(0.0), jnp.int32(0), PACK,
    )
    jax.block_until_ready(out[0])
    log(f"stage1 OK in {time.perf_counter() - t0:.1f}s "
        f"(psq={float(out[3]):.3e})")


def _make_trainer(fused: bool, clip: float = 1.0):
    import bench

    # reuse bench.py's exact workload + trainer construction (propagate
    # --small's shape overrides into the module constants)
    bench_mod = bench
    bench_mod.BATCH, bench_mod.VOCAB = BATCH, VOCAB
    packed, arrays = bench_mod._workload(rows=BATCH)
    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    config = config_from_dict({
        "model_name": "deepfm",
        "dnn": {"hidden_units": [512, 256, 128], "dropout": 0.0,
                "use_batch_norm": True},
        "training": {"batch_size": BATCH, "compute_dtype": "bfloat16",
                     "fused_backward": fused,
                     "gradient_clip_norm": clip},
        "output_dir": "/tmp/bench_out",
    })
    model = create_model("deepfm", packed, config)
    tr = Trainer(model=model, packed_schema=packed, config=config,
                 train_data=arrays, val_data=arrays, test_data=arrays)
    return tr, arrays


def stage2():
    """Packed forward lookup alone at bench scale (predict step)."""
    tr, arrays = _make_trainer(fused=True)
    t0 = time.perf_counter()
    probs = tr.predict(arrays)
    np.asarray(probs)
    log(f"stage2 (predict fwd) OK in {time.perf_counter() - t0:.1f}s")


def stage_step(fused: bool, tag: str):
    tr, arrays = _make_trainer(fused=fused)
    t0 = time.perf_counter()
    tr.state, loss = tr._train_step(
        tr.state, arrays.ids, arrays.dense, arrays.labels,
        jnp.ones((BATCH,), jnp.float32),
    )
    jax.block_until_ready(loss)
    log(f"{tag} OK in {time.perf_counter() - t0:.1f}s "
        f"loss={float(loss):.4f}")


def stage5():
    import bench as bench_mod

    t0 = time.perf_counter()
    ex_s, engagement = bench_mod.bench_tpu("deepfm")
    log(f"stage5 (epoch scan) OK in {time.perf_counter() - t0:.1f}s "
        f"-> {ex_s:,.0f} ex/s backward={engagement.get('backward')}")


def stage6():
    """Segmented-scan global-norm assembly alone at bench scale.

    stage1 (kernel+sort, 33s) and stage4 (two-pass step, 35s) compile
    fast, the FUSED step took 866s — the remaining fused-only
    structure is sorted_segment_sumsq's associative_scan over the
    (d+1, 426k) sorted cotangent stream.
    """
    from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
        sort_pairs,
        sorted_segment_sumsq,
    )

    phys = bench_tables()
    n = BATCH * NUM_FIELDS
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, phys * PACK, n).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(n, D + 1)).astype(np.float32))

    @jax.jit
    def f(ids, ct):
        sids, ctsT = sort_pairs(ids, ct)
        return sorted_segment_sumsq(sids, ctsT)

    t0 = time.perf_counter()
    v = f(ids, ct)
    jax.block_until_ready(v)
    log(f"stage6 (segsumsq) OK in {time.perf_counter() - t0:.1f}s "
        f"ssq={float(v):.3e}")


def stage7():
    """Fused step with clipping disabled (drops the segscan branch
    from the graph if gating is structural, else isolates the clip
    scalar plumbing)."""
    tr, arrays = _make_trainer(fused=True, clip=0.0)
    t0 = time.perf_counter()
    tr.state, loss = tr._train_step(
        tr.state, arrays.ids, arrays.dense, arrays.labels,
        jnp.ones((BATCH,), jnp.float32),
    )
    jax.block_until_ready(loss)
    log(f"stage7 (fused, no clip) OK in {time.perf_counter() - t0:.1f}s "
        f"loss={float(loss):.4f}")


def stage8():
    """Pairwise Pallas segsumsq (the associative-scan replacement) at
    bench scale: compile + run + value parity vs a small-slice oracle."""
    from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
        segment_sumsq_pairs,
        sort_pairs,
        sorted_segment_sumsq_scan,
    )

    phys = bench_tables()
    n = BATCH * NUM_FIELDS
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, phys * PACK, n).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(n, D + 1)).astype(np.float32))
    t0 = time.perf_counter()
    sids, ctsT = sort_pairs(ids, ct)
    v = segment_sumsq_pairs(sids, ctsT)
    jax.block_until_ready(v)
    log(f"stage8 (pairs segsumsq) OK in {time.perf_counter() - t0:.1f}s "
        f"ssq={float(v):.6e}")
    # value check on a slice small enough for the scan to compile
    m = 8192
    sids_s, ctsT_s = sort_pairs(ids[:m], ct[:m])
    a = float(segment_sumsq_pairs(sids_s, ctsT_s))
    b = float(sorted_segment_sumsq_scan(sids_s, ctsT_s))
    log(f"stage8 slice parity: pairs={a:.6e} scan={b:.6e} "
        f"rel={abs(a - b) / max(abs(b), 1e-30):.2e}")


def main():
    global BATCH, VOCAB
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, required=True)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke test of the script)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled at import)")
    args = ap.parse_args()
    if args.small:
        BATCH, VOCAB = 256, 1000
    log(f"backend={jax.default_backend()}")
    if args.stage == 1:
        stage1()
    elif args.stage == 2:
        stage2()
    elif args.stage == 3:
        stage_step(True, "stage3 (fused step)")
    elif args.stage == 4:
        stage_step(False, "stage4 (two-pass step)")
    elif args.stage == 5:
        stage5()
    elif args.stage == 6:
        stage6()
    elif args.stage == 7:
        stage7()
    elif args.stage == 8:
        stage8()


if __name__ == "__main__":
    main()
