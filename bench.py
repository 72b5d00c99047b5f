"""Throughput benchmark: train-step examples/sec/chip on real TPU.

Workload: Criteo-scale synthetic CTR batch (26 categorical fields,
vocab 400k/field, fm_embed_dim 16, DNN [512,256,128], batch 16384,
bfloat16 compute) — BASELINE.json configs[4]. Measures the full jitted
train step (fwd + bwd + Adam update) for EVERY model family: xDeepFM
(CIN [128,128]), AttentionDeepFM (4 heads, dim 64), and the flagship
DeepFM. One JSON line per model; the flagship line prints LAST so a
tail-parse picks it up.

The reference publishes no throughput numbers (SURVEY.md §6); the
baseline for ``vs_baseline`` is an equivalent PyTorch DeepFM train step
implemented in bench_baseline_torch.py, run on this host's CPU (the
reference targets CPU/MPS eager PyTorch; reference deepfm/cli.py:16-25).
All three models are normalized against that one baseline — the
reference's own xDeepFM/AttentionDeepFM steps are strictly slower than
its DeepFM, so the ratio is conservative for them. Pass --no-baseline to
reuse the last cached baseline value.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

BASELINE_CACHE = Path(__file__).parent / ".bench_baseline.json"

BATCH = 16384
NUM_FIELDS = 26
VOCAB = 400_000
WARMUP = 3
STEPS = 10

MODELS = ("xdeepfm", "attention_deepfm", "deepfm")  # flagship LAST


def _workload():
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
        f"cat_{i}": rng.integers(1, VOCAB, BATCH) for i in range(NUM_FIELDS)
    }
    feats["dense_0"] = rng.normal(size=BATCH).astype(np.float32)
    labels = rng.integers(0, 2, BATCH).astype(np.float32)
    return packed, pack_features(packed, feats, labels)


def bench_tpu(model_name: str) -> float:
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    packed, arrays = _workload()
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
    return BATCH * STEPS / dt


def bench_torch_baseline() -> float | None:
    try:
        from bench_baseline_torch import measure

        return measure(
            batch=BATCH, num_fields=NUM_FIELDS, vocab=VOCAB, steps=3
        )
    except Exception:
        return None


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-baseline", action="store_true")
    parser.add_argument(
        "--models",
        default=",".join(MODELS),
        help="comma-separated subset of models to bench",
    )
    args = parser.parse_args()
    models = [m for m in args.models.split(",") if m]

    values = {name: bench_tpu(name) for name in models}

    baseline = None
    if not args.no_baseline:
        baseline = bench_torch_baseline()
        if baseline:
            BASELINE_CACHE.write_text(json.dumps({"baseline": baseline}))
    if baseline is None and BASELINE_CACHE.exists():
        baseline = json.loads(BASELINE_CACHE.read_text()).get("baseline")

    for name in models:
        value = values[name]
        vs = value / baseline if baseline else 1.0
        print(
            json.dumps(
                {
                    "metric": f"{name}_train_step_throughput",
                    "value": round(value, 1),
                    "unit": "examples/sec/chip",
                    "vs_baseline": round(vs, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
