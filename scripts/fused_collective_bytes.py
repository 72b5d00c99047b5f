"""Collective traffic of the FUSED sparse backward at model-sharded meshes.

Compiles the full jitted train step on a virtual CPU mesh (default
2x4 data x model; --dp/--m to change) for four
backward variants and reports each program's exact collective inventory
(ops + bytes/step from optimized HLO):

  two-pass  psum        — densify + masked optax; full pair all-gather
  two-pass  all_to_all  — densify + routed exchange (capacity buckets)
  fused     psum        — merged kernel on replicated pairs
  fused     all_to_all  — merged kernel on OWNER-ROUTED pairs
                          (route_sorted_pairs; this round's addition)

The claim under test: fused+all_to_all moves the same order of bytes as
the two-pass routed backward — the merged kernel's HBM savings no
longer cost the routed traffic advantage.

Usage: python scripts/fused_collective_bytes.py
       [--out outputs/fused_collectives] [--per-device-batch 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["DEEPFM_TPU_FORCE_FUSED_ADAM"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_trainer(strategy: str, fused: bool, batch: int, dp: int, m: int):
    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.data.schema import (
        DatasetSchema,
        FeatureType,
        FieldSchema,
    )
    from deepfm_tpu.models import create_model
    from deepfm_tpu.parallel import build_mesh
    from deepfm_tpu.training.trainer import Trainer

    NF, VOCAB, D = 26, 100_000, 16
    fields = {
        f"cat_{i}": FieldSchema(
            f"cat_{i}", FeatureType.SPARSE, VOCAB, D, "u"
        )
        for i in range(NF)
    }
    fields["dense_0"] = FieldSchema("dense_0", FeatureType.DENSE, 0, D, "c")
    schema = DatasetSchema(fields=fields)
    packed = pack_schema(schema)
    rng = np.random.default_rng(0)
    feats = {f"cat_{i}": rng.integers(1, VOCAB, batch) for i in range(NF)}
    feats["dense_0"] = rng.normal(size=batch).astype(np.float32)
    arrays = pack_features(
        packed, feats, rng.integers(0, 2, batch).astype(np.float32)
    )
    mesh = build_mesh(dp, m)
    config = config_from_dict(
        {
            "dnn": {"hidden_units": [256, 128], "dropout": 0.0},
            "pallas": {"table_layout": "packed"},
            "mesh": {"embedding_strategy": strategy},
            "training": {"batch_size": batch, "fused_backward": fused},
            "output_dir": "/tmp/fused_coll_out",
        }
    )
    model = create_model("deepfm", packed, config, mesh=mesh)
    tr = Trainer(model, packed, config, arrays, arrays, arrays, mesh=mesh)
    assert tr.sparse_fused is fused
    ids, dense, lab, w = tr._put_batch(
        arrays.ids, arrays.dense, arrays.labels,
        np.ones((batch,), np.float32),
    )
    return tr, (ids, dense, lab, w)


def main() -> None:
    from deepfm_tpu.utils.hlo import collective_totals

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/fused_collectives")
    ap.add_argument("--per-device-batch", type=int, default=1024)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--m", type=int, default=4)
    args = ap.parse_args()
    batch = args.per_device_batch * args.dp * args.m

    rows = []
    for strategy in ("psum", "all_to_all"):
        for fused in (False, True):
            tr, batch_args = build_trainer(
                strategy, fused, batch, args.dp, args.m
            )
            compiled = tr._train_step.lower(
                tr.state, *batch_args
            ).compile()
            coll = collective_totals(compiled.as_text())
            label = f"{'fused' if fused else 'two-pass'}+{strategy}"
            rows.append(
                {
                    "variant": label,
                    "strategy": strategy,
                    "fused_backward": fused,
                    "collectives": coll,
                }
            )
            print(
                f"{label:<22} main={coll['main_bytes']/2**20:8.2f} MiB "
                f"({coll['main_count']} ops)  "
                f"cond={coll['conditional_bytes']/2**20:.2f} MiB"
            )
            for op, b in coll["ops"].items():
                print(f"    {op:<28} {b/2**20:8.3f} MiB")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(
        json.dumps(
            {
                "kind": "HLO collective inventory, full train step, "
                f"virtual {args.dp}x{args.m} (data x model) CPU mesh "
                "(exact, hardware-independent)",
                "batch": batch,
                "mesh": {"data": args.dp, "model": args.m},
                "rows": rows,
            },
            indent=1,
        )
    )
    print(f"written to {out / 'results.json'}")


if __name__ == "__main__":
    main()
