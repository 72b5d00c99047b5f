"""Weak-scaling harness: examples/sec at 1..N devices, fixed per-device batch.

Runs one subprocess per device count (the XLA device count is fixed at
backend init) and reports throughput + efficiency vs the single-device run:

    python scripts/weak_scaling.py --devices 1 2 4 8 --platform cpu
    python scripts/weak_scaling.py --platform tpu          # real chips

On a CPU host the virtual devices share the same cores, so the efficiency
column validates the *sharding path* (no recompiles, no unexpected
collectives), not hardware scaling; run on a real multi-chip slice for the
north-star numbers. Output: one JSON line per device count + a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time

n_devices = int(sys.argv[1])
platform = sys.argv[2]
per_device_batch = int(sys.argv[3])
steps = int(sys.argv[4])
strategy = sys.argv[5]

if platform == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
import jax
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from deepfm_tpu.config import config_from_dict
from deepfm_tpu.data.packing import pack_features, pack_schema
from deepfm_tpu.data.schema import DatasetSchema, FeatureType, FieldSchema
from deepfm_tpu.models import create_model
from deepfm_tpu.parallel import build_mesh, make_lookup_fn
from deepfm_tpu.training.trainer import Trainer

NF, VOCAB, D = 26, 100_000, 16
batch = per_device_batch * n_devices
fields = {
    f"cat_{i}": FieldSchema(f"cat_{i}", FeatureType.SPARSE, VOCAB, D, "u")
    for i in range(NF)
}
fields["dense_0"] = FieldSchema("dense_0", FeatureType.DENSE, 0, D, "c")
schema = DatasetSchema(fields=fields)
packed = pack_schema(schema)
rng = np.random.default_rng(0)
feats = {f"cat_{i}": rng.integers(1, VOCAB, batch) for i in range(NF)}
feats["dense_0"] = rng.normal(size=batch).astype(np.float32)
arrays = pack_features(packed, feats, rng.integers(0, 2, batch).astype(np.float32))

model_axis = 2 if (n_devices % 2 == 0 and strategy != "dp") else 1
mesh = build_mesh(n_devices // model_axis, model_axis) if n_devices > 1 else None
lookup_fn = make_lookup_fn(mesh, "psum") if mesh is not None else None

config = config_from_dict({
    "dnn": {"hidden_units": [256, 128], "dropout": 0.0},
    "training": {"batch_size": batch},
    "output_dir": "/tmp/weak_scaling_out",
})
model = create_model("deepfm", packed, config, lookup_fn=lookup_fn)
trainer = Trainer(model, packed, config, arrays, arrays, arrays, mesh=mesh)

ids, dense, lab, w = trainer._put_batch(
    arrays.ids, arrays.dense, arrays.labels,
    np.ones((batch,), np.float32),
)
for _ in range(3):
    trainer.state, loss = trainer._train_step(trainer.state, ids, dense, lab, w)
jax.block_until_ready(trainer.state)
t0 = time.perf_counter()
for _ in range(steps):
    trainer.state, loss = trainer._train_step(trainer.state, ids, dense, lab, w)
jax.block_until_ready(trainer.state)
dt = time.perf_counter() - t0
print(json.dumps({
    "devices": n_devices,
    "mesh": dict(mesh.shape) if mesh else {"data": 1, "model": 1},
    "batch": batch,
    "examples_per_sec": batch * steps / dt,
}))
"""


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--per-device-batch", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--strategy", default="psum")
    args = parser.parse_args()

    results = []
    for n in args.devices:
        proc = subprocess.run(
            [
                sys.executable, "-c", WORKER, str(n), args.platform,
                str(args.per_device_batch), str(args.steps), args.strategy,
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"devices={n}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        results.append(json.loads(line[-1]))
        print(line[-1])

    if results:
        base = results[0]["examples_per_sec"] / results[0]["devices"]
        print("\ndevices  mesh          ex/s        efficiency")
        for r in results:
            eff = r["examples_per_sec"] / (base * r["devices"])
            print(
                f"{r['devices']:>7}  {str(r['mesh']):<12}  "
                f"{r['examples_per_sec']:>10,.0f}  {eff:>9.1%}"
            )


if __name__ == "__main__":
    main()
