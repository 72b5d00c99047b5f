"""Step-time breakdown of a model's train step on the real TPU.

Traces a few steps of the bench workload with jax.profiler and
aggregates XLA op durations from the xplane proto (parsed directly with
the TF TSL protobuf — tensorboard_plugin_profile's converter is broken
against this TF build). Prints the top-k ops by total device time.

Usage: python scripts/profile_step.py [--model xdeepfm] [--topk 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

os.environ.setdefault(
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deepfm")
    ap.add_argument("--topk", type=int, default=25)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    packed, arrays = bench._workload()
    config = config_from_dict(
        {
            "model_name": args.model,
            "dnn": {
                "hidden_units": [512, 256, 128],
                "dropout": 0.0,
                "use_batch_norm": True,
            },
            "training": {
                "batch_size": bench.BATCH,
                "compute_dtype": "bfloat16",
            },
            "output_dir": "/tmp/bench_out",
        }
    )
    model = create_model(args.model, packed, config)
    trainer = Trainer(model, packed, config, arrays, arrays, arrays)

    ids = jnp.asarray(arrays.ids)
    dense = jnp.asarray(arrays.dense)
    labels = jnp.asarray(arrays.labels)
    w = jnp.ones((bench.BATCH,), jnp.float32)
    for _ in range(2):  # compile + warm
        trainer.state, loss = trainer._train_step(
            trainer.state, ids, dense, labels, w
        )
    jax.block_until_ready(loss)

    trace_dir = tempfile.mkdtemp(prefix=f"xprof_{args.model}_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        trainer.state, loss = trainer._train_step(
            trainer.state, ids, dense, labels, w
        )
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    total_by_op: dict[str, float] = collections.defaultdict(float)
    count_by_op: dict[str, int] = collections.defaultdict(int)
    device_total = 0.0
    for f in files:
        xspace = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xspace.ParseFromString(fh.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" != line.name.strip():
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    total_by_op[name] += dur
                    count_by_op[name] += 1
                    device_total += dur

    # copy-start spans run on async DMA engines and overlap freely —
    # summing them inflates totals; bucket them separately.
    async_total = sum(
        t for n, t in total_by_op.items() if "copy-start" in n
    )
    sync_items = {
        n: t for n, t in total_by_op.items() if "copy-start" not in n
    }
    sync_total = sum(sync_items.values())
    print(
        f"\n{args.model}: synchronous device time/step ~= "
        f"{sync_total / args.steps:.2f} ms  (async copy spans, "
        f"overlapped: {async_total / args.steps:.1f} ms; "
        f"{args.steps} steps traced)\n"
    )
    print(f"{'ms/step':>9}  {'%':>5}  {'count':>5}  op")
    items = sorted(sync_items.items(), key=lambda kv: -kv[1])
    for name, tot in items[: args.topk]:
        ms = tot / args.steps
        pct = 100.0 * tot / max(sync_total, 1e-9)
        print(f"{ms:9.3f}  {pct:5.1f}  {count_by_op[name]//args.steps:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
