"""Worker for the true 2-process jax.distributed test (not a test file).

Each process: initialize the distributed runtime against a local
coordinator, contribute 2 virtual CPU devices to a global (4, 1) mesh,
run ONE sharded DeepFM train step on deterministic synthetic data, and
(process 0) dump the loss + flattened parameters for the parent test to
compare against a single-process run.

Modes (5th arg, default "dp"):
  dp     — (4, 1) pure-DP mesh, SGD (replicated params dumped whole)
  routed — (2, 2) mesh, all_to_all strategy, packed tables, fused
           sparse backward with the OWNER-ROUTED pair exchange; tables
           are model-sharded (not addressable from one process), so the
           dump carries the replicated dense params + the psq scalars
           (sumsq of each updated table — a full-table checksum).

With 4 processes at 1 device each (dev_per_proc=1), the same (2, 2)
routed mesh puts EVERY axis — data and model — across real process
boundaries (the 2-process layout keeps the data axis intra-process).

Usage: python two_process_worker.py <pid> <nproc> <coordinator> <out.npz>
       [mode] [dev_per_proc]
"""

from __future__ import annotations

import os
import sys

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
coordinator, out_path = sys.argv[3], sys.argv[4]
mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
dev_per_proc = int(sys.argv[6]) if len(sys.argv) > 6 else 2

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={dev_per_proc}"
)
if mode == "routed":
    os.environ["DEEPFM_TPU_FORCE_FUSED_ADAM"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == dev_per_proc * nproc, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402
from conftest import make_synth_batch, make_synth_schema  # noqa: E402

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import pack_features, pack_schema  # noqa: E402
from deepfm_tpu.models import create_model  # noqa: E402
from deepfm_tpu.parallel import build_mesh  # noqa: E402
from deepfm_tpu.training.trainer import Trainer  # noqa: E402

schema = make_synth_schema()
packed = pack_schema(schema)
feats, labels = make_synth_batch(schema, 32, seed=5)
arr = pack_features(packed, feats, labels)
if mode == "routed":
    cfg = config_from_dict(
        {
            "output_dir": f"/tmp/two_proc_{pid}",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "pallas": {"table_layout": "packed"},
            "mesh": {"embedding_strategy": "all_to_all"},
            "training": {"batch_size": 32, "gradient_clip_norm": 0.0},
        }
    )
    mesh = build_mesh(2, 2)  # model axis spans the process boundary
else:
    cfg = config_from_dict(
        {
            "output_dir": f"/tmp/two_proc_{pid}",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 32, "optimizer": "sgd"},
        }
    )
    mesh = build_mesh(4, 1)  # spans both processes (2 local devices each)
# Warm the Gloo communicators for every device clique the step will use
# (global, per-"data"-group, per-"model"-group) while the ranks are
# still tightly synchronized from the coordinator handshake. XLA's Gloo
# rendezvous has a fixed 30 s key-value deadline; on a single-core host
# the heavy compile/data phase staggers the ranks past it (flaky
# DEADLINE_EXCEEDED at the first step collective — observed at 4
# processes). These tiny psums compile in ~1 s, so all ranks reach them
# near-simultaneously; every later collective reuses the contexts.
import jax.numpy as jnp  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_axes = [ax for ax in mesh.axis_names if mesh.shape[ax] > 1]
for _spec in [tuple(_axes)] + [(ax,) for ax in _axes]:
    _x = jax.device_put(
        np.zeros((mesh.size,), np.float32),
        NamedSharding(mesh, P(_spec if len(_spec) > 1 else _spec[0])),
    )
    _f = shard_map(
        lambda v, _n=_spec: jax.lax.psum(v, _n),
        mesh=mesh,
        in_specs=P(_spec if len(_spec) > 1 else _spec[0]),
        out_specs=P(),
    )
    jax.block_until_ready(jax.jit(_f)(_x))

model = create_model("deepfm", packed, cfg, mesh=mesh)
tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
if mode == "routed":
    assert tr.sparse_fused, "routed mode must take the fused sparse path"
ids, dense, lab, w = tr._put_batch(
    arr.ids, arr.dense, arr.labels, np.ones((32,), np.float32)
)
state, loss = tr._train_step(tr.state, ids, dense, lab, w)
jax.block_until_ready(loss)

if pid == 0:
    if mode == "routed":
        # tables are model-sharded across processes; dump the
        # replicated dense tower + the psq full-table checksums
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
        np.savez(
            out_path,
            loss=float(loss),
            params=np.concatenate(dense_leaves),
            psq=psq,
        )
    else:
        # params are replicated on the (4,1) DP mesh -> fully addressable
        flat = np.concatenate(
            [
                np.asarray(jax.device_get(leaf)).ravel()
                for leaf in jax.tree_util.tree_leaves(
                    jax.device_get(state.params)
                )
            ]
        )
        np.savez(out_path, loss=float(loss), params=flat)
print(f"worker {pid} OK loss={float(loss):.6f}", flush=True)
jax.distributed.shutdown()
