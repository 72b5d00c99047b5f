"""Real-TPU parity check: fused sparse backward-optimizer vs two-pass.

The fused sparse Adam path (`training.fused_backward`, default on) landed
while the axon tunnel was wedged, so its Mosaic compilation had only ever
run in CPU interpret mode — which is known NOT to catch certain TPU
miscompiles (see CLAUDE.md round-2 notes on sublane reshapes). This runs
BOTH trainer paths on the real chip at the exact bench.py shapes and
compares the updated table parameters and losses step by step.

Usage: timeout 2400 python scripts/fused_tpu_parity.py [--steps 3]
Exit 0 = parity holds on hardware.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def run(fused: bool, steps: int, batch: int, vocab: int):
    import jax

    import bench
    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    bench.VOCAB = vocab
    packed, arrays = bench._workload(rows=batch)
    config = config_from_dict(
        {
            "model_name": "deepfm",
            "dnn": {
                "hidden_units": [512, 256, 128],
                "dropout": 0.0,
                "use_batch_norm": True,
            },
            "training": {
                "batch_size": batch,
                "compute_dtype": "bfloat16",
                "fused_backward": fused,
            },
            "output_dir": "/tmp/bench_out",
        }
    )
    model = create_model("deepfm", packed, config)
    trainer = Trainer(
        model=model,
        packed_schema=packed,
        config=config,
        train_data=arrays,
        val_data=arrays,
        test_data=arrays,
    )
    import jax.numpy as jnp

    weights = jnp.ones((batch,), jnp.float32)
    losses = []
    for _ in range(steps):
        trainer.state, loss = trainer._train_step(
            trainer.state, arrays.ids, arrays.dense, arrays.labels, weights
        )
        losses.append(float(jax.device_get(loss)))
    params = jax.device_get(trainer.state.params)
    return losses, params


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--vocab", type=int, default=400_000)
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (script self-test at tiny shapes; "
        "the axon plugin ignores JAX_PLATFORMS)",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    losses_f, params_f = run(True, args.steps, args.batch, args.vocab)
    print(f"fused losses:    {losses_f}")
    losses_t, params_t = run(False, args.steps, args.batch, args.vocab)
    print(f"two-pass losses: {losses_t}")

    import jax

    ok = True
    flat_f = jax.tree_util.tree_leaves_with_path(params_f)
    flat_t = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(params_t)
    )
    for key, vf in flat_f:
        ks = jax.tree_util.keystr(key)
        vt = flat_t[ks]
        diff = float(np.max(np.abs(np.asarray(vf, np.float32) - np.asarray(vt, np.float32))))
        status = "OK" if diff < 1e-5 else "MISMATCH"
        if diff >= 1e-5:
            ok = False
        print(f"  {ks:60s} max|Δ| = {diff:.3e}  {status}")
    dl = max(abs(a - b) for a, b in zip(losses_f, losses_t))
    print(f"loss max|Δ| = {dl:.3e}")
    if dl > 1e-5:
        ok = False
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
