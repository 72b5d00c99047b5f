"""Same-data quality A/B: the ACTUAL torch reference stack vs deepfm_tpu.

Closes the round-2 verdict's top gap: until now the quality claim rested
on "same regime, different dataset". This harness trains BOTH stacks on
the IDENTICAL synthetic ML-100K instance (same files on disk), same
seeds, same protocol (temporal 80/10/10 split, 4 uniform train
negatives/positive resampled per epoch, popularity^0.75 eval negatives,
early stop on val AUC patience 5, max 50 epochs), and writes a
side-by-side summary.

The reference side imports `/root/reference/deepfm` READ-ONLY and runs
its own torch Trainer (reference: deepfm/training/trainer.py:91-169) and
its own pandas adapter — the only shim is a dacite stub (dacite is not
installed here; its only use is YAML loading, which we bypass by
constructing the reference's ExperimentConfig dataclasses directly from
the SAME YAML files via a minimal typed from_dict).

    python scripts/reference_torch_ab.py --out outputs/reference_torch_ab
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import types
import typing
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF_ROOT = "/root/reference"

import numpy as np

CONFIGS = {
    "deepfm": "configs/deepfm_movielens.yaml",
    "xdeepfm": "configs/xdeepfm_movielens.yaml",
    "attention_deepfm": "configs/attention_deepfm_movielens.yaml",
}


def _from_dict(cls, data: dict):
    """Minimal dacite.from_dict replacement for nested dataclasses."""
    kwargs = {}
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        t = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(t) and isinstance(v, dict):
            v = _from_dict(t, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def _import_reference():
    if "dacite" not in sys.modules:
        stub = types.ModuleType("dacite")
        stub.from_dict = None  # reference only uses it in load_config
        sys.modules["dacite"] = stub
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import deepfm.cli  # noqa: F401  (registers the package)

    return sys.modules["deepfm"]


def run_reference(model_name: str, data_dir: str, seed: int,
                  out_dir: str, num_neg_eval: int) -> dict:
    """One full reference-stack training run (torch, CPU)."""
    _import_reference()
    import yaml
    from deepfm.config import ExperimentConfig
    from deepfm.data.movielens import MovieLensAdapter
    from deepfm.models import create_model
    from deepfm.training.trainer import Trainer
    from deepfm.utils import seed_everything

    raw = yaml.safe_load((Path(REF_ROOT) / CONFIGS[model_name]).read_text())
    raw["seed"] = seed
    raw["output_dir"] = out_dir
    raw["data"]["data_dir"] = data_dir
    raw["data"]["num_neg_eval"] = num_neg_eval
    config = _from_dict(ExperimentConfig, raw)

    seed_everything(seed)
    adapter = MovieLensAdapter(config.data)
    schema, train_ds, val_ds, test_ds = adapter.build()
    model = create_model(model_name, schema, config)
    trainer = Trainer(
        model=model, schema=schema, config=config,
        train_ds=train_ds, val_ds=val_ds, test_ds=test_ds,
        adapter=adapter, device="cpu",
    )
    trainer.train()  # writes out_dir/results.json + best_model.pt
    results = json.loads((Path(out_dir) / "results.json").read_text())
    return {k: float(v) for k, v in results["test_metrics"].items()}


def run_ours(model_name: str, data_dir: str, seed: int, out_dir: str,
             num_neg_eval: int) -> dict:
    if str(REPO / "scripts") not in sys.path:
        sys.path.insert(0, str(REPO / "scripts"))
    from quality_runs import run_one

    return run_one(model_name, data_dir, seed, out_dir, num_neg_eval)


def summarize(per_seed: list[dict]) -> dict:
    keys = sorted(per_seed[0])
    return {
        k: {
            "mean": float(np.mean([m[k] for m in per_seed])),
            "std": float(np.std([m[k] for m in per_seed])),
        }
        for k in keys
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data/mlsynth_ab")
    ap.add_argument("--models", nargs="*", default=list(CONFIGS))
    ap.add_argument("--seeds", nargs="*", type=int, default=[42, 43, 44])
    ap.add_argument("--num-neg-eval", type=int, default=199)
    ap.add_argument("--out", default="outputs/reference_torch_ab")
    ap.add_argument("--side", choices=["both", "reference", "ours"],
                    default="both")
    args = ap.parse_args()

    # Force CPU for our side BEFORE any jax backend init (the axon TPU
    # plugin ignores JAX_PLATFORMS): quality parity is backend-neutral
    # (round-2 CPU re-runs matched TPU runs to ~0.001 AUC) and CPU keeps
    # this harness independent of the tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from deepfm_tpu.data.synthetic import generate_movielens_like

    data_dir = Path(args.data_dir)
    if not (data_dir / "u.data").exists():
        generate_movielens_like(data_dir, num_users=300, num_items=400,
                                num_rows=20_000, seed=0)
        print(f"synthetic ML-100K instance written to {data_dir}")

    summary: dict = {"data_dir": str(data_dir),
                     "dataset": {"num_users": 300, "num_items": 400,
                                 "num_rows": 20_000, "gen_seed": 0},
                     "seeds": args.seeds,
                     "num_neg_eval": args.num_neg_eval,
                     "reference": {}, "ours": {}}
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    sides = (["reference", "ours"] if args.side == "both" else [args.side])
    for side in sides:
        run = run_reference if side == "reference" else run_ours
        for model in args.models:
            per_seed = []
            for seed in args.seeds:
                run_dir = out / f"{side}_{model}_s{seed}"
                m = run(model, str(data_dir), seed, str(run_dir),
                        args.num_neg_eval)
                per_seed.append(m)
                print(f"[{side}] {model} seed={seed}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())
                                 if k in ("auc", "logloss", "HR@10",
                                          "NDCG@10")),
                      flush=True)
            summary[side][model] = summarize(per_seed)
        (out / "summary.json").write_text(json.dumps(summary, indent=2))

    if all(summary[s] for s in ("reference", "ours")):
        print("\nSame-data A/B (mean +/- std over seeds "
              f"{args.seeds}):")
        hdr = f"{'model':18s} {'metric':9s} {'reference-torch':>18s} {'deepfm_tpu':>18s} {'delta':>8s}"
        print(hdr)
        for model in args.models:
            for k in ("auc", "logloss", "HR@10", "NDCG@10"):
                r = summary["reference"][model].get(k)
                o = summary["ours"][model].get(k)
                if r and o:
                    print(f"{model:18s} {k:9s} "
                          f"{r['mean']:9.4f}±{r['std']:.4f} "
                          f"{o['mean']:9.4f}±{o['std']:.4f} "
                          f"{o['mean'] - r['mean']:+8.4f}")
    print(f"\nsummary written to {out / 'summary.json'}")


if __name__ == "__main__":
    main()
