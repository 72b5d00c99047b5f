"""Author + execute notebooks/serving_guide.ipynb (CPU, self-contained).

Cells mirror docs/SERVING.md: train a small model, batch-score, top-K
retrieval, StableHLO export (+ int8), consume the artifact with bare
jax.export. Executed with nbclient so the committed notebook carries
real outputs.

    python scripts/build_serving_notebook.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def md(src: str):
    return nbformat.v4.new_markdown_cell(src.strip())


def code(src: str):
    return nbformat.v4.new_code_cell(src.strip())


CELLS = [
    md("""
# Serving guide: scoring, retrieval, and the StableHLO artifact

Serving is beyond the reference's scope (its prd lists it as a
non-goal); this framework treats it as first-class. Everything below
reuses the FITTED training pipeline — same encoders, same packed
layout, same compiled forward — so there is no training/serving skew
by construction. Companion doc: `docs/SERVING.md`.
"""),
    code("""
# Run anywhere: force CPU so the notebook works without a TPU attached.
# (On this repo's TPU workspace the axon plugin ignores JAX_PLATFORMS,
# so we go through jax.config before the backend initializes.)
import jax
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
import sys, pathlib
sys.path.insert(0, str(pathlib.Path.cwd().parent))
"""),
    md("""
## Train a small model

A 2-epoch DeepFM on generated ML-100K-format data — enough to have a
fitted pipeline and a best checkpoint to serve.
"""),
    code("""
import tempfile
from deepfm_tpu.config import config_from_dict
from deepfm_tpu.data.movielens import MovieLensAdapter
from deepfm_tpu.data.packing import pack_schema
from deepfm_tpu.data.synthetic import generate_movielens_like
from deepfm_tpu.models import create_model
from deepfm_tpu.training.trainer import Trainer
from deepfm_tpu.utils.export import serving_config

data_dir = tempfile.mkdtemp(prefix="mlserve_")
out_dir = tempfile.mkdtemp(prefix="mlserve_out_")
generate_movielens_like(data_dir, num_users=120, num_items=150,
                        num_rows=8000, seed=7)
# serving_config: kernel-free, logical tables — the exported artifact
# must not contain Mosaic custom calls, so build the model the way the
# `export` CLI command does (on any backend, including TPU)
cfg = serving_config(config_from_dict({
    "output_dir": out_dir,
    "data": {"data_dir": data_dir, "num_neg_train": 2, "num_neg_eval": 25},
    "feature": {"fm_embed_dim": 8},
    "dnn": {"hidden_units": [32, 16], "dropout": 0.0},
    "training": {"batch_size": 1024, "num_epochs": 2},
}))
adapter = MovieLensAdapter(cfg.data, seed=cfg.seed)
schema, train_ds, val_ds, test_ds = adapter.build()
packed = pack_schema(schema)
model = create_model("deepfm", packed, cfg)
trainer = Trainer(model, packed, cfg, train_ds.pack(packed),
                  val_ds.pack(packed), test_ds.pack(packed),
                  adapter=adapter)
best = trainer.train()
trainer.load_best()  # serve the BEST checkpoint, not the last epoch
{k: round(v, 4) for k, v in best.items() if k in ("auc", "logloss")}
"""),
    md("""
## Batch scoring

`adapter.score_interactions` transforms ANY u.data-format file with the
fitted encoders; `Trainer.predict` runs the compiled eval scan (one
dispatch per staged chunk, one host fetch). The `predict` CLI command
wraps exactly this.
"""),
    code("""
ds, kept, total = adapter.score_interactions(f"{data_dir}/u.data")
scores = trainer.predict(ds.pack(packed))
print(f"scored {len(scores)}/{total} rows; "
      f"mean={scores.mean():.4f}, std={scores.std():.4f}")
scores[:5]
"""),
    md("""
## Top-K retrieval

One user crossed with every unseen catalog item, scored, ranked — the
`recommend` CLI command.
"""),
    code("""
import numpy as np
uid = int(adapter._uid_raw[0])
cand, item_ids = adapter.recommend_candidates(uid)
cand_scores = trainer.predict(cand.pack(packed))
top = np.argsort(-cand_scores)[:5]
print(f"user {uid}: {len(item_ids)} unseen candidates")
for rank, i in enumerate(top, 1):
    print(f"  {rank}. item {int(item_ids[i])}  p={cand_scores[i]:.4f}")
"""),
    md("""
## The deployment artifact

`jax.export` packages the fitted scoring function into ONE StableHLO
blob: parameters baked in, symbolic batch dimension, optional
multi-platform lowering. The `export` CLI round-trip-verifies before
reporting success; here we do it by hand.
"""),
    code("""
from deepfm_tpu.utils.export import (export_scoring, save_scoring,
                                     serving_config)

artifact = f"{out_dir}/deepfm.stablehlo"
exported = export_scoring(model, trainer.state.params,
                          trainer.state.batch_stats,
                          packed.num_slots, packed.num_dense)
n = save_scoring(artifact, exported)
print(f"{n:,} bytes; in_avals={exported.in_avals}; "
      f"platforms={exported.platforms}")
"""),
    md("""
The consumer needs ONLY `jax.export` — no deepfm_tpu import, no config,
no checkpoint machinery — and one artifact serves any batch size:
"""),
    code("""
from jax import export as jax_export

scorer = jax_export.deserialize(open(artifact, "rb").read())
for b in (3, 64):
    ids = np.asarray(ds.pack(packed).ids[:b], np.int32)
    dense = np.asarray(ds.pack(packed).dense[:b], np.float32)
    probs = np.asarray(scorer.call(ids, dense))
    print(f"batch {b}: {probs[:3].round(4)} ...")
# bit-for-bit against the in-process path
ref = trainer.predict(ds.pack(packed))[:64]
print("max |artifact - in-process| =",
      float(np.abs(np.asarray(scorer.call(
          np.asarray(ds.pack(packed).ids[:64], np.int32),
          np.asarray(ds.pack(packed).dense[:64], np.float32))) - ref).max()))
"""),
    md("""
## int8 quantization

Per-row-scaled int8 tables (scale = max|row|/127), dequantized after
the gather; XLA dead-code-eliminates the f32 tables from the program so
the size cut is structural. On production vocab the tables ARE the
artifact (~3.2x smaller); quality is measured, not assumed — the
committed full-protocol A/B (`outputs/quantized_export_quality/`) shows
AUC within 2e-5 of f32.
"""),
    code("""
from deepfm_tpu.utils.export import quantized_scoring_model

qmodel = quantized_scoring_model(cfg, packed, trainer.state.params)
q_art = f"{out_dir}/deepfm_int8.stablehlo"
nq = save_scoring(q_art, export_scoring(
    qmodel, trainer.state.params, trainer.state.batch_stats,
    packed.num_slots, packed.num_dense))
qscorer = jax_export.deserialize(open(q_art, "rb").read())
qp = np.asarray(qscorer.call(
    np.asarray(ds.pack(packed).ids[:256], np.int32),
    np.asarray(ds.pack(packed).dense[:256], np.float32)))
fp = trainer.predict(ds.pack(packed))[:256]
print(f"f32 {n:,} B vs int8 {nq:,} B; max |Δp| = {np.abs(qp-fp).max():.4f}")
"""),
    md("""
## Where to go next

* `docs/SERVING.md` — the full deployment guide (calibration metrics,
  checkpoint portability, CLI equivalents of every step above).
* `examples/export_serving.py` — proves artifact self-containment by
  scoring from a subprocess with the `deepfm_tpu` import blocked.
* `python bench.py --inference` — forward-only throughput on TPU.
"""),
]


def main() -> None:
    nb = nbformat.v4.new_notebook()
    nb.metadata = {
        "kernelspec": {
            "display_name": "Python 3",
            "language": "python",
            "name": "python3",
        },
        "language_info": {"name": "python", "version": "3.13"},
    }
    nb.cells = CELLS
    client = NotebookClient(
        nb, timeout=1800, resources={"metadata": {"path": str(ROOT / "notebooks")}}
    )
    client.execute()
    # scrub environment noise (XLA compile-cache machine-mismatch
    # warnings on this workspace) from the committed outputs
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        cell.outputs = [
            o for o in cell.outputs
            if "cpu_aot_loader" not in (o.get("text") or "")
        ]
    out = ROOT / "notebooks" / "serving_guide.ipynb"
    nbformat.write(nb, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
