"""Trainer persistence: checkpoints, resume, and the results.json contract.

Extracted from training/trainer.py (control loop) alongside
training/steps.py (step builders). Covers:

* best-checkpoint save/load — layout-portable (packed <-> logical table
  storage converts on restore via utils/layout.py);
* true mid-training resume (params + optimizer + scheduler + history),
  with fail-fast mismatch checks (layout / fused-Adam resolution /
  scheduler type pin the optimizer-state tree structure);
* the results.json contract consumed by the `compare` command and the
  judge harness (reference analogue: deepfm/training/trainer.py:171-195,
  deepfm/utils/io.py:9-26), extended with throughput and engagement
  telemetry.

Functions take the live Trainer; the Trainer exposes thin method
wrappers so the public API is unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepfm_tpu.training.schedulers import set_lr as _set_lr
from deepfm_tpu.training.trainer import TrainState, _is_table_name
from deepfm_tpu.utils import save_results
from deepfm_tpu.utils.io import load_checkpoint, save_checkpoint

__all__ = [
    "save_best",
    "load_best",
    "save_resume",
    "try_resume",
    "recompute_table_psq",
    "save_results_file",
]



def save_best(trainer, epoch: int, best_metric: float) -> None:
    save_checkpoint(
        {
            "params": jax.device_get(trainer.state.params),
            "batch_stats": jax.device_get(trainer.state.batch_stats),
        },
        trainer.output_dir / "best_model",
    )
    save_results(
        {
            "epoch": epoch,
            "best_metric": best_metric,
            "table_layout": trainer._table_layout,
        },
        trainer.output_dir / "best_model_meta.json",
    )


def load_best(trainer) -> None:
    """Load best params/batch_stats back into the live state.

    Layout-portable: the checkpoint's embedding tables may use either
    storage layout (packed (phys, 128) vs logical (V, d+1) — e.g. a
    TPU-trained packed checkpoint evaluated on CPU, or a flipped
    pallas.table_layout). The restore detects the saved layout from
    the array shapes and converts to the live model's layout
    (utils/layout.py) before the device_put.
    """
    from deepfm_tpu.utils.layout import convert_table_tree, tree_layout

    ckpt = load_checkpoint(trainer.output_dir / "best_model")
    params = ckpt["params"]
    saved_layout = tree_layout(params, trainer.packed_schema)
    if saved_layout != trainer._table_layout:
        trainer.logger.info(
            f"Converting checkpoint tables {saved_layout} -> "
            f"{trainer._table_layout}"
        )
        params = convert_table_tree(
            params, trainer.packed_schema,
            to_packed=trainer._table_layout == "packed",
        )
    restored = {"params": params, "batch_stats": ckpt["batch_stats"]}
    if trainer.mesh is not None:
        from deepfm_tpu.parallel.sharding import state_shardings

        restored = jax.device_put(
            restored, state_shardings(trainer.mesh, restored)
        )
    else:
        restored = jax.device_put(restored)
    trainer.state = trainer.state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    recompute_table_psq(trainer)


def save_resume(
    trainer,
    epoch: int,
    best_metric: float,
    best_epoch: int,
    best_metrics: dict,
    patience_counter: int,
) -> None:
    if not trainer.config.training.resume:
        return
    ckpt = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
        "opt_state": jax.device_get(trainer.state.opt_state),
        "step": jax.device_get(trainer.state.step),
    }
    if trainer.state.table_opt is not None:
        ckpt["table_opt"] = jax.device_get(trainer.state.table_opt)
    save_checkpoint(ckpt, trainer.output_dir / "last_state")
    save_results(
        {
            "epoch": epoch,
            "best_metric": best_metric,
            "best_epoch": best_epoch,
            "best_metrics": best_metrics,
            "patience_counter": patience_counter,
            "scheduler": trainer.scheduler.state_dict(),
            "scheduler_type": type(trainer.scheduler).__name__,
            "history": trainer.history,
            # resume restores optimizer state, whose tree structure
            # depends on these two resolutions — recorded so a
            # mismatched resume fails with a clear message instead of
            # an orbax structure error
            "table_layout": trainer._table_layout,
            "fused_table_adam": trainer.fused_tables,
        },
        trainer.output_dir / "last_state_meta.json",
    )


def try_resume(trainer) -> dict | None:
    path = trainer.output_dir / "last_state"
    meta_path = trainer.output_dir / "last_state_meta.json"
    if not path.exists() or not meta_path.exists():
        return None
    import json

    meta = json.loads(meta_path.read_text())
    saved_layout = meta.get("table_layout")
    if saved_layout is not None and saved_layout != trainer._table_layout:
        raise ValueError(
            f"Cannot resume: checkpoint tables are {saved_layout} but "
            f"the model uses {trainer._table_layout} (optimizer moments "
            f"follow the table layout). Set pallas.table_layout="
            f"{saved_layout} to resume this run, or start fresh. "
            f"(best_model checkpoints DO convert across layouts — "
            f"only mid-training resume is layout-pinned.)"
        )
    saved_fused = meta.get("fused_table_adam")
    if saved_fused is not None and saved_fused != trainer.fused_tables:
        raise ValueError(
            f"Cannot resume: checkpoint was written with "
            f"fused_table_adam={saved_fused} but this run resolves it "
            f"to {trainer.fused_tables} (the optimizer state trees "
            f"differ). Match training.fused_table_adam/backend, or "
            f"start fresh."
        )
    template = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
        "opt_state": jax.device_get(trainer.state.opt_state),
        "step": jax.device_get(trainer.state.step),
    }
    if trainer.state.table_opt is not None:
        template["table_opt"] = jax.device_get(trainer.state.table_opt)
    ckpt = load_checkpoint(path, template)
    table_opt = ckpt.get("table_opt")
    if table_opt is not None:
        # moments may have been saved under a different
        # training.moments_dtype — cast to this run's storage dtype
        table_opt = jax.tree_util.tree_map(
            lambda saved, tmpl: jnp.asarray(saved).astype(tmpl.dtype),
            table_opt,
            template["table_opt"],
        )
    state = TrainState(
        params=ckpt["params"],
        batch_stats=ckpt["batch_stats"],
        opt_state=ckpt["opt_state"],
        step=jnp.asarray(ckpt["step"]),
        table_opt=table_opt,
    )
    if trainer.mesh is not None:
        from deepfm_tpu.parallel.sharding import state_shardings

        state = jax.device_put(state, state_shardings(trainer.mesh, state))
    trainer.state = state
    trainer.epoch = meta["epoch"]
    saved_sched = meta.get("scheduler_type")
    if saved_sched is not None and saved_sched != type(
        trainer.scheduler
    ).__name__:
        raise ValueError(
            f"Cannot resume: checkpoint was written with scheduler "
            f"{saved_sched} but this run uses "
            f"{type(trainer.scheduler).__name__} (their states are "
            f"incompatible). Match training.scheduler, or start fresh."
        )
    trainer.scheduler.load_state_dict(meta["scheduler"])
    trainer.history = meta.get("history", [])
    trainer.state = trainer.state.replace(
        opt_state=_set_lr(trainer.state.opt_state, trainer.scheduler.lr)
    )
    recompute_table_psq(trainer)
    trainer.logger.info(f"Resumed from epoch {meta['epoch']}")
    return meta


def recompute_table_psq(trainer) -> None:
    """Re-derive the carried sumsq(param) scalars after any restore
    that replaced the table params (the merged kernel otherwise
    keeps them current as a per-step byproduct)."""
    if not getattr(trainer, "sparse_fused", False):
        return
    psq = jax.jit(
        lambda emb: {
            name: jnp.sum(jnp.square(p))
            for name, p in emb.items()
            if _is_table_name(name)
        }
    )(trainer.state.params["embedding"])
    trainer.state = trainer.state.replace(table_psq=psq)


def save_results_file(
    trainer,
    val_metrics: dict[str, float],
    test_metrics: dict[str, float],
    best_epoch: int,
    total_epochs: int,
) -> None:
    from datetime import datetime

    from deepfm_tpu.training.telemetry import trainer_engagement

    results = {
        "run_id": trainer.output_dir.name,
        "timestamp": datetime.now().isoformat(timespec="seconds"),
        "config": trainer.config.to_dict(),
        "val_metrics": val_metrics,
        "test_metrics": test_metrics,
        "training_info": {
            "best_epoch": best_epoch,
            "total_epochs": total_epochs,
            **trainer.throughput,
            # engagement telemetry: which backward path / kernels the
            # compiled step used (silent-gating regressions like
            # round-3 49ec8b3 become visible in every artifact)
            **trainer_engagement(trainer),
        },
        "history": trainer.history,
    }
    save_results(results, trainer.output_dir / "results.json")
    trainer.logger.info(
        f"Results saved to {trainer.output_dir / 'results.json'}"
    )
