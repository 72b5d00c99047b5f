"""Results + checkpoint persistence.

results.json keeps the reference comparison-harness contract (reference:
deepfm/training/trainer.py:171-195, deepfm/utils/io.py:9-26). Checkpoints are
Orbax-backed (sharding-aware, restorable across mesh shapes) and carry enough
state for true mid-training resume — which the reference cannot do (it only
reloads best weights for eval, reference: deepfm/cli.py:84-91).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


def save_results(results: dict, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=str)


def load_results(path: str | Path) -> dict:
    with open(path) as f:
        return json.load(f)


def save_checkpoint(state: dict[str, Any], path: str | Path) -> None:
    """Save a pytree checkpoint with Orbax (atomic, sharding-aware)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_checkpoint(path: str | Path, template: Any | None = None) -> dict:
    """Restore a pytree checkpoint; ``template`` guides structure/shardings."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)
