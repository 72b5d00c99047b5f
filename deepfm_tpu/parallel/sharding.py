"""Sharding specs: which arrays live where on the mesh.

Placement policy (the CTR-appropriate one, SURVEY.md §2.2):
  * embedding tables ("table_w*", "fo_table")  -> row-sharded over "model"
  * every other parameter / optimizer slot      -> replicated
  * batch arrays                                -> sharded over "data"

Optimizer state mirrors the parameter tree (Adam mu/nu), so the same
path-pattern rule shards it correctly; scalar counts stay replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfm_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL

TABLE_PARAM_PREFIXES = ("table_w", "fo_table")


def _path_names(path) -> list[str]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
    return names


def is_table_path(path) -> bool:
    return any(
        n.startswith(TABLE_PARAM_PREFIXES) for n in _path_names(path)
    )


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding tree for any parameter/opt-state pytree."""

    def spec_for(path, leaf) -> NamedSharding:
        if is_table_path(path) and getattr(leaf, "ndim", 0) >= 1:
            spec = P(AXIS_MODEL, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def batch_shardings(mesh: Mesh, tree: Any) -> Any:
    """Shard every batch array over the data axis (leading dimension)."""

    def spec_for(leaf) -> NamedSharding:
        ndim = getattr(leaf, "ndim", 1)
        return NamedSharding(mesh, P(AXIS_DATA, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(spec_for, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
