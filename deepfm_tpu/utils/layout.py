"""Embedding-table layout conversion: packed (phys, 128) <-> logical (V, d+1).

The packed storage layout (ops/pallas/packed_grad_kernel.py) keeps
``pack = 128 // dcol`` logical rows per 128-lane physical row: logical row
``r`` lives in physical row ``r // pack``, lanes
``[(r % pack) * dcol, (r % pack + 1) * dcol)``; lanes >= pack*dcol are dead
(zero). Checkpoints record which layout their tables use
(``table_layout`` in the checkpoint metadata), and restore converts
between layouts with these utilities — so a TPU-trained packed checkpoint
evaluates on CPU (logical) and vice versa, and flipping
``pallas.table_layout`` never invalidates existing checkpoints.

Host-side NumPy: conversion happens once at checkpoint load/save, never
in the hot path.
"""

from __future__ import annotations

import numpy as np

from deepfm_tpu.data.packing import PackedSchema

LANES = 128


def _pad_rows(rows: int, multiple: int = LANES) -> int:
    return -(-rows // multiple) * multiple


def table_specs(packed_schema: PackedSchema) -> dict[str, dict]:
    """Per-table layout geometry, keyed by the flax param name.

    Returns name -> {dcol, pack, total_rows, logical_shape, packed_shape}.
    Width groups whose rows are too wide to pack (dcol > 64 -> pack == 1)
    have identical layouts and need no conversion.
    """
    specs: dict[str, dict] = {}
    for group in packed_schema.lookup_groups:
        dcol = group.width + 1
        pack = LANES // dcol
        specs[f"table_w{group.width}"] = {
            "dcol": dcol,
            "pack": pack,
            "total_rows": group.total_rows,
            "logical_shape": (_pad_rows(group.total_rows), dcol),
            "packed_shape": (_pad_rows(-(-group.total_rows // pack)), LANES),
        }
    return specs


def pack_table(logical: np.ndarray, dcol: int, pack: int,
               phys_rows: int) -> np.ndarray:
    """(rows, dcol) logical table -> (phys_rows, 128) packed storage."""
    logical = np.asarray(logical)
    out = np.zeros((phys_rows, LANES), logical.dtype)
    n = min(logical.shape[0], phys_rows * pack)
    for k in range(pack):
        rows = np.arange(k, n, pack)
        out[rows // pack, k * dcol : (k + 1) * dcol] = logical[rows]
    return out


def unpack_table(packed: np.ndarray, dcol: int, pack: int,
                 logical_rows: int) -> np.ndarray:
    """(phys, 128) packed storage -> (logical_rows, dcol) logical table."""
    packed = np.asarray(packed)
    out = np.zeros((logical_rows, dcol), packed.dtype)
    n = min(logical_rows, packed.shape[0] * pack)
    for k in range(pack):
        rows = np.arange(k, n, pack)
        out[rows] = packed[rows // pack, k * dcol : (k + 1) * dcol]
    return out


def convert_table_tree(
    params: dict, packed_schema: PackedSchema, to_packed: bool
) -> dict:
    """Convert every embedding-table leaf of a params tree to the target
    layout (no-op for leaves already there). Non-table leaves pass
    through untouched; the tree is shallow-copied."""
    specs = table_specs(packed_schema)
    out = dict(params)
    emb = dict(out.get("embedding", {}))
    for name, spec in specs.items():
        if name not in emb or spec["pack"] <= 1:
            continue
        leaf = np.asarray(emb[name])
        if to_packed and leaf.shape == spec["logical_shape"]:
            emb[name] = pack_table(
                leaf, spec["dcol"], spec["pack"], spec["packed_shape"][0]
            )
        elif not to_packed and leaf.shape == spec["packed_shape"]:
            emb[name] = unpack_table(
                leaf, spec["dcol"], spec["pack"], spec["logical_shape"][0]
            )
    out["embedding"] = emb
    return out


def tree_layout(params: dict, packed_schema: PackedSchema) -> str:
    """Detect the table layout of a params tree: "packed" | "logical".

    Trees with no packable tables report "logical" (the layouts are
    identical there).
    """
    specs = table_specs(packed_schema)
    emb = params.get("embedding", {})
    for name, spec in specs.items():
        if name in emb and spec["pack"] > 1:
            shape = tuple(np.asarray(emb[name]).shape)
            if shape == spec["packed_shape"]:
                return "packed"
            if shape == spec["logical_shape"]:
                return "logical"
            raise ValueError(
                f"{name}: shape {shape} matches neither packed "
                f"{spec['packed_shape']} nor logical {spec['logical_shape']}"
            )
    return "logical"
