"""Serving export: serialize the fitted scoring function to StableHLO.

``jax.export`` packages the jitted predict path (sigmoid probabilities)
into a single self-contained artifact: the fitted parameters are baked
in as constants, the batch dimension is symbolic (one artifact serves
any batch size), and the lowering can target several platforms at once
(``cpu`` for canary hosts, ``tpu`` for the fleet). A consumer needs
only ``jax.export.deserialize`` — no model code, config, checkpoint
machinery, or Python class definitions.

Serving is out of the reference's scope (reference prd.md:23-27); this
extends the batch-scoring path (``Trainer.predict``,
``cli.py::predict_command``) with a deployable artifact, mirroring what
TorchScript/ONNX export would be for the reference's torch models.

The exported function is the PLAIN XLA forward: the export entry point
rebuilds the model with every Pallas kernel disabled and the logical
table layout (``serving_config``), because Mosaic custom calls do not
serialize portably and the packed layout is a training-side storage
optimization. Cross-layout checkpoint restore (utils/layout.py) makes
this transparent to the caller.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable

import numpy as np

__all__ = [
    "serving_config",
    "export_scoring",
    "save_scoring",
    "load_scoring",
    "quantize_embedding_tables",
    "quantized_scoring_model",
]


def serving_config(config):
    """A copy of ``config`` suitable for a portable export.

    Pallas kernels off (their Mosaic custom calls are not portable
    StableHLO), logical table layout (the packed layout's gather is a
    kernel-path optimization), no mesh (the artifact is single-program;
    data-parallel serving shards batches outside the artifact).
    """
    return dataclasses.replace(
        config,
        pallas=dataclasses.replace(
            config.pallas,
            use_embedding_kernel=False,
            use_cin_kernel=False,
            use_attention_kernel=False,
            use_grad_kernel=False,
            table_layout="logical",
        ),
        mesh=dataclasses.replace(config.mesh, data_axis=1, model_axis=1),
    )


def quantize_embedding_tables(params) -> dict[int, tuple]:
    """Per-row symmetric int8 quantization of the embedding tables.

    Returns ``{width+1: (q int8 (rows, w), scale f32 (rows,))}`` — one
    entry per lookup group (groups have unique widths, so the table's
    second dimension identifies it). Per-ROW scales because rows are
    gathered independently at serving time: the dequantized row is
    ``q * scale`` and the worst-case elementwise error is scale/2,
    i.e. max|row|/254. Row 0 (the OOV/padding row) is all-zero by the
    table invariant and quantizes to exact zeros.

    Storage: width-17 f32 rows are 68 B; int8 + scale is 21 B — 3.2x
    smaller, which is the dominant term of a CTR serving artifact.
    """
    qtabs: dict[int, tuple] = {}
    for name, p in params["embedding"].items():
        if not name.startswith("table_w"):
            continue
        t = np.asarray(p, np.float32)
        amax = np.abs(t).max(axis=1)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(t / scale[:, None]), -127, 127).astype(np.int8)
        qtabs[t.shape[1]] = (q, scale)
    return qtabs


def quantized_scoring_model(config, packed, params):
    """Rebuild the serving model with int8 table lookups.

    The returned model shares ``params``' tree structure — the f32
    tables are still DECLARED (so ``model.apply(params, ...)`` works
    unchanged) but the injected lookup ignores them and gathers from
    the closed-over (int8, scale) pair instead, so XLA dead-code
    eliminates the f32 constants from the exported program: the
    artifact carries only the quantized tables.
    """
    import jax.numpy as jnp

    from deepfm_tpu.models import create_model
    from deepfm_tpu.utils.layout import convert_table_tree

    # Accept packed-layout trainer params: quantization reads the
    # logical view (the packed (phys, 128) leaf would mis-key qtabs by
    # physical width). The caller's own params pass through apply()
    # untouched either way — the injected lookup never reads the f32
    # table leaf, so its layout is irrelevant at trace time.
    params = convert_table_tree(params, packed, to_packed=False)
    qtabs = quantize_embedding_tables(params)

    def qlookup(table, flat_ids):
        q, scale = qtabs[table.shape[1]]
        rows = jnp.asarray(q)[flat_ids].astype(jnp.float32)
        return rows * jnp.asarray(scale)[flat_ids][:, None]

    return create_model(
        config.model_name, packed, serving_config(config), lookup_fn=qlookup
    )


def export_scoring(
    model,
    params,
    batch_stats,
    num_slots: int,
    num_dense: int,
    *,
    platforms: tuple[str, ...] | None = None,
    batch_size: int | None = None,
):
    """Export ``model``'s predict method as a ``jax.export.Exported``.

    The returned object's calling convention is
    ``(ids int32[b, num_slots], dense float32[b, num_dense]) ->
    probs float32[b]`` where ``b`` is symbolic unless ``batch_size``
    pins it (some serving runtimes want a static program).

    Parameters are embedded as constants — the artifact is
    self-contained, at the cost of its size scaling with the embedding
    tables (that IS the serving artifact's payload).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    variables: dict[str, Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # Pull the whole tree to host numpy first: closed-over device arrays
    # would pin the export to the originating backend's transfer path
    # (and a wedged remote device would hang serialization).
    variables = jax.tree_util.tree_map(np.asarray, variables)

    def score(ids, dense):
        return model.apply(variables, ids, dense, method=model.predict)[:, 0]

    if batch_size is None:
        shape = jax_export.symbolic_shape(f"b, {num_slots}")
        ids_aval = jax.ShapeDtypeStruct(shape, jnp.int32)
        dense_aval = jax.ShapeDtypeStruct((shape[0], num_dense), jnp.float32)
    else:
        ids_aval = jax.ShapeDtypeStruct((batch_size, num_slots), jnp.int32)
        dense_aval = jax.ShapeDtypeStruct(
            (batch_size, num_dense), jnp.float32
        )

    kwargs: dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(score), **kwargs)(ids_aval, dense_aval)


def save_scoring(path: str | Path, exported) -> int:
    """Write the serialized artifact; returns its size in bytes."""
    blob = exported.serialize()
    Path(path).write_bytes(blob)
    return len(blob)


def load_scoring(path: str | Path) -> Callable[..., np.ndarray]:
    """Load an exported artifact into a callable.

    Returns ``score(ids, dense) -> np.ndarray`` running the embedded
    program on the default backend. The loader needs nothing from this
    package — it is a thin convenience over ``jax.export.deserialize``.
    """
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())

    def score(ids, dense) -> np.ndarray:
        ids = np.ascontiguousarray(ids, dtype=np.int32)
        dense = np.ascontiguousarray(dense, dtype=np.float32)
        return np.asarray(exported.call(ids, dense))

    score.exported = exported  # introspection: .in_avals, .platforms, ...
    return score
