"""Device-mesh construction for SPMD execution.

One logical mesh with two axes:
  "data"  — batch parallelism (DP); gradients of replicated params are
            reduced across it (XLA inserts the psum under jit).
  "model" — embedding-table row sharding (the EP/TP-shaped axis for CTR
            workloads; see SURVEY.md §5.8).

The reference framework is single-device (reference: deepfm/cli.py:16-25,
"Non-Goals: Distributed training" prd.md:25); this module is the TPU-native
capability the north star adds. Multi-host: call ``initialize_distributed``
once per process before building the mesh — the mesh then spans all chips in
the slice, with ICI carrying the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_MODEL = "model"


def initialize_distributed(**kwargs) -> None:
    """Initialize the multi-host JAX runtime.

    Must run on every host of the slice BEFORE any other JAX call. On
    TPU pods ``jax.distributed.initialize()`` auto-discovers the
    coordinator from the TPU metadata; elsewhere pass
    ``coordinator_address/num_processes/process_id`` explicitly. Enabled
    from the CLI via ``mesh.multihost: true``.
    """
    jax.distributed.initialize(**kwargs)


def build_mesh(
    data_axis: int = -1, model_axis: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh.

    ``-1`` on an axis means "all remaining devices". The product must divide
    the device count evenly.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_axis <= 0 and data_axis <= 0:
        data_axis, model_axis = n, 1
    elif model_axis <= 0:
        model_axis = n // data_axis
    elif data_axis <= 0:
        data_axis = n // model_axis
    if data_axis * model_axis != n:
        raise ValueError(
            f"mesh {data_axis}x{model_axis} != {n} available devices"
        )
    arr = mesh_utils.create_device_mesh(
        (data_axis, model_axis), devices=np.asarray(devices)
    )
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


def single_device_mesh() -> Mesh:
    return build_mesh(1, 1, devices=jax.devices()[:1])
