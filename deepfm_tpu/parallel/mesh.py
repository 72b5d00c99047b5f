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


def initialize_distributed(probe: bool = False, **kwargs) -> bool:
    """Initialize the multi-host JAX runtime (safe no-op single-process).

    Must run on every host of the slice BEFORE any other JAX call. On
    TPU pods ``jax.distributed.initialize()`` auto-discovers the
    coordinator from the TPU metadata; elsewhere pass
    ``coordinator_address/num_processes/process_id`` explicitly. Enabled
    from the CLI via ``mesh.multihost: true``.

    Guard semantics: with no explicit coordinator arguments and no
    multi-process environment configured (no coordinator/cluster env
    vars, not on a TPU pod), calling ``jax.distributed.initialize()``
    would hang waiting for a coordinator — so by default this returns
    False without touching the runtime. Real Cloud TPU pods, however,
    discover the coordinator via the TPU metadata server with NONE of
    the checked env vars set; ``probe=True`` (used when the user
    explicitly requested multihost) therefore attempts
    ``jax.distributed.initialize()`` anyway, bounded by a short
    ``initialization_timeout``, and reports failure instead of hanging.
    Returns True when initialization ran.
    """
    import os

    if not kwargs and not _multiprocess_env_configured(os.environ):
        if not probe:
            return False
        try:
            jax.distributed.initialize(initialization_timeout=15)
            return True
        except Exception:  # no cluster detected / no coordinator answered
            return False
    jax.distributed.initialize(**kwargs)
    return True


def _multiprocess_env_configured(env) -> bool:
    """True when the environment advertises a coordinator for
    jax.distributed.initialize() auto-discovery.

    Signals that also appear on SINGLE-host setups do not count:
    TPU_WORKER_HOSTNAMES only counts with >= 2 comma-separated hosts
    (the axon plugin setdefaults it to "localhost" on this very
    workspace), SLURM only with > 1 node, and bare worker-id variables
    (TPU_WORKER_ID / CLOUD_TPU_TASK_ID) not at all.
    """
    coordinators = (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",  # multislice
        "OMPI_MCA_orte_hnp_uri",
    )
    if any(env.get(m) for m in coordinators):
        return True
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    try:
        if int(env.get("SLURM_JOB_NUM_NODES", "1")) > 1:
            return True
    except ValueError:
        pass
    return False


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


def build_hybrid_mesh(
    num_slices: int,
    data_axis: int = -1,
    model_axis: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh spanning multiple TPU slices (DCN).

    Multi-slice topology (SURVEY.md §5.8): chips within a slice talk over
    ICI, slices talk over DCN. Model-axis collectives (the embedding
    psum/all_to_all) must ride ICI, so the "model" axis is confined to a
    single slice and DCN carries only data parallelism: the "data" axis
    factors as ``num_slices x per-slice-data`` with the slice index
    OUTERMOST, which is exactly the layout
    ``mesh_utils.create_hybrid_device_mesh`` produces.

    With ``num_slices == 1`` this is identical to :func:`build_mesh`.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % num_slices != 0:
        raise ValueError(
            f"{n} devices not divisible by {num_slices} slices"
        )
    per_slice = n // num_slices
    if model_axis <= 0:
        model_axis = 1
    if per_slice % model_axis != 0:
        raise ValueError(
            f"per-slice device count {per_slice} not divisible by "
            f"model axis {model_axis} (the model axis cannot span DCN)"
        )
    ici_data = per_slice // model_axis
    if data_axis > 0 and data_axis != ici_data * num_slices:
        raise ValueError(
            f"mesh {data_axis}x{model_axis} != {n} devices over "
            f"{num_slices} slices"
        )
    if num_slices == 1:
        return build_mesh(ici_data, model_axis, devices=devices)
    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            (ici_data, model_axis),
            (num_slices, 1),
            devices=np.asarray(devices),
        )
    except (AttributeError, ValueError, KeyError):
        # Virtual/CPU devices carry no slice_index attribute; emulate the
        # hybrid layout (slice index outermost on the data axis) by
        # grouping consecutive device blocks into slices.
        arr = (
            np.asarray(devices)
            .reshape(num_slices, ici_data, model_axis)
            .reshape(num_slices * ici_data, model_axis)
        )
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


def single_device_mesh() -> Mesh:
    return build_mesh(1, 1, devices=jax.devices()[:1])
