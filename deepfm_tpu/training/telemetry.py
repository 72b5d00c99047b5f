"""Engagement telemetry: which backward path / kernels a Trainer uses.

The trainer selects among five backward paths (plain optax chain, fused
two-pass table Adam, merged sparse backward-optimizer — replicated,
sharded, or owner-routed — and lazy_adam) through interacting gates
(optimizer, table layout, mesh shape, exchange strategy, group widths,
MAX_ROWS_F32, env overrides).  A silent gating regression already
shipped once (round-3 commit 49ec8b3: a lookup injection tripped the
"no custom lookup" gate and disabled the fused path on real TPU
backends only).  This module makes the resolved selection OBSERVABLE:

* ``trainer_engagement(trainer)`` — a JSON-ready dict recorded in
  results.json ``training_info`` and in every bench.py output line, so
  any perf number is tagged with the path that produced it.
* ``lowered_kernel_names(lowered_text)`` — ground truth from the
  lowered StableHLO on TPU backends (Mosaic kernels appear as
  ``tpu_custom_call`` payloads carrying the kernel function name); the
  on-hardware regression test asserts the gate-derived list against it.

The reference has no analogue (single fixed torch autograd path);
capability context: reference deepfm/training/trainer.py:197-242.
"""

from __future__ import annotations

import re

__all__ = [
    "trainer_engagement",
    "lowered_kernel_names",
    "expected_mosaic_kernels",
]


def _backward_path(trainer) -> str:
    mesh = trainer.mesh
    m_ax = 1 if mesh is None else mesh.shape.get("model", 1)
    if getattr(trainer, "sparse_fused", False):
        if mesh is None:
            return "sparse_fused"
        if m_ax == 1:
            return "sparse_fused_replicated"  # pure-DP mesh
        if trainer.config.mesh.embedding_strategy == "all_to_all":
            return "sparse_fused_routed"
        return "sparse_fused_sharded"
    if trainer.lazy_tables:
        return "lazy_adam"
    if trainer.fused_tables:
        return "fused_two_pass"
    return "plain_optax"


def _lookup_label(trainer) -> str:
    model = trainer.model
    strategy = trainer.config.mesh.embedding_strategy
    packed = getattr(model, "packed_tables", False)
    # a model may carry BOTH a lookup_fn and a packed factory (create_model
    # builds the pair for sharded meshes); the resolved table layout decides
    # which one the forward actually calls (ops/embedding.py)
    if packed and getattr(model, "packed_lookup_factory", None) is not None:
        return f"lookup_{strategy}_packed"
    fn = getattr(model, "lookup_fn", None)
    if fn is not None:
        name = getattr(fn, "__name__", "")
        if name == "pallas_lookup":
            return "embedding_kernel"
        if name == "sparse_grad_lookup":
            return "grad_densify"
        return f"lookup_{strategy}"
    if getattr(model, "packed_tables", False):
        return "packed_window_gather"
    return "xla_gather"


def _attention_kernel(trainer) -> str | None:
    """Which attention execution path the model will take, mirroring the
    runtime gate in ops/attention.py (f-major fused kernel when
    eligible, else the XLA tower)."""
    cfg = trainer.config
    if not cfg.pallas.use_attention_kernel:
        return None
    from deepfm_tpu.models.base import compute_dtype_of
    from deepfm_tpu.ops.pallas.attention_fmajor_kernel import fmajor_eligible

    packed = trainer.packed_schema
    f = packed.num_fields
    d = cfg.feature.fm_embed_dim
    a = cfg.attention.attention_dim
    h = cfg.attention.num_heads
    itemsize = compute_dtype_of(cfg).dtype.itemsize
    b = cfg.training.batch_size
    if fmajor_eligible(b, f, d, a, h, itemsize):
        return "attn_fmajor"
    return None  # XLA oracle tower


def trainer_engagement(trainer) -> dict:
    """JSON-ready engagement record for a constructed Trainer.

    Derived from the SAME gate results the step builder closed over
    (``trainer.sparse_fused`` / ``fused_tables`` / ``lazy_tables`` and
    the model's resolved lookup), not re-derived from config — so it
    reports what the compiled step will actually do.
    """
    kernels: list[str] = []
    lookup = _lookup_label(trainer)
    if lookup not in ("xla_gather",):
        kernels.append(lookup)

    path = _backward_path(trainer)
    if path.startswith("sparse_fused"):
        kernels.append("sparse_adam_merged")
    elif path == "fused_two_pass":
        kernels.append("fused_table_adam")
        if lookup == "grad_densify":
            pass  # densify kernel already listed via the lookup label
    model_name = trainer.config.model_name
    if model_name == "xdeepfm" and trainer.config.pallas.use_cin_kernel:
        from deepfm_tpu.ops.pallas.cin_stack_kernel import (
            cin_bf16_eligible,
            cin_stack_engaged,
        )

        cfg = trainer.config
        layer_sizes = cfg.cin.layer_sizes
        split_half = cfg.cin.split_half
        d = cfg.feature.fm_embed_dim
        bf16 = (
            cfg.pallas.cin_bf16_operands
            and cfg.training.compute_dtype == "bfloat16"
            and cin_bf16_eligible(layer_sizes, split_half, d)
        )
        # the label must track the kernel's own tile gate: at batch
        # sizes with no feasible tile (b % 128 != 0 on TPU) the factory
        # falls back to the XLA path — the round-5 on-hardware HLO
        # assertion caught the label claiming engagement there
        if cin_stack_engaged(
            layer_sizes, split_half, cfg.training.batch_size,
            trainer.packed_schema.num_fields, d, bf16,
        ):
            kernels.append("cin_stack_bf16" if bf16 else "cin_stack")
    if model_name == "attention_deepfm":
        attn = _attention_kernel(trainer)
        if attn:
            kernels.append(attn)

    mesh = trainer.mesh
    return {
        "backward": path,
        "kernels": kernels,
        "table_layout": trainer._table_layout,
        "mesh": None if mesh is None else dict(mesh.shape),
    }


# Mosaic kernel-function names each gate-derived label corresponds to in
# lowered TPU StableHLO (the pallas kernel body's __name__). Used by the
# on-hardware assertion so a label can be cross-checked against the
# compiled program.  Labels lowering to pure-XLA ops map to ().
_LABEL_TO_MOSAIC: dict[str, tuple[str, ...]] = {
    "sparse_adam_merged": ("_sparse_adam_kernel",),
    "fused_table_adam": ("_adam_kernel",),
    "grad_densify": ("_densify_kernel",),
    "embedding_kernel": ("_gather_kernel",),
    "cin_stack": ("_stack_kernel", "_stack_bwd_kernel"),
    "cin_stack_bf16": ("_stack_kernel", "_stack_bwd_kernel"),
    "attn_fmajor": ("_attn_fwd_kernel", "_attn_bwd_kernel"),
}


def expected_mosaic_kernels(engagement: dict) -> list[tuple[str, ...]]:
    """For each engaged label with a Mosaic lowering, the acceptable
    kernel-name alternatives to look for in the lowered text."""
    out = []
    for label in engagement["kernels"]:
        names = _LABEL_TO_MOSAIC.get(label)
        if names:
            out.append(names)
    return out


def lowered_kernel_names(lowered_text: str) -> set[str]:
    """Mosaic kernel function names in lowered/compiled HLO text.

    TPU backends only: pallas_call lowers to ``tpu_custom_call`` whose
    payload embeds the kernel name; interpret mode (CPU) inlines the
    body with no marker, so this returns an empty set there.
    """
    names = set(re.findall(r'"kernel_name"\s*:\s*"([^"]+)"', lowered_text))
    names |= set(re.findall(r"kernel_name\s*=\s*\\?\"([^\\\"]+)\\?\"", lowered_text))
    # Mosaic module names also appear as func.func @<name> in the payload
    names |= set(re.findall(r"func\.func public @([A-Za-z0-9_]+)", lowered_text))
    return names
