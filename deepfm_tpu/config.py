"""Dataclass-based configuration with YAML loading and dot-notation overrides.

Config surface mirrors the reference framework's experiment contract
(reference: deepfm/config.py:13-131) and extends it with TPU-native sections:
``mesh`` (device-mesh / sharding layout), ``benchmark`` (throughput harness)
and ``profile`` (jax.profiler trace capture).
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, get_args, get_origin

import yaml


@dataclass(frozen=True)
class DataConfig:
    dataset_name: str = "movielens"
    data_dir: str = "data/ml-100k"
    split_strategy: str = "temporal"
    temporal_val_ratio: float = 0.1
    temporal_test_ratio: float = 0.1
    neg_sampling_alpha: float = 0.75
    min_interactions: int = 3
    label_threshold: float = 4.0
    num_neg_train: int = 4
    num_neg_eval: int = 999
    # TPU additions: synthetic data controls (used when dataset_name is
    # "synthetic" or "criteo_synthetic"); see deepfm_tpu/data/synthetic.py.
    synthetic_num_users: int = 943
    synthetic_num_items: int = 1682
    synthetic_num_rows: int = 100_000
    synthetic_num_fields: int = 26
    synthetic_vocab_size: int = 100_000
    # Use the native C++ negative sampler when available.
    use_native_sampler: bool = True


@dataclass(frozen=True)
class FeatureConfig:
    fm_embed_dim: int = 16
    embedding_l2_reg: float = 1e-5


@dataclass(frozen=True)
class FMConfig:
    use_first_order: bool = True
    use_second_order: bool = True


@dataclass(frozen=True)
class DNNConfig:
    hidden_units: tuple[int, ...] = (256, 128, 64)
    activation: str = "relu"
    dropout: float = 0.1
    use_batch_norm: bool = True


@dataclass(frozen=True)
class CINConfig:
    layer_sizes: tuple[int, ...] = (128, 128)
    split_half: bool = True


@dataclass(frozen=True)
class AttentionConfig:
    num_heads: int = 4
    attention_dim: int = 64
    num_layers: int = 1
    use_residual: bool = True


@dataclass(frozen=True)
class TrainingConfig:
    num_epochs: int = 50
    batch_size: int = 4096
    lr: float = 1e-3
    optimizer: str = "adam"
    # "reduce_on_plateau" (reference parity), "warmup_cosine"
    # (epoch-granularity linear warmup + cosine decay), or "none".
    scheduler: str = "reduce_on_plateau"
    # Warmup length for scheduler="warmup_cosine" (epochs).
    warmup_epochs: int = 0
    early_stopping_patience: int = 5
    metric: str = "auc"
    gradient_clip_norm: float = 1.0
    ranking_ks: tuple[int, ...] = (1, 5, 10, 20)
    # TPU additions
    # "float32" or "bfloat16" compute for dense towers (params stay f32).
    compute_dtype: str = "float32"
    # Resume training from the latest checkpoint in output_dir if present.
    resume: bool = False
    # Device-memory cap for epoch staging: epochs bigger than this are
    # staged (and scanned) in equal-size chunks of whole batches.
    stage_budget_mb: int = 1024
    # Fused Pallas Adam for the embedding tables (optimizer "adam" only,
    # TPU only): one aliased in-place pass instead of XLA's multi-read
    # fusion. Exactly equivalent to the optax chain (parity-tested).
    fused_table_adam: bool = True
    # Storage dtype for the embedding tables' Adam moments ("float32" or
    # "bfloat16"). bfloat16 halves the mu/nu share of the HBM-bound Adam
    # pass (the largest single pass of the DeepFM step) at the cost of
    # 8-bit-mantissa moment quantization; params stay f32. Applies only
    # to the fused table Adam; the dense towers and lazy_adam keep f32.
    # Default bfloat16 (round 5): measured +3.7%/+2.0%/+2.4% step
    # throughput on deepfm/xdeepfm/attention (outputs/moments_step_ab)
    # with ranking-metric deltas <= 2e-4 AUC across 3 seeds
    # (outputs/moments_dtype_ab). This deviates from optax bitwise
    # parity — set "float32" to recover the optax-exact moment stream.
    moments_dtype: str = "bfloat16"
    # Fuse the table backward INTO the optimizer pass: the dense table
    # gradient never touches HBM (ops/pallas/sparse_adam_kernel.py) and
    # the decayed clip norm is assembled sparsely from the sorted
    # cotangent stream + the forward's gathered rows + the carried
    # sumsq(p). Engages at every mesh shape when fused_table_adam is
    # active and tables are packed: single-device, pure-DP (pairs
    # replicate over "data"), and model-sharded (per-slab merged kernel
    # under shard_map; under the all_to_all strategy the pairs are
    # owner-routed with an exact overflow fallback). lazy_adam or
    # logical tables keep the densify + fused-Adam two-pass path.
    fused_backward: bool = True

    def __post_init__(self):
        if self.moments_dtype not in ("float32", "bfloat16"):
            # fail at config time, not deep inside state init — and keep
            # unvetted dtypes (e.g. float16 moments were never A/B'd)
            # out of the storage path
            # ConfigError is defined below at module level; __post_init__
            # runs at construction time, after the module has loaded
            raise ConfigError(
                "training.moments_dtype must be 'float32' or 'bfloat16', "
                f"got {self.moments_dtype!r}"
            )


@dataclass(frozen=True)
class MeshConfig:
    """Logical device-mesh layout for SPMD execution.

    ``data`` x ``model`` axes; embedding tables are row-sharded over the
    ``model`` axis, the batch is sharded over ``data``, dense towers are
    replicated. Sizes of -1 mean "use all available devices on that axis"
    (model=1 by default: pure data parallelism).
    """

    data_axis: int = -1
    model_axis: int = 1
    # Embedding lookup strategy across model shards:
    #   "auto"       — gspmd decides (table sharded via NamedSharding only)
    #   "psum"       — masked local gather + psum over the model axis
    #   "all_to_all" — bucketed ID exchange (EP-style routed lookup)
    embedding_strategy: str = "psum"
    # Multi-host slice: call jax.distributed.initialize() on every host
    # before any other JAX use (auto-discovers the coordinator on TPU
    # pods). The mesh then spans all chips of all hosts.
    multihost: bool = False
    # With multihost=true but no coordinator discoverable (no env vars,
    # and the probing jax.distributed.initialize() attempt failed), the
    # default is a hard error: N processes silently training
    # independently into the same output_dir is the failure mode this
    # guards. Set true to permit the single-process fallback (a warning
    # is still logged).
    allow_single_process: bool = False
    # Multi-slice (DCN) topology: number of TPU slices the mesh spans.
    # The model axis stays inside one slice (ICI); DCN carries only the
    # outer factor of the data axis. 1 = single slice.
    num_slices: int = 1


@dataclass(frozen=True)
class PallasConfig:
    """Toggles for hand-written Pallas TPU kernels (jnp oracle otherwise).

    Measured on TPU v5e (batch 16384, 16 fields, D=16): the fused CIN stack
    is 2.9x faster forward / 1.5x in training, the fused attention block is
    3.4x faster forward — both default on. The DMA line-gather embedding
    kernel loses to XLA's native gather engine at CTR embedding widths
    (see ops/pallas/embedding_kernel.py) and stays opt-in.
    """

    use_embedding_kernel: bool = False
    use_cin_kernel: bool = True
    use_attention_kernel: bool = True
    # Sort+one-hot-matmul densification of embedding-table gradients
    # (ops/pallas/grad_kernel.py) replacing XLA's serial row scatter —
    # the dominant train-step cost at production vocab sizes (~4.7x
    # faster at 10.4M x 17, exact to f32 working precision). TPU only;
    # tables >= 2^24 rows fall back to the XLA scatter automatically.
    use_grad_kernel: bool = True
    # CIN stack kernels: feed the MXU bf16 operands (f32 accumulation
    # and f32 VPU adjoints unchanged) when the incoming activations are
    # already bfloat16 (training.compute_dtype=bfloat16). Halves operand
    # VMEM/HBM traffic and guarantees single-pass MXU matmuls; requires
    # every non-first layer's hidden height to be 16-row aligned (bf16
    # sublane tile), else the kernel silently keeps the f32 path.
    # Default ON per the round-4 hardware A/B (measured-outcome
    # protocol): kernel fwd+bwd 13.51 -> 11.50 ms, full xdeepfm train
    # step 465.1k -> 492.2k ex/s at the flagship shape.
    cin_bf16_operands: bool = True
    # Embedding-table storage layout:
    #   "auto"    — packed on TPU, logical elsewhere (the perf default)
    #   "packed"  — 128 // (d+1) logical rows per 128-lane physical row
    #               (ops/pallas/packed_grad_kernel.py): TPU gathers are
    #               latency-bound per row, so the wide physical gather is
    #               ~2-3x faster and the table gets a compact row-major
    #               layout. Composes with model-axis row sharding (the
    #               psum / all_to_all strategies have packed variants).
    #   "logical" — plain (rows, d+1) tables.
    # The resolved layout is recorded in checkpoint metadata and
    # converted on restore (utils/layout.py), so checkpoints stay
    # portable across backends and layout toggles. lazy_adam composes
    # with both layouts (on packed tables its row-sparse update
    # addresses physical rows).
    table_layout: str = "auto"


@dataclass(frozen=True)
class ProfileConfig:
    trace_dir: str = ""
    # NaN debugging (jax_debug_nans) for debug runs.
    debug_nans: bool = False


@dataclass(frozen=True)
class BenchmarkConfig:
    warmup_steps: int = 5
    measure_steps: int = 20
    log_throughput: bool = True
    # Single-chip examples/sec reference for the weak-scaling efficiency
    # column (results.json training_info.scaling_efficiency =
    # eps / (num_devices * reference_eps)). 0 = don't report efficiency.
    reference_eps: float = 0.0


@dataclass(frozen=True)
class ExperimentConfig:
    model_name: str = "deepfm"
    seed: int = 42
    device: str = "auto"
    output_dir: str = "outputs"
    data: DataConfig = field(default_factory=DataConfig)
    feature: FeatureConfig = field(default_factory=FeatureConfig)
    fm: FMConfig = field(default_factory=FMConfig)
    dnn: DNNConfig = field(default_factory=DNNConfig)
    cin: CINConfig = field(default_factory=CINConfig)
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    pallas: PallasConfig = field(default_factory=PallasConfig)
    profile: ProfileConfig = field(default_factory=ProfileConfig)
    benchmark: BenchmarkConfig = field(default_factory=BenchmarkConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


class ConfigError(ValueError):
    pass


def _coerce(value: Any, typ: Any, path: str) -> Any:
    """Coerce a raw YAML value into the annotated type, recursively."""
    if is_dataclass(typ):
        if not isinstance(value, dict):
            raise ConfigError(f"{path}: expected mapping for {typ.__name__}")
        return _from_dict(typ, value, path)
    origin = get_origin(typ)
    if origin in (list, tuple):
        if not isinstance(value, (list, tuple)):
            raise ConfigError(f"{path}: expected list, got {type(value).__name__}")
        args = get_args(typ)
        elem_t = args[0] if args else Any
        out = [_coerce(v, elem_t, f"{path}[{i}]") for i, v in enumerate(value)]
        return tuple(out) if origin is tuple else out
    if typ is float:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ConfigError(f"{path}: expected float, got {value!r}")
        return float(value)
    if typ is int:
        if isinstance(value, bool) or not isinstance(value, int):
            raise ConfigError(f"{path}: expected int, got {value!r}")
        return value
    if typ is bool:
        if not isinstance(value, bool):
            raise ConfigError(f"{path}: expected bool, got {value!r}")
        return value
    if typ is str:
        if not isinstance(value, str):
            raise ConfigError(f"{path}: expected str, got {value!r}")
        return value
    return value


def _from_dict(cls: type, raw: dict[str, Any], path: str = "") -> Any:
    """Typed construction of a dataclass tree from a nested dict."""
    known = {f.name: f for f in fields(cls)}
    unknown = set(raw) - set(known)
    if unknown:
        raise ConfigError(f"{path or cls.__name__}: unknown keys {sorted(unknown)}")
    kwargs = {}
    hints = {f.name: f.type for f in fields(cls)}
    # Resolve string annotations (from __future__ import annotations).
    import typing

    resolved = typing.get_type_hints(cls)
    for name, value in raw.items():
        typ = resolved.get(name, hints[name])
        kwargs[name] = _coerce(value, typ, f"{path}.{name}" if path else name)
    return cls(**kwargs)


def _parse_value(value: str) -> Any:
    """Parse an override string into bool/int/float/list/str."""
    low = value.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    if value.startswith("[") and value.endswith("]"):
        try:
            return ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    return value


def apply_overrides(raw: dict[str, Any], overrides: list[str]) -> dict[str, Any]:
    """Apply ``a.b.c=value`` dot-notation overrides to a nested dict in place."""
    for override in overrides:
        if "=" not in override:
            raise ConfigError(f"Override must be key=value, got {override!r}")
        key, value = override.split("=", 1)
        parts = key.strip().split(".")
        target = raw
        for part in parts[:-1]:
            target = target.setdefault(part, {})
            if not isinstance(target, dict):
                raise ConfigError(f"Override path {key!r} collides with a scalar")
        target[parts[-1]] = _parse_value(value.strip())
    return raw


def load_config(
    yaml_path: str | Path | None = None, overrides: list[str] | None = None
) -> ExperimentConfig:
    """Load an ExperimentConfig from YAML with optional dot-notation overrides.

    Mirrors the reference CLI contract (deepfm/config.py:89-110): YAML file
    plus ``key.subkey=value`` override strings with typed scalar parsing.
    """
    raw: dict[str, Any] = {}
    if yaml_path is not None:
        with open(yaml_path) as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        apply_overrides(raw, overrides)
    return _from_dict(ExperimentConfig, raw)


def config_from_dict(raw: dict[str, Any]) -> ExperimentConfig:
    return _from_dict(ExperimentConfig, raw)
