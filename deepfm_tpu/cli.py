"""CLI: train / evaluate / compare (+ synth-data, bench utilities).

Same command surface as the reference CLI (reference: deepfm/cli.py:206-261):
``python -m deepfm_tpu {train,evaluate,compare}`` with ``--config`` YAML and
``--override a.b.c=v`` dot-notation overrides. Additions: ``synth-data``
(writes an ML-100K-format synthetic dataset for zero-egress environments),
``predict`` (batch scoring), ``export`` (StableHLO serving artifact), and
first-class mesh flags via the config's ``mesh`` section.
"""

from __future__ import annotations

import argparse

from deepfm_tpu.config import ExperimentConfig, load_config
from deepfm_tpu.utils import get_logger, seed_everything


def resolve_device(config: ExperimentConfig) -> None:
    """Apply the ``device`` config knob BEFORE the JAX backend initializes.

    Mirrors the reference's device resolution (reference: deepfm/cli.py:
    16-25, "auto" -> MPS else CPU) with TPU-native semantics:
      "auto" — use the best available backend (JAX's default order);
      "cpu"  — force host CPU (debug runs; the axon TPU plugin ignores
               the JAX_PLATFORMS env var, so this must go through
               jax.config);
      "tpu"  — require a TPU backend (enforced by assert_device, which
               runs AFTER multihost init — checking here would
               initialize the backend and break
               jax.distributed.initialize()).

    This function never initializes the backend; it only validates the
    knob and applies config.
    """
    device = config.device
    if device not in ("auto", "cpu", "tpu"):
        raise ValueError(f"Unknown device {device!r}: use auto|cpu|tpu")
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def assert_device(config: ExperimentConfig) -> None:
    """Post-init check for device=tpu: fail fast when no TPU is attached.

    Separate from resolve_device because jax.default_backend()
    INITIALIZES the backend, which must not happen before
    jax.distributed.initialize() on multihost runs.
    """
    if config.device != "tpu":
        return
    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        raise RuntimeError(
            f"device=tpu requested but the JAX backend is {backend!r}"
        )


def maybe_init_multihost(config: ExperimentConfig) -> bool:
    """Initialize the multi-host runtime when mesh.multihost is set.

    Must precede every other JAX call on each host of the slice. Returns
    True when jax.distributed actually initialized. When no coordinator
    can be found — env vars absent AND the probing
    jax.distributed.initialize() attempt (which covers Cloud TPU pods'
    metadata-server discovery) failed — the default is a hard error:
    N processes silently running independent single-host trainings into
    the same output_dir is worse than stopping. Set
    mesh.allow_single_process=true to opt into the warn-and-continue
    fallback.
    """
    if not config.mesh.multihost:
        return False
    from deepfm_tpu.parallel.mesh import initialize_distributed

    if initialize_distributed(probe=True):
        return True
    if not config.mesh.allow_single_process:
        raise RuntimeError(
            "mesh.multihost=true but no coordinator could be found (no "
            "coordinator env vars; jax.distributed.initialize() probe "
            "failed). Refusing the silent single-process fallback — set "
            "mesh.allow_single_process=true to run anyway."
        )
    get_logger("deepfm_tpu").warning(
        "mesh.multihost=true but no coordinator is configured; "
        "running single-process (mesh.allow_single_process=true)"
    )
    return False


def build_runtime(config: ExperimentConfig):
    """Resolve the device mesh from the mesh config section (None =
    single device, no sharding)."""
    import jax

    from deepfm_tpu.parallel import build_hybrid_mesh, build_mesh

    n = len(jax.devices())
    if n == 1 and config.mesh.model_axis in (1, -1):
        return None
    if config.mesh.num_slices > 1:
        return build_hybrid_mesh(
            config.mesh.num_slices,
            config.mesh.data_axis,
            config.mesh.model_axis,
        )
    return build_mesh(config.mesh.data_axis, config.mesh.model_axis)


def _build_data(config: ExperimentConfig):
    from deepfm_tpu.data.packing import pack_schema
    from deepfm_tpu.data.synthetic import build_adapter

    adapter = build_adapter(config.data, seed=config.seed)
    if hasattr(adapter, "build_packed"):
        # on-disk packed dataset: memory-mapped device-layout arrays,
        # streamed chunk-by-chunk by the trainer (data/store.py)
        schema, packed, train_d, val_d, test_d = adapter.build_packed()
        return adapter, schema, packed, train_d, val_d, test_d
    schema, train_ds, val_ds, test_ds = adapter.build()
    packed = pack_schema(schema)
    return (
        adapter,
        schema,
        packed,
        train_ds.pack(packed),
        val_ds.pack(packed),
        test_ds.pack(packed),
    )


def train_command(config: ExperimentConfig) -> None:
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    logger = get_logger("deepfm_tpu", log_file=f"{config.output_dir}/train.log")
    seed_everything(config.seed)

    import jax

    logger.info(f"Devices: {jax.devices()}")
    if config.profile.debug_nans:
        jax.config.update("jax_debug_nans", True)

    logger.info("Loading and preparing data...")
    adapter, schema, packed, train_d, val_d, test_d = _build_data(config)
    logger.info(
        f"Data ready: train={len(train_d)}, val={len(val_d)}, test={len(test_d)}"
    )
    logger.info(f"Schema: {schema.field_names}")

    mesh = build_runtime(config)
    if mesh is not None:
        logger.info(f"Mesh: {dict(mesh.shape)}")
    model = create_model(config.model_name, packed, config, mesh=mesh)

    trainer = Trainer(
        model=model,
        packed_schema=packed,
        config=config,
        train_data=train_d,
        val_data=val_d,
        test_data=test_d,
        # adapter drives per-epoch train resampling; packed-dir datasets
        # have no resample (the on-disk rows ARE the distribution)
        adapter=adapter if hasattr(adapter, "resample_train") else None,
        mesh=mesh,
    )
    import jax as _jax

    n_params = sum(
        int(p.size) for p in _jax.tree_util.tree_leaves(trainer.state.params)
    )
    logger.info(f"Model: {config.model_name} ({n_params:,} parameters)")
    trainer.train()


def _restore_trainer(
    config: ExperimentConfig,
    use_mesh: bool = True,
    require: tuple[str, ...] | None = None,
):
    """Shared serving-command prologue: build the fitted data pipeline,
    the model (optionally mesh-sharded), a Trainer around it, and load
    the best checkpoint. Returns (adapter, packed, val_d, test_d,
    model, trainer). ``require=(command, *adapter_methods)`` fails
    fast — BEFORE the expensive model build + checkpoint restore — when
    the dataset's adapter lacks a needed serving capability."""
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    adapter, schema, packed, train_d, val_d, test_d = _build_data(config)
    if require is not None:
        missing = [m for m in require[1:] if not hasattr(adapter, m)]
        if missing:
            raise SystemExit(
                f"{require[0]}: dataset {config.data.dataset_name!r} has no "
                f"{'/'.join(missing)} path (movielens-format only)"
            )
    mesh = build_runtime(config) if use_mesh else None
    model = create_model(config.model_name, packed, config, mesh=mesh)
    trainer = Trainer(
        model=model,
        packed_schema=packed,
        config=config,
        train_data=val_d,  # unused outside train
        val_data=val_d,
        test_data=test_d,
        mesh=mesh,
    )
    trainer.load_best()
    return adapter, packed, val_d, test_d, model, trainer


def evaluate_command(config: ExperimentConfig) -> None:
    logger = get_logger("deepfm_tpu")
    seed_everything(config.seed)
    _, packed, val_d, test_d, model, trainer = _restore_trainer(config)
    logger.info("--- Validation ---")
    for k, v in trainer.evaluate(val_d, "val").items():
        logger.info(f"  val_{k} = {v:.4f}")
    logger.info("--- Test ---")
    for k, v in trainer.evaluate(test_d, "test").items():
        logger.info(f"  test_{k} = {v:.4f}")


def predict_command(
    config: ExperimentConfig, input_path: str, output_path: str
) -> None:
    """Batch scoring (serving): load the best checkpoint and score every
    row of a u.data-format file through the fitted pipeline, writing
    ``user \\t item \\t score`` per kept row. Rows whose raw ids have no
    metadata are dropped (logged). Serving is out of the reference's
    scope (reference prd.md:23-27); the compute path is the same
    compiled eval scan the trainer uses — one dispatch per chunk."""
    import time as _time

    import numpy as np

    logger = get_logger("deepfm_tpu")
    seed_everything(config.seed)

    adapter, packed, val_d, test_d, model, trainer = _restore_trainer(
        config, require=("predict", "score_interactions")
    )
    score_ds, kept, total = adapter.score_interactions(input_path)
    if len(kept) < total:
        logger.warning(
            "dropped %d/%d rows with unknown user/item ids",
            total - len(kept), total,
        )
    score_d = score_ds.pack(packed)

    t0 = _time.perf_counter()
    scores = trainer.predict(score_d)
    dt = _time.perf_counter() - t0

    raw = np.loadtxt(input_path, dtype=np.int64).reshape(-1, 4)[kept]
    with open(output_path, "w") as f:
        for (u, m), s in zip(raw[:, :2], scores):
            f.write(f"{u}\t{m}\t{s:.6f}\n")
    logger.info(
        "Scored %d rows in %.2fs (%.0f rows/s incl. compile) -> %s",
        len(scores), dt, len(scores) / max(dt, 1e-9), output_path,
    )


def export_command(
    config: ExperimentConfig,
    output_path: str,
    platforms: str | None,
    batch_size: int | None,
    quantize: str | None = None,
) -> None:
    """Export the best checkpoint as a self-contained StableHLO scoring
    artifact (utils/export.py): parameters baked in, symbolic batch
    dimension unless --batch-size pins it, optionally lowered for
    several platforms at once. ``--quantize int8`` swaps the embedding
    tables for per-row-scaled int8 (~3.2x smaller artifact). The
    artifact is verified against the in-process predict path before the
    command reports success."""
    import jax
    import numpy as np

    from deepfm_tpu.utils.export import (
        export_scoring,
        load_scoring,
        quantized_scoring_model,
        save_scoring,
        serving_config,
    )

    logger = get_logger("deepfm_tpu")
    seed_everything(config.seed)

    scfg = serving_config(config)
    # no mesh: the artifact is single-program; cross-layout restore
    # converts packed checkpoints to the serving model's logical tables
    _, packed, val_d, _, model, trainer = _restore_trainer(
        scfg, use_mesh=False
    )

    export_model = model
    if quantize is not None:
        if quantize != "int8":
            raise SystemExit(f"--quantize supports 'int8', got {quantize!r}")
        export_model = quantized_scoring_model(
            config, packed, trainer.state.params
        )

    plat = tuple(platforms.split(",")) if platforms else None
    exported = export_scoring(
        export_model,
        trainer.state.params,
        trainer.state.batch_stats,
        packed.num_slots,
        packed.num_dense,
        platforms=plat,
        batch_size=batch_size,
    )
    n_bytes = save_scoring(output_path, exported)
    logger.info(
        "Exported %s -> %s (%.1f MB, platforms=%s, in_avals=%s)",
        scfg.model_name, output_path, n_bytes / 1e6,
        ",".join(exported.platforms), exported.in_avals,
    )

    if jax.default_backend() in exported.platforms:
        score = load_scoring(output_path)
        k = min(len(val_d), batch_size or 256)
        ids = val_d.ids[:k]
        dense = val_d.dense[:k]
        if batch_size is not None and k < batch_size:
            # static-batch artifact: pad the verification rows with id-0
            # (OOV) rows up to the pinned batch, compare only the real k
            pad = batch_size - k
            ids = np.concatenate(
                [ids, np.zeros((pad, ids.shape[1]), np.int32)]
            )
            dense = np.concatenate(
                [dense, np.zeros((pad, dense.shape[1]), np.float32)]
            )
        f_all = trainer.predict(val_d)
        got = score(ids, dense)[:k]
        err = float(np.abs(got - f_all[:k]).max())
        logger.info("Round-trip verification on %d rows: max|Δ|=%.2e", k, err)
        tol = 0.05 if quantize else 1e-4
        if err > tol:
            raise SystemExit(f"export verification failed: max|Δ|={err}")
        if quantize and batch_size is None:
            # quality delta of the quantized tables on the val split
            from deepfm_tpu.training.metrics import compute_auc

            q_auc = compute_auc(val_d.labels, score(val_d.ids, val_d.dense))
            f_auc = compute_auc(val_d.labels, f_all)
            logger.info(
                "Quantized val AUC %.4f vs f32 %.4f (Δ=%+.4f)",
                q_auc, f_auc, q_auc - f_auc,
            )
    else:
        logger.info(
            "Round-trip verification skipped: current backend %r not in "
            "exported platforms %s", jax.default_backend(),
            exported.platforms,
        )


def recommend_command(
    config: ExperimentConfig,
    user: int,
    k: int,
    include_seen: bool,
) -> None:
    """Top-K retrieval for one user: score the full item catalog through
    the best checkpoint (the same compiled eval scan as predict) and
    print the K highest-scoring items. Serving is out of the reference's
    scope (reference prd.md:23-27)."""
    import numpy as np

    logger = get_logger("deepfm_tpu")
    seed_everything(config.seed)

    if k < 1:
        raise SystemExit(f"recommend: --k must be >= 1, got {k}")
    adapter, packed, val_d, test_d, model, trainer = _restore_trainer(
        config, require=("recommend", "recommend_candidates")
    )
    try:
        ds, item_ids = adapter.recommend_candidates(
            user, exclude_seen=not include_seen
        )
    except ValueError as e:
        raise SystemExit(f"recommend: {e}") from None
    if len(item_ids) == 0:
        raise SystemExit(f"recommend: user {user} has no unseen items")

    scores = trainer.predict(ds.pack(packed))
    top = np.argsort(-scores)[:k]
    print(f"Top-{min(k, len(top))} items for user {user}:")
    print(f"{'rank':>4}  {'item':>6}  score")
    for r, i in enumerate(top, 1):
        print(f"{r:>4}  {int(item_ids[i]):>6}  {scores[i]:.4f}")
    logger.info(
        "Scored %d candidate items for user %d", len(item_ids), user
    )


def serve_command(
    config: ExperimentConfig,
    host: str,
    port: int,
    batch_window_ms: float = 0.0,
    max_rows: int | None = None,
) -> None:
    """Local JSON-over-HTTP scoring server over the best checkpoint:
    GET /health, POST /score, GET /recommend (see deepfm_tpu/serving.py).
    Concurrent requests thread; device dispatches serialize, or coalesce
    into one dispatch when --batch-window-ms is set. Serving is out of
    the reference's scope (reference prd.md:23-27); production
    deployments should front the exported StableHLO artifact instead
    (docs/SERVING.md)."""
    from deepfm_tpu.serving import (
        DEFAULT_MAX_ROWS,
        ScoringService,
        make_http_server,
    )

    logger = get_logger("deepfm_tpu")
    seed_everything(config.seed)
    adapter, packed, _, _, model, trainer = _restore_trainer(
        config,
        require=(
            "serve", "score_id_pairs", "known_pair", "now_timestamp",
            "recommend_candidates",
        ),
    )
    service = ScoringService(
        adapter, packed, trainer, config.model_name,
        max_rows=max_rows if max_rows is not None else DEFAULT_MAX_ROWS,
        batch_window_ms=batch_window_ms,
    )
    logger.info("Compiling the eval scan (warmup)...")
    service.warmup()
    server = make_http_server(service, host, port)
    bound = server.server_address
    logger.info(
        "Serving %s on http://%s:%d  (GET /health, POST /score, "
        "GET /recommend?user=U&k=K)",
        config.model_name, bound[0], bound[1],
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
    finally:
        server.server_close()


def pack_data_command(config: ExperimentConfig, out_dir: str) -> None:
    """Convert the configured dataset into an on-disk packed directory
    (data/store.py layout): fit the adapter/transforms once, pack every
    split, write schema.json + memory-mappable .npy splits. Training can
    then use ``data.dataset_name=packed data.data_dir=<out>`` — no
    adapter/pandas work at train time, and splits stream from disk."""
    from deepfm_tpu.data.store import save_packed, save_schema

    logger = get_logger("deepfm_tpu")
    seed_everything(config.seed)
    adapter, schema, packed, train_d, val_d, test_d = _build_data(config)
    if hasattr(adapter, "resample_train"):
        logger.warning(
            "pack-data freezes ONE draw of train negatives: dataset %r "
            "resamples them per epoch when trained directly, so training "
            "from this packed directory changes the negative-sampling "
            "protocol (expect a quality delta vs direct training)",
            config.data.dataset_name,
        )

    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_schema(schema, out / "schema.json")
    for split, arrays in (
        ("train", train_d), ("val", val_d), ("test", test_d)
    ):
        save_packed(arrays, out / split)
        logger.info("%s: %d rows -> %s", split, len(arrays), out / split)
    logger.info(
        "Packed dataset written to %s (train with data.dataset_name="
        "packed data.data_dir=%s)", out, out,
    )


def _fmt(d: dict, key: str) -> str:
    v = d.get(key)
    return f"{v:.4f}" if isinstance(v, float) else "-"


def print_comparison_table(runs: list[dict]) -> None:
    """Fixed-width comparison table over results.json runs
    (reference cli.py:115-188, plus a throughput column)."""
    w_run, w_model, w_hp, w_m = 28, 18, 20, 10

    seen: set[str] = set()
    for run in runs:
        for key in run.get("test_metrics", {}):
            if key.startswith(("HR@", "NDCG@")):
                seen.add(key)
    hr = sorted(
        (k for k in seen if k.startswith("HR@")),
        key=lambda x: int(x.split("@")[1]),
    )
    ndcg = sorted(
        (k for k in seen if k.startswith("NDCG@")),
        key=lambda x: int(x.split("@")[1]),
    )
    ranking_keys = hr + ndcg
    # calibration column only when some run reports it (older
    # results.json files predate the metric)
    show_ece = any("ece" in r.get("test_metrics", {}) for r in runs)

    header = (
        "Run".ljust(w_run)
        + "Model".ljust(w_model)
        + "LR·BS·Emb".ljust(w_hp)
        + "Val AUC".rjust(w_m)
        + "Val LogL".rjust(w_m)
        + "Tst AUC".rjust(w_m)
        + "Tst LogL".rjust(w_m)
        + "".join(k.rjust(w_m) for k in ranking_keys)
        + ("Tst ECE".rjust(w_m) if show_ece else "")
        + "BstEp".rjust(w_m)
        + "Ex/s".rjust(w_m + 2)
        + "Eff".rjust(8)
    )
    sep = "-" * len(header)
    print(sep)
    print(header)
    print(sep)
    for run in runs:
        cfg = run.get("config", {})
        tc = cfg.get("training", {})
        fc = cfg.get("feature", {})
        hp = f"{tc.get('lr', '?')}·{tc.get('batch_size', '?')}·{fc.get('fm_embed_dim', '?')}"
        vm = run.get("val_metrics", {})
        tm = run.get("test_metrics", {})
        ti = run.get("training_info", {})
        eps = ti.get("examples_per_sec")
        eps_s = f"{eps:,.0f}" if isinstance(eps, (int, float)) else "-"
        eff = ti.get("scaling_efficiency")
        eff_s = f"{eff:.0%}" if isinstance(eff, (int, float)) else "-"
        if ti.get("wall_clock_is_simulation_noise") and eff_s != "-":
            # CPU-virtual-mesh wall clock: label so nobody mistakes the
            # column for a hardware measurement
            eff_s = f"~{eff_s}(sim)"
        print(
            str(run.get("run_id", "?"))[:w_run].ljust(w_run)
            + str(cfg.get("model_name", "?"))[:w_model].ljust(w_model)
            + hp[:w_hp].ljust(w_hp)
            + _fmt(vm, "auc").rjust(w_m)
            + _fmt(vm, "logloss").rjust(w_m)
            + _fmt(tm, "auc").rjust(w_m)
            + _fmt(tm, "logloss").rjust(w_m)
            + "".join(_fmt(tm, k).rjust(w_m) for k in ranking_keys)
            + (_fmt(tm, "ece").rjust(w_m) if show_ece else "")
            + str(ti.get("best_epoch", "-")).rjust(w_m)
            + eps_s.rjust(w_m + 2)
            + eff_s.rjust(8)
        )
    print(sep)


def compare_command(args) -> None:
    import json
    from pathlib import Path

    base = Path(args.dir)
    files = sorted(base.rglob("results.json"))
    if not files:
        print(f"No results.json files found under {base}")
        return
    print_comparison_table([json.loads(f.read_text()) for f in files])


def synth_data_command(args) -> None:
    from deepfm_tpu.data.synthetic import generate_movielens_like

    path = generate_movielens_like(
        args.dir,
        num_users=args.users,
        num_items=args.items,
        num_rows=args.rows,
        seed=args.seed,
    )
    print(f"Synthetic ML-100K-format dataset written to {path}")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="deepfm_tpu",
        description=(
            "TPU-native CTR prediction: DeepFM, xDeepFM, AttentionDeepFM"
        ),
    )
    sub = parser.add_subparsers(dest="command", required=True)

    for name, help_ in [
        ("train", "Train a model"),
        ("evaluate", "Evaluate a saved model"),
        ("predict", "Batch-score an interactions file (serving)"),
        ("export", "Export the best checkpoint as a StableHLO artifact"),
        ("pack-data", "Convert the configured dataset to a packed dir"),
        ("recommend", "Top-K item retrieval for a user (serving)"),
        ("serve", "JSON-over-HTTP scoring/retrieval endpoint (serving)"),
    ]:
        p = sub.add_parser(name, help=help_)
        p.add_argument("--config", required=True, help="Path to YAML config")
        p.add_argument(
            "--override",
            nargs="*",
            default=[],
            help="Override config values, e.g. training.num_epochs=10",
        )
        if name == "pack-data":
            p.add_argument(
                "--out", required=True,
                help="Output directory for the packed dataset",
            )
        if name == "recommend":
            p.add_argument(
                "--user", type=int, required=True, help="Raw user id"
            )
            p.add_argument("--k", type=int, default=10)
            p.add_argument(
                "--include-seen", action="store_true",
                help="Rank already-interacted items too",
            )
        if name == "export":
            p.add_argument(
                "--output", required=True,
                help="Artifact path (e.g. model.stablehlo)",
            )
            p.add_argument(
                "--platforms", default=None,
                help="Comma-separated lowering targets (e.g. cpu,tpu); "
                "default: the current backend only",
            )
            p.add_argument(
                "--batch-size", type=int, default=None,
                help="Pin a static batch size (default: symbolic batch)",
            )
            p.add_argument(
                "--quantize", default=None, choices=["int8"],
                help="Quantize embedding tables (per-row int8 scales; "
                "~3.2x smaller artifact)",
            )
        if name == "serve":
            p.add_argument("--host", default="127.0.0.1")
            p.add_argument("--port", type=int, default=8080)
            p.add_argument(
                "--batch-window-ms", type=float, default=0.0,
                help="coalesce concurrent /score requests arriving "
                "within this window into one device dispatch (0=off)",
            )
            p.add_argument(
                "--max-rows", type=int, default=None,
                help="max rows per /score request (default 16384)",
            )
        if name == "predict":
            p.add_argument(
                "--input", required=True,
                help="u.data-format file (user\\titem\\trating\\tts; "
                "rating may be 0 for unlabeled traffic)",
            )
            p.add_argument(
                "--output", required=True,
                help="Output TSV path (user\\titem\\tscore per kept row)",
            )

    cmp_p = sub.add_parser("compare", help="Compare experiment results")
    cmp_p.add_argument("--dir", default="outputs")

    sd = sub.add_parser(
        "synth-data", help="Generate an ML-100K-format synthetic dataset"
    )
    sd.add_argument("--dir", default="data/ml-100k-synth")
    sd.add_argument("--users", type=int, default=300)
    sd.add_argument("--items", type=int, default=400)
    sd.add_argument("--rows", type=int, default=20000)
    sd.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser(
        "synth-packed",
        help="Generate an on-disk packed Criteo-scale dataset "
        "(bounded-memory; train with data.dataset_name=packed)",
    )
    sp.add_argument("--dir", default="data/criteo-packed")
    sp.add_argument("--rows", type=int, default=1_000_000)
    sp.add_argument("--fields", type=int, default=26)
    sp.add_argument("--vocab", type=int, default=100_000)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--chunk-rows", type=int, default=1_000_000)

    args = parser.parse_args(argv)

    if args.command == "compare":
        compare_command(args)
        return
    if args.command == "synth-data":
        synth_data_command(args)
        return
    if args.command == "synth-packed":
        import dataclasses

        from deepfm_tpu.config import DataConfig
        from deepfm_tpu.data.store import write_synthetic_packed

        dcfg = dataclasses.replace(
            DataConfig(),
            dataset_name="criteo_synthetic",
            synthetic_num_rows=args.rows,
            synthetic_num_fields=args.fields,
            synthetic_vocab_size=args.vocab,
        )
        path = write_synthetic_packed(
            args.dir, dcfg, seed=args.seed, chunk_rows=args.chunk_rows
        )
        print(f"Packed synthetic dataset written to {path}")
        return

    config = load_config(args.config, args.override or None)
    resolve_device(config)  # config-only; never initializes the backend
    maybe_init_multihost(config)  # must precede every other JAX call
    assert_device(config)  # backend-touching check, post-init
    if args.command == "train":
        train_command(config)
    elif args.command == "evaluate":
        evaluate_command(config)
    elif args.command == "predict":
        predict_command(config, args.input, args.output)
    elif args.command == "export":
        export_command(
            config, args.output, args.platforms, args.batch_size,
            args.quantize,
        )
    elif args.command == "pack-data":
        pack_data_command(config, args.out)
    elif args.command == "recommend":
        recommend_command(config, args.user, args.k, args.include_seen)
    elif args.command == "serve":
        serve_command(
            config, args.host, args.port,
            batch_window_ms=args.batch_window_ms,
            max_rows=args.max_rows,
        )


if __name__ == "__main__":
    main()
