"""Training runtime: one jitted SPMD train step + host-side control loop.

Capability parity with the reference Trainer (reference:
deepfm/training/trainer.py:24-332): epoch loop with per-epoch negative
resampling, BCE-with-logits + embedding L2, Adam/AdamW/SGD,
reduce-on-plateau LR scheduling, early stopping on a validation metric,
best-checkpoint saving, final test eval and the results.json contract.

TPU-native shape: the entire step (fwd + bwd + clip + optimizer update +
batch-stat update) is ONE jitted function compiled once — static batch
shapes (padded last batch), dropout rng folded from the step counter,
learning rate injected as a dynamic hyperparameter so plateau decisions on
the host never trigger recompiles. Under a ("data", "model") mesh the same
step runs SPMD: batch sharded over "data", tables row-sharded over "model",
XLA (or the explicit shard_map strategies) inserting the collectives.

Additions over the reference: true mid-training resume (params + optimizer
+ scheduler state; the reference can only reload best weights for eval,
reference cli.py:84-91), per-epoch throughput (examples/sec) in the logs and
results.json, and optional jax.profiler traces (profile.trace_dir).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from deepfm_tpu.config import ExperimentConfig
from deepfm_tpu.ops.pallas.packed_grad_kernel import MAX_ROWS_F32
from deepfm_tpu.data.packing import PackedArrays, PackedSchema
from deepfm_tpu.models.base import CTRModel, embedding_l2_loss
from deepfm_tpu.training.metrics import (
    compute_auc,
    compute_calibration,
    compute_logloss,
    grouped_ranking_metrics,
)
from deepfm_tpu.utils import get_logger, save_results
from deepfm_tpu.utils.io import load_checkpoint, save_checkpoint


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    # lazy_adam only: per-table row-sparse Adam moments (name -> state)
    table_opt: Any = None
    # fused sparse backward only: per-table sumsq(param) carried across
    # steps (emitted by the merged kernel) so the decayed clip norm is
    # assembled without re-reading the table (name -> f32 scalar)
    table_psq: Any = None


def _is_table_name(name: str) -> bool:
    return name.startswith(("table_w", "fo_table"))


def _use_fused_table_adam(config: ExperimentConfig, mesh=None) -> bool:
    """Fused Pallas Adam for the tables: one pass, buffers aliased in
    place (ops/pallas/adam_kernel.py). Exactly equivalent to the optax
    chain (parity-tested); TPU only — the interpret-mode kernel would
    crawl on CPU. Under a model-sharded mesh the kernel runs per shard
    inside shard_map (GSPMD cannot partition the aliased custom call,
    but shard_map partitions it manually — each shard updates its own
    table slab in place, no table-sized collective); tables whose row
    count does not divide the model axis fall back to masked optax
    (checked against the real shapes in Trainer._init_state).

    DEEPFM_TPU_FORCE_FUSED_ADAM=1 forces the kernel on any backend
    (interpret mode off-TPU) — used by the multi-chip dry run and
    parity tests to execute this exact code path on a CPU mesh."""
    import os

    if not (
        config.training.optimizer == "adam"
        and config.training.fused_table_adam
    ):
        return False
    if os.environ.get("DEEPFM_TPU_FORCE_FUSED_ADAM") == "1":
        return True
    return jax.default_backend() == "tpu"


def sparse_fused_eligible(config, packed_schema, mesh=None) -> bool:
    """True when the trainer will take the fused sparse backward-
    optimizer path with DEFAULT lookups (no sharded strategy
    injection). Shared with create_model so a pure-DP mesh keeps the
    single-shard packed gather: the fast path replicates the (ids, ct)
    pairs itself, making the m=1 exchange strategies redundant."""
    if config.training.optimizer == "lazy_adam":
        return False
    if not config.training.fused_backward:
        return False
    if not _use_fused_table_adam(config, mesh):
        return False
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        return False
    from deepfm_tpu.models import resolve_table_layout

    if not resolve_table_layout(config):
        return False
    groups = packed_schema.lookup_groups
    return len(groups) > 0 and all(
        128 // (g.width + 1) > 1 and g.total_rows < MAX_ROWS_F32
        for g in groups
    )


def build_optimizer(
    config: ExperimentConfig,
    params: Any | None = None,
    mesh=None,
    fused: bool | None = None,
) -> optax.GradientTransformation:
    """Optimizer chain: global-norm clip -> Adam/AdamW/SGD(momentum 0.9).

    Wrapped in inject_hyperparams so the host can adjust the learning rate
    between epochs (reduce-on-plateau) without recompilation.

    Embedding L2 regularization (reference: deepfm/models/base.py:78-83,
    a loss term ``l2 * sum(w^2)`` over embedding params) is applied here
    as ``add_decayed_weights(2*l2)`` masked to the embedding subtree,
    BEFORE clipping — mathematically identical to the loss term's
    gradient contribution, but fused into the optimizer's elementwise
    pipeline instead of costing two extra full passes over the tables in
    the loss/backward (measured ~10ms/step at 10.4M-row scale). The
    logged train loss therefore excludes the L2 term.

    ``optimizer: lazy_adam`` keeps Adam for the dense towers (via
    optax.masked over the non-table leaves — clipping is then applied
    globally inside the train step so the clip norm still covers table
    grads) and row-sparse Adam (training/sparse_opt.py) for the embedding
    tables.
    """
    tc = config.training
    lazy = tc.optimizer == "lazy_adam"
    if fused is None:
        fused = _use_fused_table_adam(config, mesh)
    l2_reg = config.feature.embedding_l2_reg

    def emb_mask(params):
        return {
            k: jax.tree_util.tree_map(lambda _: k == "embedding", v)
            for k, v in params.items()
        }

    def make(learning_rate):
        name = "adam" if lazy else tc.optimizer
        if name == "adam":
            opt = optax.adam(learning_rate)
        elif name == "adamw":
            opt = optax.adamw(learning_rate)
        elif name == "sgd":
            opt = optax.sgd(learning_rate, momentum=0.9)
        else:
            raise ValueError(f"Unknown optimizer: {tc.optimizer}")
        if lazy or fused:
            mask = jax.tree_util.tree_map_with_path(
                lambda path, _: not any(
                    _is_table_name(str(getattr(k, "key", ""))) for k in path
                ),
                params,
            )
            return optax.masked(opt, mask)
        parts = []
        if l2_reg > 0:
            parts.append(optax.add_decayed_weights(2.0 * l2_reg, mask=emb_mask))
        if tc.gradient_clip_norm > 0:
            parts.append(optax.clip_by_global_norm(tc.gradient_clip_norm))
        parts.append(opt)
        return optax.chain(*parts)

    return optax.inject_hyperparams(make)(learning_rate=tc.lr)


from deepfm_tpu.training.schedulers import (  # noqa: E402  (re-export)
    CosineScheduler,
    PlateauScheduler,
    set_lr as _set_lr,
)


class Trainer:
    """Trains a CTR model; single-chip and multi-chip via the same jit."""

    def __init__(
        self,
        model: CTRModel,
        packed_schema: PackedSchema,
        config: ExperimentConfig,
        train_data: PackedArrays,
        val_data: PackedArrays,
        test_data: PackedArrays,
        adapter: Any | None = None,
        mesh=None,
        rng_seed: int | None = None,
    ) -> None:
        self.model = model
        self.packed_schema = packed_schema
        self.config = config
        self.train_data = train_data
        self.val_data = val_data
        self.test_data = test_data
        self.adapter = adapter
        self.mesh = mesh

        self.logger = get_logger("deepfm_tpu.trainer")
        self.output_dir = Path(config.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

        seed = config.seed if rng_seed is None else rng_seed
        self.root_key = jax.random.PRNGKey(seed)
        self.np_rng = np.random.default_rng(seed)

        self.lazy_tables = config.training.optimizer == "lazy_adam"
        self.fused_tables = _use_fused_table_adam(config, mesh)
        # Fused sparse backward-optimizer (the table gradient never
        # materializes in HBM; ops/pallas/sparse_adam_kernel.py).
        # Packed-table runs on a single device or a pure-DP mesh: with
        # tables replicated, the (ids, ct) pairs all-gather over "data"
        # (the same traffic sparse_grad_exchange moves) and every
        # replica applies the identical merged update. Model-sharded
        # strategies keep the densify + routed-exchange machinery, and
        # custom lookup injections (sharded factories) change the
        # forward this path must replicate bit-for-bit.
        _groups_ok = len(packed_schema.lookup_groups) > 0 and all(
            128 // (g.width + 1) > 1 and g.total_rows < MAX_ROWS_F32
            for g in packed_schema.lookup_groups
        )
        _msize = 1 if mesh is None else mesh.shape.get("model", 1)
        if _msize == 1:
            self.sparse_fused = (
                sparse_fused_eligible(config, packed_schema, mesh)
                and self.fused_tables
                and getattr(model, "packed_tables", False)
                and model.lookup_fn is None
                and getattr(model, "packed_lookup_factory", None) is None
            )
        else:
            # model-sharded: the strategy factory supplies the (routed /
            # psum) forward; the merged update runs per slab inside
            # shard_map on the globally sorted pairs — out-of-slab ids
            # fall outside every tile's row range and contribute nothing
            # (kernel-tested)
            self.sparse_fused = (
                self.fused_tables
                and not self.lazy_tables
                and config.training.fused_backward
                and getattr(model, "packed_tables", False)
                and getattr(model, "packed_lookup_factory", None)
                is not None
                and _groups_ok
            )
        self._table_pack = {
            f"table_w{g.width}": 128 // (g.width + 1)
            for g in packed_schema.lookup_groups
        }
        if config.training.scheduler == "warmup_cosine":
            self.scheduler: PlateauScheduler | CosineScheduler = (
                CosineScheduler(
                    lr=config.training.lr,
                    total_epochs=config.training.num_epochs,
                    warmup_epochs=config.training.warmup_epochs,
                )
            )
        else:
            self.scheduler = PlateauScheduler(
                lr=config.training.lr,
                enabled=config.training.scheduler == "reduce_on_plateau",
            )
        if config.training.scheduler not in (
            "reduce_on_plateau", "none", "warmup_cosine",
        ):
            raise ValueError(
                f"Unknown scheduler: {config.training.scheduler}"
            )

        self.state = self._init_state()
        if self.scheduler.lr != config.training.lr:
            # warmup: epoch 1 starts below the base LR
            self.state = self.state.replace(
                opt_state=_set_lr(self.state.opt_state, self.scheduler.lr)
            )
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._epoch_scan = self._build_epoch_scan()
        self._eval_scan = self._build_eval_scan()
        self.epoch = 0
        self.throughput: dict[str, float] = {}
        # per-epoch records (train loss, lr, val metrics, throughput) —
        # shipped under results.json "history" and carried across resume
        self.history: list[dict] = []

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------

    def _dummy_batch(self):
        b = self.config.training.batch_size
        packed = self.packed_schema
        ids = jnp.zeros((b, packed.num_slots), jnp.int32)
        dense = jnp.zeros((b, packed.num_dense), jnp.float32)
        return ids, dense

    def _init_state(self) -> TrainState:
        ids, dense = self._dummy_batch()
        init_key, self.root_key = jax.random.split(self.root_key)

        variables = jax.jit(
            lambda key: self.model.init(key, ids, dense, train=False)
        )(init_key)
        params = variables["params"]
        if self.fused_tables and self.mesh is not None:
            m = self.mesh.shape.get("model", 1)
            if m > 1 and any(
                p.shape[0] % m != 0
                for name, p in params["embedding"].items()
                if _is_table_name(name)
            ):
                # shard_map needs even row splits; masked optax handles
                # the ragged case (GSPMD pads under the hood)
                self.logger.warning(
                    "fused table Adam disabled: table rows do not divide "
                    "the model axis (%d)", m,
                )
                self.fused_tables = False
                self.sparse_fused = False
        self.tx = build_optimizer(
            self.config, params, self.mesh, fused=self.fused_tables
        )

        def init_fn(params):
            opt_state = self.tx.init(params)
            table_opt = None
            if self.lazy_tables or self.fused_tables:
                from deepfm_tpu.training.sparse_opt import init_table_state

                # bf16 moments apply only to the fused kernel (lazy_adam's
                # row-sparse updates keep f32 accumulators)
                mdt = None
                if self.fused_tables:
                    mdt = jnp.dtype(self.config.training.moments_dtype)
                table_opt = {
                    name: init_table_state(p, moments_dtype=mdt)
                    for name, p in params["embedding"].items()
                    if _is_table_name(name)
                }
            table_psq = None
            if self.sparse_fused:
                table_psq = {
                    name: jnp.sum(jnp.square(p))
                    for name, p in params["embedding"].items()
                    if _is_table_name(name)
                }
            return TrainState(
                params=params,
                batch_stats=variables.get("batch_stats", {}),
                opt_state=opt_state,
                step=jnp.zeros((), jnp.int32),
                table_opt=table_opt,
                table_psq=table_psq,
            )

        state = jax.jit(init_fn)(params)
        if self.mesh is not None:
            from deepfm_tpu.parallel.sharding import state_shardings

            shardings = state_shardings(self.mesh, state)
            if jax.process_count() > 1:
                # jit without a mesh produced process-local arrays; a
                # committed local array can't be device_put across
                # processes, so round-trip through the host (init is
                # deterministic per seed, identical on every process)
                # global_shape=x.shape is REQUIRED here: every process
                # holds the identical FULL array, and without it the
                # helper infers global = local x (processes spanned by
                # the sharded axis) — a model axis crossing process
                # boundaries would silently double the table rows
                state = jax.tree_util.tree_map(
                    lambda x, s: jax.make_array_from_process_local_data(
                        s,
                        np.asarray(jax.device_get(x)),
                        global_shape=np.shape(x),
                    ),
                    state,
                    shardings,
                )
            else:
                state = jax.device_put(state, shardings)
        return state

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _build_train_step(self):
        """The jitted step (training/steps.py — all five backward
        paths); selection happens via the gates resolved in __init__."""
        from deepfm_tpu.training.steps import build_train_step

        return build_train_step(self)

    def _build_eval_step(self):
        model = self.model
        has_bn = bool(self.state.batch_stats)

        @jax.jit
        def eval_step(params, batch_stats, ids, dense):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            probs = model.apply(variables, ids, dense, method=model.predict)
            return probs[:, 0]

        return eval_step

    def _put_batch(self, *arrays):
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from deepfm_tpu.parallel.sharding import batch_shardings

        shardings = batch_shardings(self.mesh, list(arrays))
        if jax.process_count() > 1:
            # every host builds the same dataset deterministically (same
            # seed), so each process holds the FULL batch and extracts
            # its addressable shards (global_shape pins that reading —
            # see the _init_state note)
            return tuple(
                jax.make_array_from_process_local_data(
                    s, np.asarray(a), global_shape=np.shape(a)
                )
                for a, s in zip(arrays, shardings)
            )
        return tuple(
            jax.device_put(a, s) for a, s in zip(arrays, shardings)
        )

    # ------------------------------------------------------------------
    # device-resident epoch staging
    #
    # Per-batch host->device transfers and per-step result fetches are
    # round trips; on remote-attached TPUs each costs real latency. The
    # whole (shuffled, padded) epoch is staged to the device ONCE as
    # (num_batches, B, ...) arrays, batches are sliced on-device, and the
    # loop synchronizes a single scalar per epoch.
    # ------------------------------------------------------------------

    def _budget_batches(self, data: PackedArrays, batch_size: int) -> int:
        """How many batches fit the staging budget (>= 1)."""
        bytes_per_batch = batch_size * (
            4 * data.ids.shape[1] + 4 * data.dense.shape[1] + 8
        )
        budget = self.config.training.stage_budget_mb * (1 << 20)
        return max(1, budget // max(bytes_per_batch, 1))

    def _chunk_plan(
        self, data: PackedArrays, batch_size: int, *, shuffle: bool,
        drop_remainder: bool,
    ):
        """Yield (num_batches, host_arrays) chunks of the (shuffled,
        padded) epoch WITHOUT staging them.

        One chunk == one scan dispatch. Small datasets fit one chunk; at
        production row counts the chunk size is capped by
        ``training.stage_budget_mb``, with all full chunks equal-sized so
        the scan compiles at most twice (full + remainder shape). Lazy:
        only the chunk being materialized holds host memory, and the
        consumer controls how many staged chunks are device-resident at
        once (see _train_epoch — at most two, regardless of epoch size).
        """
        n = len(data)
        order = np.arange(n)
        if shuffle:
            self.np_rng.shuffle(order)
        if drop_remainder and n >= batch_size:
            usable = (n // batch_size) * batch_size
            order = order[:usable]
        nb = -(-len(order) // batch_size)
        pad = nb * batch_size - len(order)
        weights = np.ones(len(order), np.float32)
        if pad:
            order = np.concatenate([order, np.zeros(pad, np.int64)])
            weights = np.concatenate([weights, np.zeros(pad, np.float32)])

        chunk_nb = max(1, min(nb, self._budget_batches(data, batch_size)))

        for start in range(0, nb, chunk_nb):
            cb = min(chunk_nb, nb - start)
            sl = order[start * batch_size : (start + cb) * batch_size]
            wl = weights[start * batch_size : (start + cb) * batch_size]
            yield cb, (
                data.ids[sl].reshape(cb, batch_size, -1),
                data.dense[sl].reshape(cb, batch_size, -1),
                data.labels[sl].reshape(cb, batch_size),
                wl.reshape(cb, batch_size),
            )

    def _stage_chunks(
        self, data: PackedArrays, batch_size: int, *, shuffle: bool,
        drop_remainder: bool,
    ) -> list[tuple[int, tuple]]:
        """Eagerly stage ALL chunks (eval path: small, cached epochs)."""
        return [
            (cb, self._put_staged(arrays))
            for cb, arrays in self._chunk_plan(
                data, batch_size, shuffle=shuffle,
                drop_remainder=drop_remainder,
            )
        ]

    def _put_staged(self, arrays):
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from deepfm_tpu.parallel.mesh import AXIS_DATA

        def sh(a):
            spec = P(None, AXIS_DATA, *([None] * (a.ndim - 2)))
            return jax.device_put(a, NamedSharding(self.mesh, spec))

        return tuple(sh(a) for a in arrays)

    @staticmethod
    @jax.jit
    def _slice_batch(staged, i):
        return tuple(a[i] for a in staged)

    def _build_epoch_scan(self):
        """One jitted dispatch for a WHOLE epoch: lax.scan over the staged
        (num_batches, B, ...) arrays.

        Per-step dispatches pay a host->device round trip each (several
        ms on remote-attached TPUs); an epoch is one compiled program with
        the step chained on-device, so the loop costs one round trip
        total. Dropout keys keep folding from the on-device step counter,
        so this is numerically identical to the per-step path.
        """
        train_step = self._train_step

        @partial(jax.jit, donate_argnums=0)
        def epoch_scan(state: TrainState, staged):
            def body(st, batch):
                ids, dense, labels, weights = batch
                st, loss = train_step(st, ids, dense, labels, weights)
                return st, loss

            state, losses = jax.lax.scan(body, state, staged)
            return state, jnp.sum(losses)

        return epoch_scan

    def _build_eval_scan(self):
        eval_step = self._eval_step

        @jax.jit
        def eval_scan(params, batch_stats, ids_all, dense_all):
            def body(_, batch):
                ids, dense = batch
                return None, eval_step(params, batch_stats, ids, dense)

            _, probs = jax.lax.scan(body, None, (ids_all, dense_all))
            return probs.reshape(-1)

        return eval_scan

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def train(self) -> dict[str, float]:
        tc = self.config.training
        best_metric = -float("inf")
        best_epoch = 0
        patience_counter = 0
        best_metrics: dict[str, float] = {}
        epoch = self.epoch

        if tc.resume:
            resumed = self._try_resume()
            if resumed:
                epoch = self.epoch
                best_metric = resumed.get("best_metric", best_metric)
                best_epoch = resumed.get("best_epoch", 0)
                best_metrics = resumed.get("best_metrics", {})
                patience_counter = resumed.get("patience_counter", 0)

        trace_dir = self.config.profile.trace_dir
        if trace_dir:
            jax.profiler.start_trace(trace_dir)

        # Per-epoch negative resampling runs on the HOST (numpy / native
        # sampler). Prefetch the next epoch's resample on a worker thread
        # so it overlaps the current epoch's device compute instead of
        # stalling the TPU between epochs. One resample per epoch in
        # order, so the adapter's rng stream is identical to the
        # synchronous sequence.
        resample_pool = None
        resample_future = None
        if self.adapter is not None and tc.num_epochs - epoch > 1:
            from concurrent.futures import ThreadPoolExecutor

            resample_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="resample"
            )

        try:
            for epoch in range(epoch + 1, tc.num_epochs + 1):
                self.epoch = epoch
                if self.adapter is not None and epoch > 1:
                    ds = (
                        resample_future.result()
                        if resample_future is not None
                        else self.adapter.resample_train()
                    )
                    resample_future = None
                    self.train_data = ds.pack(self.packed_schema)
                if resample_pool is not None and epoch < tc.num_epochs:
                    resample_future = resample_pool.submit(
                        self.adapter.resample_train
                    )

                t0 = time.perf_counter()
                train_loss, n_examples = self._train_epoch()
                dt = time.perf_counter() - t0
                eps = n_examples / max(dt, 1e-9)
                n_dev = self.mesh.size if self.mesh is not None else 1
                self.throughput = {
                    "examples_per_sec": eps,
                    "epoch_seconds": dt,
                    "num_devices": n_dev,
                    "examples_per_sec_per_device": eps / n_dev,
                }
                ref_eps = self.config.benchmark.reference_eps
                if ref_eps > 0:
                    self.throughput["scaling_efficiency"] = eps / (
                        n_dev * ref_eps
                    )

                val_metrics = self.evaluate(self.val_data, "val")
                current = val_metrics.get(
                    tc.metric, val_metrics.get("auc", 0.0)
                )

                self.logger.info(
                    f"Epoch {epoch}/{tc.num_epochs}  "
                    f"train_loss={train_loss:.4f}  "
                    f"val_auc={val_metrics.get('auc', 0):.4f}  "
                    f"val_logloss={val_metrics.get('logloss', 0):.4f}  "
                    f"lr={self.scheduler.lr:.2e}  "
                    f"ex/s={eps:,.0f}"
                )
                self.history.append(
                    {
                        "epoch": epoch,
                        "train_loss": float(train_loss),
                        "lr": float(self.scheduler.lr),
                        "epoch_seconds": dt,
                        "examples_per_sec": eps,
                        **{f"val_{k}": v for k, v in val_metrics.items()},
                    }
                )

                new_lr = self.scheduler.step(current)
                self.state = self.state.replace(
                    opt_state=_set_lr(self.state.opt_state, new_lr)
                )

                if current > best_metric:
                    best_metric = current
                    best_epoch = epoch
                    patience_counter = 0
                    best_metrics = val_metrics
                    self._save_best(epoch, best_metric)
                    self.logger.info(
                        f"  -> New best {tc.metric}={current:.4f}, saved checkpoint"
                    )
                else:
                    patience_counter += 1
                    if patience_counter >= tc.early_stopping_patience:
                        self.logger.info(
                            f"Early stopping at epoch {epoch} (no improvement "
                            f"for {tc.early_stopping_patience} epochs)"
                        )
                        break
                self._save_resume(
                    epoch, best_metric, best_epoch, best_metrics, patience_counter
                )
        finally:
            if resample_pool is not None:
                # Join any in-flight resample: the worker mutates the
                # adapter's shared numpy RNG, so letting it run past this
                # scope would shift the RNG stream under a later
                # synchronous resample in the same process.
                resample_pool.shutdown(wait=True, cancel_futures=True)
            if trace_dir:
                jax.profiler.stop_trace()

        self.logger.info("--- Final evaluation on test set ---")
        test_metrics = self.evaluate(self.test_data, "test")
        for k, v in test_metrics.items():
            self.logger.info(f"  test_{k} = {v:.4f}")

        self._save_results(best_metrics, test_metrics, best_epoch, epoch)
        return best_metrics

    def _train_epoch(self) -> tuple[float, int]:
        tc = self.config.training
        n = len(self.train_data)
        drop = n >= tc.batch_size  # keep BN stats clean of padded rows
        plan = self._chunk_plan(
            self.train_data, tc.batch_size, shuffle=True, drop_remainder=drop
        )
        # Whole epoch = one scan dispatch per chunk (usually one). Chunks
        # stage LAZILY with one-ahead prefetch: chunk i+1 is put on
        # device while chunk i's scan runs, and before staging i+1 we
        # block on chunk i-1's loss so at most TWO chunks are ever
        # device-resident — stage_budget_mb really bounds peak device
        # memory at huge-epoch scale. Single-chunk epochs keep the
        # one-sync-per-epoch fast path.
        nxt = next(plan, None)
        staged_next = self._put_staged(nxt[1]) if nxt is not None else None
        nb = 0
        losses = []
        prev_loss = None
        while nxt is not None:
            cb = nxt[0]
            staged = staged_next
            self.state, chunk_loss = self._epoch_scan(self.state, staged)
            staged = staged_next = None  # release after the scan consumes it
            nxt = next(plan, None)
            if nxt is not None:
                if prev_loss is not None:
                    # host READBACK, not block_until_ready: on the
                    # relay-attached TPU block_until_ready can report
                    # ready for unconsumed results (CLAUDE.md), which
                    # would let >2 staged chunks pile up on device
                    float(prev_loss)
                staged_next = self._put_staged(nxt[1])
            losses.append(chunk_loss)
            prev_loss = chunk_loss
            nb += cb
        total_loss = float(sum(losses))  # single sync for the tail
        n_examples = min(n, nb * tc.batch_size) if not drop else nb * tc.batch_size
        return total_loss / max(nb, 1), n_examples

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def predict(self, data: PackedArrays) -> np.ndarray:
        """Sigmoid probabilities for every row of ``data``, in order.

        The batch-scoring (serving) entry point: one scan dispatch per
        staged chunk, one host fetch. Splits larger than the staging
        budget stream chunk-by-chunk (eval memory stays bounded — the
        out-of-core contract); smaller ones stage once and cache across
        epochs. Reference capability analogue:
        model.predict over a DataLoader (reference deepfm/models/
        base.py:70-76, trainer.py:267-276), as a single compiled
        program instead of a per-batch python loop.
        """
        tc = self.config.training
        n = len(data)
        nb = -(-n // tc.batch_size)
        if nb > self._budget_batches(data, tc.batch_size):
            # Large split: STREAM chunk-by-chunk (stage -> scan -> host
            # fetch -> release) so eval device memory is bounded by one
            # stage budget — the same out-of-core contract as the train
            # path. No caching: a split this size would pin the budget.
            parts = []
            for _, arrays in self._chunk_plan(
                data, tc.batch_size, shuffle=False, drop_remainder=False
            ):
                staged = self._put_staged(arrays)
                parts.append(
                    np.asarray(
                        self._eval_scan(
                            self.state.params,
                            self.state.batch_stats,
                            staged[0],
                            staged[1],
                        )
                    )
                )
                staged = None  # release before staging the next chunk
            return np.concatenate(parts)[:n]
        cache = getattr(self, "_eval_stage_cache", None)
        if cache is None:
            cache = self._eval_stage_cache = {}
        # Keyed by id(), so each entry also pins the PackedArrays object:
        # without the strong reference a GC'd eval set could be replaced
        # by a new object at the same address and silently served stale
        # staged arrays.
        key = id(data)
        if key not in cache or cache[key][0] is not data:
            cache[key] = (
                data,
                self._stage_chunks(
                    data, tc.batch_size, shuffle=False, drop_remainder=False
                ),
            )
            if len(cache) > 4:  # bound device memory
                cache.pop(next(iter(cache)))
        else:
            # LRU, not FIFO: refresh on hit so the hottest entry (val,
            # staged first and hit every epoch) isn't the first evicted.
            cache[key] = cache.pop(key)
        # one dispatch per staged chunk (usually one) + ONE host fetch
        parts = [
            self._eval_scan(
                self.state.params, self.state.batch_stats, staged[0], staged[1]
            )
            for _, staged in cache[key][1]
        ]
        return np.asarray(
            jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        )[:n]

    def evaluate(
        self, data: PackedArrays, split_name: str = "eval"
    ) -> dict[str, float]:
        tc = self.config.training
        scores = self.predict(data)
        labels = data.labels

        metrics: dict[str, float] = {}
        try:
            metrics["auc"] = compute_auc(labels, scores)
        except ValueError:
            metrics["auc"] = 0.0
        metrics["logloss"] = compute_logloss(labels, scores)
        metrics.update(compute_calibration(labels, scores))

        if data.user_ids is not None:
            metrics.update(
                grouped_ranking_metrics(
                    data.user_ids, scores, labels, tc.ranking_ks
                )
            )
        return metrics

    # ------------------------------------------------------------------
    # persistence (training/persistence.py; thin wrappers keep the API)
    # ------------------------------------------------------------------

    @property
    def _table_layout(self) -> str:
        return "packed" if getattr(self.model, "packed_tables", False) else (
            "logical"
        )

    def _save_best(self, epoch: int, best_metric: float) -> None:
        from deepfm_tpu.training import persistence

        persistence.save_best(self, epoch, best_metric)

    def load_best(self) -> None:
        """Load best params/batch_stats back into the live state
        (layout-portable; see training/persistence.py)."""
        from deepfm_tpu.training import persistence

        persistence.load_best(self)

    def _save_resume(self, *args, **kwargs) -> None:
        from deepfm_tpu.training import persistence

        persistence.save_resume(self, *args, **kwargs)

    def _try_resume(self) -> dict | None:
        from deepfm_tpu.training import persistence

        return persistence.try_resume(self)

    def _recompute_table_psq(self) -> None:
        from deepfm_tpu.training import persistence

        persistence.recompute_table_psq(self)

    def _save_results(self, *args, **kwargs) -> None:
        from deepfm_tpu.training import persistence

        persistence.save_results_file(self, *args, **kwargs)
