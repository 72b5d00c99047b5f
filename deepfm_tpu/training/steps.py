"""Jitted train-step builders: the five backward paths.

Extracted from training/trainer.py (which holds the control loop,
staging, and persistence) so the riskiest code in the package — the
backward-path eligibility matrix and the step builders it selects
among — lives in one focused module. The seams are:

* ``build_train_step(trainer)`` — returns the single jitted step
  closure the Trainer dispatches (directly or under its epoch scan).
  Reads the trainer's RESOLVED gates (``sparse_fused`` /
  ``fused_tables`` / ``lazy_tables``, set in Trainer.__init__) — it
  never re-derives eligibility.
* ``chain_second_half`` (inner) — the optax-chain tail shared by BOTH
  fused-table paths (two-pass and sparse-fused); one implementation so
  the branches cannot drift (bit-exact contract-tested at clip=0).

Paths (telemetry labels in training/telemetry.py):
  plain optax chain | fused two-pass table Adam | merged sparse
  backward-optimizer (single-device / replicated / sharded / routed) |
  lazy_adam. Reference capability analogue: the torch autograd +
  optimizer.step loop at deepfm/training/trainer.py:197-242.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from deepfm_tpu.models.base import embedding_l2_loss
from deepfm_tpu.training.trainer import _is_table_name

__all__ = ["build_train_step"]


def build_train_step(trainer):
    model = trainer.model
    tx = trainer.tx
    packed = trainer.packed_schema
    l2_reg = trainer.config.feature.embedding_l2_reg
    clip = trainer.config.training.gradient_clip_norm
    lazy = trainer.lazy_tables
    fused = trainer.fused_tables
    dropout_root = jax.random.fold_in(trainer.root_key, 0xD0)
    has_bn = bool(trainer.state.batch_stats)

    sparse_fast = trainer.sparse_fused
    table_pack = trainer._table_pack
    wd = 2.0 * l2_reg

    def chain_second_half(state, grads, table_sq):
        """The optax-chain tail shared by BOTH fused-table paths
        (two-pass and sparse-fused): decayed global norm with each
        table's sumsq(g + wd*p) supplied via ``table_sq`` (inline
        dense reduce or sparse assembly), the bit-identical clip
        decision/scale (optax.global_norm's left-fold leaf order),
        and the masked dense update with table leaves zeroed.
        Returns (new_params, new_opt, gnorm). One implementation so
        the two branches cannot drift apart (their parity is
        contract-tested bit-exactly at clip=0)."""
        emb_params = state.params["embedding"]

        def decayed(path, g):
            keys = [str(getattr(k, "key", "")) for k in path]
            if keys and keys[0] == "embedding":
                return g + wd * emb_params[keys[-1]]
            return g

        def leaf_sq(path, g):
            name = str(getattr(path[-1], "key", ""))
            if _is_table_name(name):
                return table_sq[name]
            return jnp.sum(jnp.square(decayed(path, g)))

        sq_tree = jax.tree_util.tree_map_with_path(leaf_sq, grads)
        gnorm = jnp.sqrt(sum(jax.tree_util.tree_leaves(sq_tree)))
        if clip > 0:
            trigger = gnorm < clip

            def clipped(g):
                return jnp.where(trigger, g, g / gnorm * clip)
        else:
            def clipped(g):
                return g

        nt_grads = jax.tree_util.tree_map_with_path(
            lambda path, g: (
                jnp.zeros_like(g)
                if _is_table_name(str(getattr(path[-1], "key", "")))
                else clipped(decayed(path, g))
            ),
            grads,
        )
        updates, new_opt = tx.update(
            nt_grads, state.opt_state, state.params
        )
        return optax.apply_updates(state.params, updates), new_opt, gnorm

    def sparse_fused_step(state: TrainState, ids, dense, labels, weights, dropout_key):
        # ---- fused sparse backward-optimizer: the table gradient
        # never materializes in HBM. The forward's gather moves
        # OUTSIDE the loss graph (bit-identical ops via
        # rows_override), so autodiff yields the (n, d+1) cotangent
        # stream directly; the decayed clip norm is assembled
        # sparsely; densify + decay + clip + Adam run as ONE Pallas
        # pass per table (ops/pallas/sparse_adam_kernel.py). ----
        from deepfm_tpu.ops.embedding import gather_group_rows
        from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
            sort_pairs,
            sorted_segment_sumsq,
            sparse_table_adam_packed,
        )

        emb_params = state.params["embedding"]
        gathered = gather_group_rows(
            packed,
            emb_params,
            ids,
            True,
            packed_lookup_factory=getattr(
                model, "packed_lookup_factory", None
            ),
        )
        rows_in = {k: v[0] for k, v in gathered.items()}

        def loss_fn(params, rows_dict):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            logits, mutated = model.apply(
                variables,
                ids,
                dense,
                train=True,
                rows_override=rows_dict,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            logits = logits[:, 0]
            per_row = optax.sigmoid_binary_cross_entropy(logits, labels)
            denom = jnp.maximum(jnp.sum(weights), 1.0)
            loss = jnp.sum(per_row * weights) / denom
            new_bs = mutated.get("batch_stats", state.batch_stats)
            return loss, new_bs

        (loss, new_bs), (grads, ct_dict) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, rows_in)

        # decayed global norm: non-table leaves fold exactly like
        # the two-pass path; each table's sumsq(g + wd*p) decomposes
        # as sumsq_seg(ct) + 2*wd*<ct, rows> + wd^2*sumsq(p) — the
        # rows are the forward's residuals and sumsq(p) is the
        # scalar last step's kernel emitted. Only the f32 summation
        # ORDER differs from the dense reduce (O(1e-7) relative).
        m_ax = (
            trainer.mesh.shape.get("model", 1)
            if trainer.mesh is not None
            else 1
        )
        dp_ax = (
            trainer.mesh.shape.get("data", 1)
            if trainer.mesh is not None
            else 1
        )
        # model-sharded + all_to_all strategy: owner-route the pairs
        # (mirrors the two-pass routed exchange) instead of
        # replicating them — each slab's merged kernel then streams
        # ~n·factor/m pairs, and the data all-gather shrinks by the
        # same factor. Exact fallback to the replicated path under a
        # lax.cond when a capacity bucket overflows.
        use_routed = (
            m_ax > 1
            and trainer.config.mesh.embedding_strategy == "all_to_all"
        )

        def _replicate(fids, ct):
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rep = NamedSharding(trainer.mesh, P())
            return (
                jax.lax.with_sharding_constraint(fids, rep),
                jax.lax.with_sharding_constraint(ct, rep),
            )

        sorted_cache = {}
        table_sq = {}
        for name, (rows, fids) in gathered.items():
            ct = ct_dict[name]
            # <g, p> on the still-sharded arrays (a psum of local
            # partials); computing it after replication would drag
            # the rows through the all-gather too
            dotgp = jnp.sum(ct * rows)
            if use_routed and fids.shape[0] % dp_ax == 0:
                from deepfm_tpu.parallel.embedding_shard import (
                    route_sorted_pairs,
                )

                pk = table_pack[name]
                rows_log = (
                    state.params["embedding"][name].shape[0] // m_ax
                ) * pk
                sids_r, ctsT_r, ssq_r, ovf = route_sorted_pairs(
                    trainer.mesh, rows_log
                )(fids, ct)
                if ovf is None:
                    ssq_g = ssq_r
                else:
                    # dropped pairs are missing from ssq_r too —
                    # recompute exactly from the replicated stream
                    def _exact_ssq(_, fids=fids, ct=ct):
                        f2, c2 = _replicate(fids, ct)
                        return sorted_segment_sumsq(*sort_pairs(f2, c2))

                    ssq_g = jax.lax.cond(
                        ovf, _exact_ssq, lambda _: ssq_r, 0
                    )
                sorted_cache[name] = (
                    "routed", sids_r, ctsT_r, ovf, fids, ct
                )
            else:
                if trainer.mesh is not None:
                    # replicate the (ids, ct) pairs so every
                    # replica's merged kernel applies the identical
                    # full-batch update to its table copy — one
                    # all-gather over "data" of n*(4+4*(d+1)) bytes,
                    # the same stream sparse_grad_exchange moves on
                    # the two-pass path
                    fids, ct = _replicate(fids, ct)
                sids, ctsT = sort_pairs(fids, ct)
                sorted_cache[name] = ("rep", sids, ctsT)
                ssq_g = sorted_segment_sumsq(sids, ctsT)
            table_sq[name] = (
                ssq_g
                + 2.0 * wd * dotgp
                + wd * wd * state.table_psq[name]
            )

        # grads' table leaves are structurally zero (the loss saw
        # only rows); the sparse assembly substitutes their sumsq
        new_params, new_opt, gnorm = chain_second_half(
            state, grads, table_sq
        )

        lr = state.opt_state.hyperparams["learning_rate"]
        m_axis = (
            trainer.mesh.shape.get("model", 1)
            if trainer.mesh is not None
            else 1
        )

        def slab_update(name, p, mu, nu, sids, ctsT):
            pk = table_pack[name]
            if m_axis == 1:
                return sparse_table_adam_packed(
                    p, mu, nu, sids, ctsT,
                    lr, wd, gnorm, clip, state.step, pk,
                )
            # model-sharded: each shard runs the merged kernel on
            # its slab with the GLOBAL sorted pairs shifted into
            # slab-local id space; out-of-slab ids fall outside
            # every tile's row range and contribute nothing, so no
            # filtering pass is needed. sumsq(p') partials psum
            # over "model" into the global carry.
            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            rows_log = (p.shape[0] // m_axis) * pk

            def body(p_s, mu_s, nu_s, sids_r, cts_r, lr_, gn_, st_):
                shard = jax.lax.axis_index("model")
                local = sids_r - shard * rows_log
                p2, mu2, nu2, psq = sparse_table_adam_packed(
                    p_s, mu_s, nu_s, local, cts_r,
                    lr_, wd, gn_, clip, st_, pk,
                )
                return p2, mu2, nu2, jax.lax.psum(psq, "model")

            row = P("model", None)
            return shard_map(
                body,
                mesh=trainer.mesh,
                in_specs=(row, row, row, P(), P(), P(), P(), P()),
                out_specs=(row, row, row, P()),
                check_vma=False,
            )(p, mu, nu, sids, ctsT, lr, gnorm, state.step)

        def routed_slab_update(name, p, mu, nu, sids_r, ctsT_r):
            # routed pairs arrive pre-partitioned P(model) in
            # slab-local id space — each shard's kernel streams only
            # its own ~n·factor/m block; no shifting, no filtering
            pk = table_pack[name]
            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            def body(p_s, mu_s, nu_s, sids_s, cts_s, lr_, gn_, st_):
                p2, mu2, nu2, psq = sparse_table_adam_packed(
                    p_s, mu_s, nu_s, sids_s, cts_s,
                    lr_, wd, gn_, clip, st_, pk,
                )
                return p2, mu2, nu2, jax.lax.psum(psq, "model")

            row = P("model", None)
            return shard_map(
                body,
                mesh=trainer.mesh,
                in_specs=(
                    row, row, row,
                    P("model"), P(None, "model"), P(), P(), P(),
                ),
                out_specs=(row, row, row, P()),
                check_vma=False,
            )(p, mu, nu, sids_r, ctsT_r, lr, gnorm, state.step)

        new_emb = dict(new_params["embedding"])
        new_table_opt = dict(state.table_opt)
        new_psq = dict(state.table_psq)
        for name, entry in sorted_cache.items():
            topt = state.table_opt[name]
            if entry[0] == "rep":
                _, sids, ctsT = entry
                p2, mu2, nu2, psq2 = slab_update(
                    name, emb_params[name], topt.mu, topt.nu,
                    sids, ctsT,
                )
            else:
                _, sids_r, ctsT_r, ovf, fids, ct = entry

                def _routed(_, name=name, topt=topt,
                            sids_r=sids_r, ctsT_r=ctsT_r):
                    return routed_slab_update(
                        name, emb_params[name], topt.mu, topt.nu,
                        sids_r, ctsT_r,
                    )

                if ovf is None:
                    p2, mu2, nu2, psq2 = _routed(0)
                else:
                    # capacity overflow (rare, skew-dependent):
                    # replicate + global sort + shifted-slab kernel,
                    # the exact replicated path. The _exact_ssq cond
                    # above repeats the replicate+sort — sharing it
                    # would force the no-overflow branch to emit
                    # (n,)/(d, n) dummies every step (cond branches
                    # must match shapes), a full-stream write on the
                    # COMMON path to save work on the rare one.
                    def _fallback(_, name=name, topt=topt,
                                  fids=fids, ct=ct):
                        f2, c2 = _replicate(fids, ct)
                        return slab_update(
                            name, emb_params[name],
                            topt.mu, topt.nu, *sort_pairs(f2, c2),
                        )

                    p2, mu2, nu2, psq2 = jax.lax.cond(
                        ovf, _fallback, _routed, 0
                    )
            new_emb[name] = p2
            new_table_opt[name] = type(topt)(mu=mu2, nu=nu2)
            new_psq[name] = psq2
        new_params = dict(new_params)
        new_params["embedding"] = new_emb
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
                table_opt=new_table_opt,
                table_psq=new_psq,
            ),
            loss,
        )

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, ids, dense, labels, weights):
        dropout_key = jax.random.fold_in(dropout_root, state.step)

        if sparse_fast:
            return sparse_fused_step(
                state, ids, dense, labels, weights, dropout_key
            )

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            logits, mutated = model.apply(
                variables,
                ids,
                dense,
                train=True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            logits = logits[:, 0]
            per_row = optax.sigmoid_binary_cross_entropy(logits, labels)
            denom = jnp.maximum(jnp.sum(weights), 1.0)
            loss = jnp.sum(per_row * weights) / denom
            if l2_reg > 0 and lazy:
                # lazy path only: non-table embedding params get their
                # L2 as a loss term (tables get row-wise lazy decay in
                # the sparse update). The dense-optimizer path applies
                # L2 as fused weight decay inside the optimizer chain
                # (see build_optimizer).
                loss = loss + embedding_l2_loss(
                    params, l2_reg, exclude_tables=True
                )
            new_bs = mutated.get("batch_stats", state.batch_stats)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if not lazy and not fused:
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    params=new_params,
                    batch_stats=new_bs,
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                loss,
            )

        if fused:
            # ---- fused table Adam: exact chain semantics
            # [add_decayed_weights(2*l2, emb), clip, adam] with the
            # table update in ONE Pallas pass (buffers aliased) ----
            from deepfm_tpu.ops.pallas.adam_kernel import fused_table_adam

            emb_grads = grads["embedding"]
            emb_params = state.params["embedding"]

            # two-pass variant of the shared chain tail: each
            # table's sumsq(g + wd*p) reduces inline from the DENSE
            # grad (the decayed copy is never materialized; the
            # kernel re-applies decay itself)
            table_sq = {
                name: jnp.sum(
                    jnp.square(g + wd * emb_params[name])
                )
                for name, g in emb_grads.items()
                if _is_table_name(name)
            }
            new_params, new_opt, gnorm = chain_second_half(
                state, grads, table_sq
            )

            lr = state.opt_state.hyperparams["learning_rate"]
            model_sharded = (
                trainer.mesh is not None
                and trainer.mesh.shape.get("model", 1) > 1
            )
            if model_sharded:
                # per-shard in-place slab update: shard_map partitions
                # the aliased custom call manually (GSPMD can't), so
                # the multi-chip path keeps the single-chip fusion
                # with NO table-sized collective
                try:
                    from jax import shard_map
                except ImportError:  # pragma: no cover
                    from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                def _sharded_adam(p, mu, nu, g, lr, gn, st):
                    return fused_table_adam(
                        p, mu, nu, g, lr, wd, gn, clip, st
                    )

                def table_update(p, mu, nu, g):
                    row = P("model", *([None] * (p.ndim - 1)))
                    return shard_map(
                        _sharded_adam,
                        mesh=trainer.mesh,
                        in_specs=(row,) * 4 + (P(),) * 3,
                        out_specs=(row,) * 3,
                        check_vma=False,
                    )(p, mu, nu, g, lr, gnorm, state.step)
            else:
                def table_update(p, mu, nu, g):
                    return fused_table_adam(
                        p, mu, nu, g, lr, wd, gnorm, clip, state.step
                    )

            new_emb = dict(new_params["embedding"])
            new_table_opt = dict(state.table_opt)
            for name, g in emb_grads.items():
                if not _is_table_name(name):
                    continue
                topt = state.table_opt[name]
                p2, mu2, nu2 = table_update(
                    emb_params[name], topt.mu, topt.nu, g
                )
                new_emb[name] = p2
                new_table_opt[name] = type(topt)(mu=mu2, nu=nu2)
            new_params = dict(new_params)
            new_params["embedding"] = new_emb
            return (
                state.replace(
                    params=new_params,
                    batch_stats=new_bs,
                    opt_state=new_opt,
                    step=state.step + 1,
                    table_opt=new_table_opt,
                ),
                loss,
            )

        # ---- lazy_adam: global clip + masked dense Adam + row-sparse
        # table Adam ------------------------------------------------
        from deepfm_tpu.training.sparse_opt import (
            lazy_adam_table_update,
            table_ids_for_batch,
        )

        if clip > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        else:
            scale = jnp.asarray(1.0, jnp.float32)

        emb_grads = grads["embedding"]
        dense_grads = {
            k: (
                {
                    name: (
                        jnp.zeros_like(g)
                        if _is_table_name(name)
                        else g * scale
                    )
                    for name, g in emb_grads.items()
                }
                if k == "embedding"
                else jax.tree_util.tree_map(lambda g: g * scale, v)
            )
            for k, v in grads.items()
        }

        updates, new_opt = tx.update(
            dense_grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        lr = state.opt_state.hyperparams["learning_rate"]
        tids = table_ids_for_batch(
            packed, ids, packed_tables=model.packed_tables
        )
        new_emb = dict(new_params["embedding"])
        new_table_opt = dict(state.table_opt)
        for name, row_ids in tids.items():
            new_emb[name], new_table_opt[name] = lazy_adam_table_update(
                new_emb[name],
                emb_grads[name],
                state.table_opt[name],
                row_ids,
                lr=lr,
                step=state.step,
                l2=l2_reg,
                grad_scale=scale,
            )
        new_params = dict(new_params)
        new_params["embedding"] = new_emb

        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
                table_opt=new_table_opt,
            ),
            loss,
        )

    return train_step
