"""Routed fused sparse backward (route_sorted_pairs + trainer wiring).

At model-sharded meshes under the all_to_all strategy, the fused
backward-optimizer owner-routes the (ids, cotangent) pairs instead of
replicating them: each slab's merged kernel streams ~n·factor/m pairs
and the data-axis all-gather shrinks by the same factor, mirroring the
two-pass routed exchange. Exactness is preserved by a lax.cond fallback
to the replicated path on capacity overflow.

Covers: the routing helper's slab partitioning / sparse global-norm
term / overflow flag, the collective-bytes claim (HLO), trainer parity
vs the two-pass routed-exchange step on the SAME mesh, and the forced-
overflow fallback.
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from conftest import make_synth_batch, make_synth_schema  # noqa: E402

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import pack_features, pack_schema  # noqa: E402
from deepfm_tpu.models import create_model  # noqa: E402
from deepfm_tpu.parallel import build_mesh  # noqa: E402
from deepfm_tpu.parallel.embedding_shard import route_sorted_pairs  # noqa: E402
from deepfm_tpu.training.trainer import Trainer  # noqa: E402


@pytest.fixture(autouse=True)
def _fused_env(monkeypatch):
    monkeypatch.setenv("DEEPFM_TPU_FORCE_FUSED_ADAM", "1")


def _cfg(tmp_path, strategy="all_to_all", **training):
    tr = {"batch_size": 32, "num_epochs": 2, "scheduler": "none"}
    tr.update(training)
    return config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "pallas": {"table_layout": "packed"},
            "mesh": {"embedding_strategy": strategy},
            "training": tr,
        }
    )


def _dense_oracle(ids, ct, rows_total):
    g = np.zeros((rows_total, ct.shape[1]), np.float64)
    np.add.at(g, ids, ct.astype(np.float64))
    return g


class TestRouteSortedPairs:
    def _route(self, mesh, rows_log, ids, ct, factor=1.5):
        fn = route_sorted_pairs(mesh, rows_log, capacity_factor=factor)
        return jax.jit(fn)(jnp.asarray(ids), jnp.asarray(ct))

    def test_slab_partition_reconstructs_dense_grad(self):
        """Per-slab routed pairs scatter to the slab slice of the global
        dense gradient; the psum'd ssq equals the dense sumsq."""
        dp, m = 2, 4
        mesh = build_mesh(dp, m)
        rows_log, d, n = 64, 17, 256
        rng = np.random.default_rng(0)
        ids = rng.integers(0, rows_log * m, n).astype(np.int32)
        ct = rng.normal(size=(n, d)).astype(np.float32)

        sids, ctsT, ssq, ovf = self._route(mesh, rows_log, ids, ct)
        sids = np.asarray(sids)
        cts = np.asarray(ctsT).T  # (m*dp*cap, d)
        blk = sids.shape[0] // m

        oracle = _dense_oracle(ids, ct, rows_log * m)
        for k in range(m):
            got = _dense_oracle(
                np.clip(sids[k * blk : (k + 1) * blk], 0, rows_log - 1),
                cts[k * blk : (k + 1) * blk],
                rows_log,
            )
            np.testing.assert_allclose(
                got, oracle[k * rows_log : (k + 1) * rows_log],
                rtol=1e-5, atol=1e-6,
            )
        want_ssq = float(np.sum(oracle**2))
        assert float(ssq) == pytest.approx(want_ssq, rel=1e-5)
        if ovf is not None:
            assert not bool(ovf)

    def test_overflow_flag_on_skew(self):
        """All ids on one slab with a tight capacity raises ovf."""
        dp, m = 2, 4
        mesh = build_mesh(dp, m)
        rows_log, d, n = 64, 17, 256
        rng = np.random.default_rng(1)
        ids = rng.integers(0, rows_log, n).astype(np.int32)  # slab 0 only
        ct = rng.normal(size=(n, d)).astype(np.float32)
        _, _, _, ovf = self._route(mesh, rows_log, ids, ct, factor=0.25)
        assert ovf is not None and bool(ovf)

    def test_static_fit_disables_overflow(self):
        """capacity >= n_loc: ovf is statically None (no cond built)."""
        dp, m = 2, 4
        mesh = build_mesh(dp, m)
        ids = np.arange(64, dtype=np.int32)
        ct = np.ones((64, 5), np.float32)
        _, _, _, ovf = self._route(mesh, 64, ids, ct, factor=8.0)
        assert ovf is None

    def test_allgather_bytes_shrink(self):
        """The routed exchange's largest all-gather moves the capacity
        bucket, not the full pair stream."""
        from deepfm_tpu.utils.hlo import collective_inventory

        dp, m = 2, 4
        mesh = build_mesh(dp, m)
        rows_log, d, n = 64, 17, 4096
        fn = route_sorted_pairs(mesh, rows_log)
        hlo = (
            jax.jit(fn)
            .lower(
                jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n, d), jnp.float32),
            )
            .compile()
            .as_text()
        )
        inv = collective_inventory(hlo)["main"]
        ag_bytes = [
            b for op, (_, b) in inv.items() if "all-gather" in op
        ]
        full_ct_gather = n * d * 4  # replicated path's ct stream
        assert ag_bytes, "routing should emit a data-axis all-gather"
        assert max(ag_bytes) < full_ct_gather / 2


class TestTrainerRoutedParity:
    @pytest.mark.parametrize("dp,m", [(2, 4), (4, 2)])
    def test_routed_fused_matches_two_pass_same_mesh(self, tmp_path, dp, m):
        """all_to_all strategy, m>1 mesh: the routed fused step must
        match the two-pass routed-exchange step (clip=0 keeps it
        gnorm-independent)."""
        packed, arr = _make_data()
        mesh = build_mesh(dp, m)
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / f"r{dp}x{m}{fast}",
                gradient_clip_norm=0.0,
                fused_backward=fast,
            )
            model = create_model("deepfm", packed, cfg, mesh=mesh)
            tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
            assert tr.sparse_fused is fast
            batch = tr._put_batch(
                arr.ids[:32], arr.dense[:32], arr.labels[:32],
                np.ones((32,), np.float32),
            )
            state, l1 = tr._train_step(tr.state, *batch)
            state, l2 = tr._train_step(state, *batch)
            results[fast] = (
                (float(l1), float(l2)),
                jax.device_get(state.params),
                jax.device_get(state.table_psq),
            )
        (lf, pf, psq), (ls, ps, _) = results[True], results[False]
        assert lf == pytest.approx(ls, rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(ps)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
        for name, v in psq.items():
            want = float(np.sum(np.square(pf["embedding"][name])))
            assert float(v) == pytest.approx(want, rel=1e-5)

    def test_clip_on_matches_loosely(self, tmp_path):
        """With clipping active the sparse gnorm differs from the dense
        reduce only by f32 summation order."""
        packed, arr = _make_data()
        mesh = build_mesh(2, 4)
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / f"clip{fast}",
                gradient_clip_norm=1.0,
                fused_backward=fast,
            )
            model = create_model("deepfm", packed, cfg, mesh=mesh)
            tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
            batch = tr._put_batch(
                arr.ids[:32], arr.dense[:32], arr.labels[:32],
                np.ones((32,), np.float32),
            )
            state, _ = tr._train_step(tr.state, *batch)
            results[fast] = jax.device_get(state.params)
        for a, b in zip(
            jax.tree_util.tree_leaves(results[True]),
            jax.tree_util.tree_leaves(results[False]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_forced_overflow_falls_back_exactly(self, tmp_path, monkeypatch):
        """A constant-id field overflows a tiny capacity bucket; the
        lax.cond fallback must reproduce the two-pass step anyway."""
        import deepfm_tpu.parallel.embedding_shard as es

        schema = make_synth_schema()
        packed = pack_schema(schema)
        feats, labels = make_synth_batch(schema, 64, seed=5)
        feats["item"] = np.full(64, 3, np.int64)  # every pair -> one slab
        arr = pack_features(packed, feats, labels)

        orig = es.route_sorted_pairs
        monkeypatch.setattr(
            es, "route_sorted_pairs",
            partial(orig, capacity_factor=0.05),
        )

        mesh = build_mesh(2, 4)
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / f"ovf{fast}",
                gradient_clip_norm=0.0,
                fused_backward=fast,
            )
            model = create_model("deepfm", packed, cfg, mesh=mesh)
            tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
            batch = tr._put_batch(
                arr.ids[:32], arr.dense[:32], arr.labels[:32],
                np.ones((32,), np.float32),
            )
            state, _ = tr._train_step(tr.state, *batch)
            results[fast] = jax.device_get(state.params)
        for a, b in zip(
            jax.tree_util.tree_leaves(results[True]),
            jax.tree_util.tree_leaves(results[False]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


def _make_data(n=64, seed=13):
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, n, seed=seed)
    arr = pack_features(packed, feats, labels)
    return packed, arr
