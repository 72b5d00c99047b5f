"""Fused sparse backward-optimizer tests (ops/pallas/sparse_adam_kernel.py).

The merged path must reproduce the two-pass (densify + fused Adam)
trainer step: same loss, same parameters, same moments — with the dense
table gradient never materializing and the decayed clip norm assembled
sparsely. Covers the kernel (vs the two-pass oracle), the segmented
sumsq helper (vs the dense reduce), the trainer A/B, the carried
sumsq(p), eligibility gating, and restore paths.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from conftest import make_synth_batch, make_synth_schema  # noqa: E402

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import pack_features, pack_schema  # noqa: E402
from deepfm_tpu.models import create_model  # noqa: E402
from deepfm_tpu.training.trainer import Trainer  # noqa: E402


@pytest.fixture(autouse=True)
def _fused_env(monkeypatch):
    monkeypatch.setenv("DEEPFM_TPU_FORCE_FUSED_ADAM", "1")


def _make_data(n=64, seed=13):
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, n, seed=seed)
    arr = pack_features(packed, feats, labels)
    return packed, arr


def _cfg(tmp_path, **training):
    tr = {"batch_size": 32, "num_epochs": 2, "scheduler": "none"}
    tr.update(training)
    return config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "pallas": {"table_layout": "packed"},
            "training": tr,
        }
    )


class TestKernel:
    def _mk(self, phys=640, pack=7, d=17, n=3000, seed=0):
        rng = np.random.default_rng(seed)
        V = phys * pack
        ids = rng.integers(0, V, n).astype(np.int32)
        ct = rng.normal(size=(n, d)).astype(np.float32) * 0.1
        p = rng.normal(size=(phys, 128)).astype(np.float32) * 0.05
        mu = rng.normal(size=(phys, 128)).astype(np.float32) * 0.01
        nu = (rng.normal(size=(phys, 128)).astype(np.float32) * 0.01) ** 2
        return V, ids, ct, p, mu, nu

    def test_matches_densify_plus_adam(self):
        """Merged kernel == densify + fused_table_adam given the same
        global norm (ragged phys vs TILE_PHYS=512 covered: 640)."""
        from deepfm_tpu.ops.pallas.adam_kernel import fused_table_adam
        from deepfm_tpu.ops.pallas.packed_grad_kernel import (
            densify_rows_grad_packed,
        )
        from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
            sort_pairs,
            sparse_table_adam_packed,
        )

        pack, d = 7, 17
        V, ids, ct, p, mu, nu = self._mk()
        lr, wd, clip, step = 1e-3, 2e-5, 5.0, jnp.asarray(3, jnp.int32)

        g = densify_rows_grad_packed(
            jnp.asarray(ct), jnp.asarray(ids), V, pack
        )[: p.shape[0]]
        gn = jnp.sqrt(jnp.sum(jnp.square(g + wd * jnp.asarray(p))))
        p1, mu1, nu1 = fused_table_adam(
            jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), g,
            lr, wd, gn, clip, step,
        )
        sids, ctsT = sort_pairs(jnp.asarray(ids), jnp.asarray(ct))
        p2, mu2, nu2, psq2 = sparse_table_adam_packed(
            jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), sids, ctsT,
            lr, wd, gn, clip, step, pack,
        )
        # moment updates see the identical accumulated gradient block
        np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))
        np.testing.assert_array_equal(np.asarray(nu1), np.asarray(nu2))
        # the parameter step may differ by FMA contraction (<= 1 ulp/op)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-6, atol=1e-7
        )
        # the emitted sumsq(p') tracks the dense reduce
        np.testing.assert_allclose(
            float(psq2),
            float(jnp.sum(jnp.square(p1))),
            rtol=1e-5,
        )

    def test_sorted_segment_sumsq_matches_dense(self):
        """sumsq of segment-summed duplicates == sumsq(densify(ct))."""
        from deepfm_tpu.ops.pallas.packed_grad_kernel import (
            densify_rows_grad_packed,
        )
        from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
            sort_pairs,
            sorted_segment_sumsq,
        )

        rng = np.random.default_rng(7)
        V, pack, d, n = 200, 7, 17, 900
        # heavy duplication to stress the segmented scan
        ids = rng.integers(0, 40, n).astype(np.int32)
        ct = rng.normal(size=(n, d)).astype(np.float32)
        g = densify_rows_grad_packed(jnp.asarray(ct), jnp.asarray(ids), V, pack)
        sids, ctsT = sort_pairs(jnp.asarray(ids), jnp.asarray(ct))
        got = float(sorted_segment_sumsq(sids, ctsT))
        want = float(jnp.sum(jnp.square(g)))
        assert got == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("n,vocab", [
        (37, 10),        # ragged single chunk
        (1500, 7),       # few runs, multi-chunk, runs span chunks
        (5000, 100000),  # nearly all-unique, multi-chunk
        (4096, 1),       # ONE run across all chunks (carry chain)
    ])
    def test_pairs_kernel_matches_scan_oracle(self, n, vocab):
        """The Pallas pairwise kernel (production sorted_segment_sumsq)
        == the associative-scan reference at every carry topology. The
        scan is kept ONLY as this oracle: at bench scale it stalls the
        remote TPU compiler (compile_bisect stage 6)."""
        from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
            segment_sumsq_pairs,
            sort_pairs,
            sorted_segment_sumsq_scan,
        )

        rng = np.random.default_rng(n)
        ids = jnp.asarray(rng.integers(0, vocab, n).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(n, 17)).astype(np.float32))
        sids, ctsT = sort_pairs(ids, ct)
        got = float(segment_sumsq_pairs(sids, ctsT))
        want = float(sorted_segment_sumsq_scan(sids, ctsT))
        assert got == pytest.approx(want, rel=1e-5)

    def test_all_unique_and_all_same(self):
        from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
            sort_pairs,
            sorted_segment_sumsq,
        )

        rng = np.random.default_rng(3)
        ct = rng.normal(size=(50, 17)).astype(np.float32)
        # all-unique: sumsq of rows
        ids = np.arange(50, dtype=np.int32)
        sids, ctsT = sort_pairs(jnp.asarray(ids), jnp.asarray(ct))
        got = float(sorted_segment_sumsq(sids, ctsT))
        assert got == pytest.approx(float(np.sum(ct**2)), rel=1e-5)
        # all-duplicate: ||sum of all rows||^2
        ids = np.zeros(50, dtype=np.int32)
        sids, ctsT = sort_pairs(jnp.asarray(ids), jnp.asarray(ct))
        got = float(sorted_segment_sumsq(sids, ctsT))
        assert got == pytest.approx(
            float(np.sum(ct.sum(axis=0) ** 2)), rel=1e-5
        )


class TestTrainerParity:
    def _two_paths(self, tmp_path, **training):
        packed, arr = _make_data()
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / ("fast" if fast else "slow"),
                fused_backward=fast,
                **training,
            )
            model = create_model("deepfm", packed, cfg)
            tr = Trainer(model, packed, cfg, arr, arr, arr)
            assert tr.sparse_fused is fast
            ids = jnp.asarray(arr.ids)[:32]
            dense = jnp.asarray(arr.dense)[:32]
            lab = jnp.asarray(arr.labels)[:32]
            w = jnp.ones((32,), jnp.float32)
            state, l1 = tr._train_step(tr.state, ids, dense, lab, w)
            state, l2 = tr._train_step(state, ids, dense, lab, w)
            results[fast] = (
                (float(l1), float(l2)),
                jax.device_get(state.params),
                jax.device_get(state.table_opt),
                jax.device_get(state.table_psq),
            )
        return results

    def test_two_steps_match_two_pass_path(self, tmp_path):
        """Fused-backward trainer step == two-pass step: same losses,
        same params (incl. tables), same moments — clip active."""
        res = self._two_paths(tmp_path, gradient_clip_norm=1.0)
        (lf, pf, tf, psq), (ls, ps, ts, _) = res[True], res[False]
        assert lf == pytest.approx(ls, rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(ps)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(tf), jax.tree_util.tree_leaves(ts)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
        # the carried sumsq(p) matches a fresh reduce over the params
        for name, v in psq.items():
            want = float(np.sum(np.square(pf["embedding"][name])))
            assert float(v) == pytest.approx(want, rel=1e-5)

    def test_clip_disabled_bit_exact(self, tmp_path):
        """With clipping off and f32 moments the two paths share every
        f32 op — the table params must match bit-for-bit."""
        res = self._two_paths(
            tmp_path, gradient_clip_norm=0.0, moments_dtype="float32"
        )
        (_, pf, _, _), (_, ps, _, _) = res[True], res[False]
        for name in pf["embedding"]:
            if name.startswith("table_w"):
                np.testing.assert_array_equal(
                    np.asarray(pf["embedding"][name]),
                    np.asarray(ps["embedding"][name]),
                )

    def test_clip_disabled_bf16_moments_one_ulp(self, tmp_path):
        """Under the bf16-moment DEFAULT the bit-exact guarantee relaxes
        to <= 1 ulp on a handful of elements: the bf16->f32 moment
        convert changes which multiply-adds XLA contracts into FMAs
        between the two compiled programs (measured: 8/16384 elements at
        1.5e-8 when the default flipped). Values, not bits."""
        res = self._two_paths(tmp_path, gradient_clip_norm=0.0)
        (_, pf, _, _), (_, ps, _, _) = res[True], res[False]
        for name in pf["embedding"]:
            if name.startswith("table_w"):
                np.testing.assert_allclose(
                    np.asarray(pf["embedding"][name]),
                    np.asarray(ps["embedding"][name]),
                    rtol=0, atol=3e-8,
                )

    @pytest.mark.parametrize("model_name", ["xdeepfm", "attention_deepfm"])
    def test_other_model_families_match_two_pass(self, tmp_path, model_name):
        """The fast path is embedding-level — every model family must
        reproduce its two-pass step (clip off: bit-exact tables)."""
        packed, arr = _make_data()
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / f"{model_name}{fast}",
                fused_backward=fast,
                gradient_clip_norm=0.0,
            )
            model = create_model(model_name, packed, cfg)
            tr = Trainer(model, packed, cfg, arr, arr, arr)
            assert tr.sparse_fused is fast
            ids = jnp.asarray(arr.ids)[:32]
            dense = jnp.asarray(arr.dense)[:32]
            lab = jnp.asarray(arr.labels)[:32]
            w = jnp.ones((32,), jnp.float32)
            state, l1 = tr._train_step(tr.state, ids, dense, lab, w)
            state, l2 = tr._train_step(state, ids, dense, lab, w)
            results[fast] = ((float(l1), float(l2)), jax.device_get(state.params))
        (lf, pf), (ls, ps) = results[True], results[False]
        assert lf == pytest.approx(ls, rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(ps)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )

    def test_smoke_train_and_eval(self, tmp_path):
        packed, arr = _make_data()
        cfg = _cfg(tmp_path)
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        assert tr.sparse_fused
        best = tr.train()
        assert 0.0 <= best["auc"] <= 1.0

    def test_resume_recomputes_psq(self, tmp_path):
        packed, arr = _make_data()
        cfg = _cfg(tmp_path, resume=True, num_epochs=1)
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        tr.train()
        # fresh trainer resumes and re-derives the psq carry
        tr2 = Trainer(model, packed, cfg, arr, arr, arr)
        meta = tr2._try_resume()
        assert meta is not None
        for name, v in jax.device_get(tr2.state.table_psq).items():
            want = float(
                np.sum(
                    np.square(
                        np.asarray(tr2.state.params["embedding"][name])
                    )
                )
            )
            assert float(v) == pytest.approx(want, rel=1e-5)

    def test_load_best_recomputes_psq(self, tmp_path):
        packed, arr = _make_data()
        cfg = _cfg(tmp_path, num_epochs=1)
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        tr.train()
        tr.load_best()
        for name, v in jax.device_get(tr.state.table_psq).items():
            want = float(
                np.sum(
                    np.square(np.asarray(tr.state.params["embedding"][name]))
                )
            )
            assert float(v) == pytest.approx(want, rel=1e-5)


class TestDataParallel:
    def test_dp_mesh_fast_matches_two_pass_same_mesh(self, tmp_path):
        """Pure-DP mesh engages the fast path (pairs replicate over
        "data"); on the SAME mesh it must match the two-pass path.
        (DP-vs-single-device comparisons are inherently loose: the psum
        reduce order perturbs near-zero bias gradients and Adam's first
        steps amplify that to ~1e-3 on EITHER path — measured identical
        on the two-pass path.) clip=0 keeps the paths gnorm-independent
        and therefore tight."""
        from deepfm_tpu.parallel import build_mesh

        packed, arr = _make_data(n=32)
        mesh = build_mesh(jax.device_count(), 1)
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / f"f{fast}",
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
            )
        (lf, pf), (ls, ps) = results[True], results[False]
        assert lf == pytest.approx(ls, rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(ps)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )


class TestModelSharded:
    def test_model_sharded_fast_matches_two_pass_same_mesh(self, tmp_path):
        """m=2 mesh: the merged kernel runs per slab inside shard_map on
        the globally sorted pairs (out-of-slab ids contribute nothing);
        must match the two-pass routed-exchange step on the SAME mesh.
        clip=0 keeps the comparison gnorm-independent."""
        from deepfm_tpu.parallel import build_mesh

        packed, arr = _make_data(n=32)
        mesh = build_mesh(jax.device_count() // 2, 2)
        results = {}
        for fast in (True, False):
            cfg = _cfg(
                tmp_path / f"ms{fast}",
                gradient_clip_norm=0.0,
                fused_backward=fast,
            )
            model = create_model("deepfm", packed, cfg, mesh=mesh)
            tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
            assert tr.sparse_fused is fast
            if fast:
                assert model.packed_tables
                assert model.packed_lookup_factory is not None
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
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
        # the psum'd psq carry matches a fresh global reduce
        for name, v in psq.items():
            want = float(np.sum(np.square(pf["embedding"][name])))
            assert float(v) == pytest.approx(want, rel=1e-5)


class TestGating:
    def test_logical_layout_falls_back(self, tmp_path):
        packed, arr = _make_data()
        cfg = config_from_dict(
            {
                "output_dir": str(tmp_path),
                "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
                "pallas": {"table_layout": "logical"},
                "training": {"batch_size": 32, "num_epochs": 1,
                             "scheduler": "none"},
            }
        )
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        assert not tr.sparse_fused  # packed tables required

    def test_model_sharded_config_off_falls_back(self, tmp_path):
        """fused_backward=false on an m>1 mesh keeps the two-pass
        routed-exchange machinery."""
        from deepfm_tpu.parallel import build_mesh

        packed, arr = _make_data()
        cfg = _cfg(tmp_path, fused_backward=False)
        mesh = build_mesh(jax.device_count() // 2, 2)
        model = create_model("deepfm", packed, cfg, mesh=mesh)
        tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
        assert not tr.sparse_fused

    def test_config_off_falls_back(self, tmp_path):
        packed, arr = _make_data()
        cfg = _cfg(tmp_path, fused_backward=False)
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        assert not tr.sparse_fused

    def test_tpu_backend_engages_fused_path(self, tmp_path, monkeypatch):
        """REGRESSION: on a real TPU backend create_model used to inject
        the grad-kernel lookup (which the fused path never consults when
        every group is packable), tripping the trainer's 'no custom
        lookup' gate — training.fused_backward was silently inert on
        hardware while every CPU test passed. Simulate the TPU backend
        and assert the gate chain holds for single-device AND pure-DP."""
        import jax as _jax

        from deepfm_tpu.parallel import build_mesh

        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("DEEPFM_TPU_FORCE_FUSED_ADAM", raising=False)
        packed, arr = _make_data()

        cfg = _cfg(tmp_path / "single")
        model = create_model("deepfm", packed, cfg)
        assert model.lookup_fn is None, (
            "fused-eligible config must keep the default packed gather"
        )
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        assert tr.sparse_fused

        mesh = build_mesh(jax.device_count(), 1)  # pure DP
        cfg2 = _cfg(tmp_path / "dp")
        model2 = create_model("deepfm", packed, cfg2, mesh=mesh)
        assert model2.lookup_fn is None
        tr2 = Trainer(model2, packed, cfg2, arr, arr, arr, mesh=mesh)
        assert tr2.sparse_fused

        # ineligible config (fused off) still gets the grad-kernel lookup
        cfg3 = _cfg(tmp_path / "off", fused_backward=False)
        model3 = create_model("deepfm", packed, cfg3)
        assert model3.lookup_fn is not None

    def test_rows_override_forward_matches(self, tmp_path):
        """rows_override reproduces the in-graph forward bit-for-bit."""
        from deepfm_tpu.ops.embedding import gather_group_rows

        packed, arr = _make_data()
        cfg = _cfg(tmp_path)
        model = create_model("deepfm", packed, cfg)
        ids = jnp.asarray(arr.ids)[:32]
        dense = jnp.asarray(arr.dense)[:32]
        variables = model.init(jax.random.PRNGKey(0), ids, dense)
        base = model.apply(variables, ids, dense)
        gathered = gather_group_rows(
            packed, variables["params"]["embedding"], ids, True
        )
        rows = {k: v[0] for k, v in gathered.items()}
        via = model.apply(variables, ids, dense, rows_override=rows)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(via))
