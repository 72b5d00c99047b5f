"""Pallas kernel vs jnp-oracle parity (interpret mode on the CPU backend).

Mirrors the SURVEY §4 implication: every hand-written kernel ships with a
pure-jnp oracle and a parity test for values AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfm_tpu.ops.cin import CIN, cin_compress, cin_layer_sizes
from deepfm_tpu.ops.pallas.cin_kernel import cin_compress_pallas


class TestCinLayerKernel:
    def test_forward_matches_oracle(self):
        rng = np.random.default_rng(0)
        B, H, F, D, M = 16, 6, 4, 8, 10
        hid = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(M, H * F)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(cin_compress_pallas(hid, x0, w, b)),
            np.asarray(cin_compress(hid, x0, w, b)),
            rtol=1e-4, atol=1e-5,
        )

    def test_gradients_match_oracle(self):
        rng = np.random.default_rng(1)
        B, H, F, D, M = 8, 4, 4, 8, 6
        args = (
            jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(M, H * F)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(M,)).astype(np.float32)),
        )
        gp = jax.grad(
            lambda *a: jnp.sum(cin_compress_pallas(*a) ** 2), argnums=(0, 1, 2, 3)
        )(*args)
        go = jax.grad(
            lambda *a: jnp.sum(cin_compress(*a) ** 2), argnums=(0, 1, 2, 3)
        )(*args)
        for a, b in zip(gp, go):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
            )


class TestCinStackKernel:
    @pytest.mark.parametrize("layer_sizes", [(8,), (8, 6), (8, 6, 4)])
    @pytest.mark.parametrize("split_half", [True, False])
    def test_module_parity(self, layer_sizes, split_half):
        rng = np.random.default_rng(2)
        B, F, D = 16, 5, 8
        x0 = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
        m1 = CIN(num_fields=F, embed_dim=D, layer_sizes=layer_sizes,
                 split_half=split_half)
        m2 = CIN(num_fields=F, embed_dim=D, layer_sizes=layer_sizes,
                 split_half=split_half, use_pallas_stack=True)
        v = m1.init(jax.random.PRNGKey(0), x0)
        np.testing.assert_allclose(
            np.asarray(m1.apply(v, x0)), np.asarray(m2.apply(v, x0)),
            rtol=1e-4, atol=1e-5,
        )
        g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, x0) ** 2))(
            v["params"]
        )
        g2 = jax.grad(lambda p: jnp.sum(m2.apply({"params": p}, x0) ** 2))(
            v["params"]
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
            )

    def test_output_dim(self):
        ds, _ = cin_layer_sizes((128, 128, 64), True)
        assert sum(ds) == 64 + 64 + 64

    @staticmethod
    def _bf16_semantics_oracle(layer_sizes, x0, ws, bs, g):
        """Dense einsum mirror of the bf16-operand kernels' EXACT
        rounding schedule: bf16 outer products / weight / dcomp operands
        with f32 accumulation, f32 comp/relu/adjoint reductions. Any
        deviation beyond f32 reassociation noise is a kernel bug, not
        rounding."""
        bf16, f32 = jnp.bfloat16, jnp.float32
        ds_, ns_ = cin_layer_sizes(layer_sizes, True)
        n = len(layer_sizes)
        x0b = x0.astype(bf16)
        x32 = x0b.astype(f32)

        def w3(i, h):
            return (
                ws[i].reshape(layer_sizes[i], h, -1)
                .astype(bf16).astype(f32)
            )

        comps, hid_bfs = [], []
        hid_bf = x0b
        for i in range(n):
            hid_bfs.append(hid_bf)
            outer = (
                hid_bf[:, :, None, :] * x0b[:, None, :, :]
            )  # bf16 product rounding, as in-kernel
            pre = jnp.einsum(
                "mhf,bhfd->bmd",
                w3(i, hid_bf.shape[1]),
                outer.astype(f32),
            ) + bs[i][None, :, None]
            comp = jax.nn.relu(pre)
            comps.append(comp)
            nxt = comp[:, ds_[i] :, :] if i < n - 1 else comp
            hid_bf = nxt.astype(bf16)

        out = jnp.concatenate(
            [
                jnp.sum(
                    (c if i == n - 1 else c[:, : ds_[i], :]), axis=2
                )
                for i, c in enumerate(comps)
            ],
            axis=1,
        ).astype(x0.dtype)

        # adjoints, kernel rounding schedule. The custom_vjp cotangent
        # arrives in the OUTPUT's dtype (bf16 when x0 is bf16), so the
        # kernel sees a bf16-rounded g — mirror that.
        g = g.astype(x0.dtype).astype(f32)
        dx0 = jnp.zeros_like(x32)
        dws, dbs = [None] * n, [None] * n
        dhid_next = None
        col = sum(ds_)
        for i in reversed(range(n)):
            col -= ds_[i]
            gi = g[:, col : col + ds_[i]]
            ddirect = jnp.broadcast_to(
                gi[:, :, None], (gi.shape[0], ds_[i], x0.shape[2])
            )
            if i < n - 1:
                dcomp = jnp.concatenate([ddirect, dhid_next], axis=1)
            else:
                dcomp = ddirect
            dcomp = dcomp * (comps[i] > 0)
            dbs[i] = jnp.sum(dcomp, axis=(0, 2))
            dcomp_bf32 = dcomp.astype(bf16).astype(f32)
            hid_f32 = x32 if i == 0 else (
                comps[i - 1][:, ds_[i - 1] :, :]
                if i - 1 < n - 1
                else comps[i - 1]
            )
            outer = (
                hid_bfs[i][:, :, None, :] * x0b[:, None, :, :]
            ).astype(f32)
            dws[i] = jnp.einsum(
                "bmd,bhfd->mhf", dcomp_bf32, outer
            ).reshape(layer_sizes[i], -1)
            a = jnp.einsum(
                "mhf,bmd->bhfd",
                w3(i, hid_bfs[i].shape[1]),
                dcomp_bf32,
            )
            dhid = jnp.einsum("bhfd,bfd->bhd", a, x32)
            dx0 = dx0 + jnp.einsum("bhfd,bhd->bfd", a, hid_f32)
            dhid_next = dhid
        dx0 = (dx0 + dhid_next).astype(x0.dtype)
        return out, dx0, dws, dbs

    @pytest.mark.parametrize("layer_sizes", [(128, 128), (64,),
                                             (128, 128, 64)])
    def test_bf16_operands_exact_semantics(self, layer_sizes):
        """bf16 MXU-operand path (pallas.cin_bf16_operands) at every
        shipped geometry vs a dense oracle that mirrors the kernel's
        rounding schedule exactly — tight tolerances, so chunking /
        host-padding / mirror-staging bugs cannot hide behind 'bf16
        rounding'."""
        from deepfm_tpu.ops.pallas.cin_stack_kernel import (
            make_cin_stack_pallas,
        )

        rng = np.random.default_rng(7)
        B, F, D = 32, 27, 16
        x0 = jnp.asarray(
            rng.normal(size=(B, F, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ws, bs = [], []
        ds_, ns_ = cin_layer_sizes(layer_sizes, True)
        prev = F
        for i, ls in enumerate(layer_sizes):
            ws.append(jnp.asarray(
                rng.normal(size=(ls, prev * F)).astype(np.float32) * 0.2))
            bs.append(jnp.asarray(
                rng.normal(size=(ls,)).astype(np.float32) * 0.2))
            prev = ns_[i] if i < len(layer_sizes) - 1 else ls

        fn_bf = make_cin_stack_pallas(layer_sizes, True,
                                      bf16_operands=True)
        out_bf = np.asarray(fn_bf(x0, ws, bs), np.float32)
        g = jnp.asarray(
            rng.normal(size=out_bf.shape).astype(np.float32)
        )
        gb = jax.grad(
            lambda *A: jnp.sum(fn_bf(*A).astype(jnp.float32) * g),
            argnums=(0, 1, 2),
        )(x0, ws, bs)

        want_out, want_dx0, want_dws, want_dbs = (
            self._bf16_semantics_oracle(layer_sizes, x0, ws, bs, g)
        )
        # out and dx0 are returned in bf16: f32 chunk-order reassociation
        # (kernel) vs one einsum (oracle) can flip the final bf16
        # rounding by 1 ulp. rtol can't express "1 ulp" (it spans
        # 2^-8..2^-7 across a binade), so compare bf16 bit-distance.
        def assert_ulp(got, want, max_ulp=1, atol=6e-3):
            got = np.asarray(got, np.float32)
            want = np.asarray(want, np.float32)
            close = np.abs(got - want) <= atol  # near-zero denormal noise
            def key(a):
                b = a.astype(jnp.bfloat16).view(np.uint16).astype(np.int32)
                return np.where(b & 0x8000, 0x8000 - (b & 0x7FFF),
                                0x8000 + b)
            ulp = np.abs(key(got) - key(want))
            bad = (~close) & (ulp > max_ulp)
            assert not bad.any(), (
                f"{bad.sum()} elements beyond {max_ulp} bf16 ulp; worst "
                f"{ulp[bad].max()} ulp at {np.argwhere(bad)[:4].tolist()}"
            )

        assert_ulp(out_bf, want_out)
        assert_ulp(gb[0], want_dx0)
        # dW/db: a pre-activation within f32-reassociation noise of 0 can
        # land on opposite sides of the ReLU in kernel vs oracle, adding/
        # dropping one sample's whole contribution — legal ambiguity, not
        # a bug. Bound the error by a fraction of the gradient's scale:
        # real chunk/offset bugs shift entire rows by O(scale).
        for got, want in zip(gb[1], want_dws):
            want = np.asarray(want, np.float32)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), want, rtol=2e-3,
                atol=max(3e-3, 2e-3 * float(np.abs(want).max())),
            )
        for got, want in zip(gb[2], want_dbs):
            want = np.asarray(want, np.float32)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), want, rtol=2e-3,
                atol=max(3e-3, 2e-3 * float(np.abs(want).max())),
            )

    def test_bf16_path_requires_aligned_shapes(self):
        """Misaligned layer sizes (not 16-multiples) silently keep the
        f32 path — never a wrong-numbers bf16 run."""
        from deepfm_tpu.ops.pallas.cin_stack_kernel import (
            make_cin_stack_pallas,
        )

        rng = np.random.default_rng(8)
        x0 = jnp.asarray(
            rng.normal(size=(16, 5, 8)).astype(np.float32)
        ).astype(jnp.bfloat16)
        fn = make_cin_stack_pallas((8, 6), True, bf16_operands=True)
        fn32 = make_cin_stack_pallas((8, 6), True, bf16_operands=False)
        ws = [jnp.asarray(rng.normal(size=(8, 5 * 5)), jnp.float32),
              jnp.asarray(rng.normal(size=(6, 4 * 5)), jnp.float32)]
        bs = [jnp.zeros((8,), jnp.float32), jnp.zeros((6,), jnp.float32)]
        np.testing.assert_allclose(
            np.asarray(fn(x0, ws, bs), np.float32),
            np.asarray(fn32(x0, ws, bs), np.float32),
            rtol=1e-5, atol=1e-6,
        )

    def test_bf16_flag_wires_through_xdeepfm(self):
        """models/xdeepfm.py must thread pallas.cin_bf16_operands into
        the CIN module: flag on vs off at an eligible bf16 geometry
        agree within bf16 operand rounding (wiring test — exactness is
        covered by the semantics oracle above)."""
        import jax

        from deepfm_tpu.config import config_from_dict
        from deepfm_tpu.data.packing import pack_features, pack_schema
        from deepfm_tpu.data.schema import (
            DatasetSchema,
            FeatureType,
            FieldSchema,
        )
        from deepfm_tpu.models import create_model

        fields = {
            f"cat_{i}": FieldSchema(
                f"cat_{i}", FeatureType.SPARSE, 64, 16, "user"
            )
            for i in range(4)
        }
        packed = pack_schema(DatasetSchema(fields=fields))
        rng = np.random.default_rng(3)
        feats = {f"cat_{i}": rng.integers(1, 64, 32) for i in range(4)}
        labels = rng.integers(0, 2, 32).astype(np.float32)
        arrays = pack_features(packed, feats, labels)

        outs = {}
        for flag in (False, True):
            cfg = config_from_dict({
                "model_name": "xdeepfm",
                "training": {"compute_dtype": "bfloat16"},
                "cin": {"layer_sizes": [16, 16]},
                "pallas": {"cin_bf16_operands": flag},
                "output_dir": "/tmp/bf16_wire_test",
            })
            model = create_model("xdeepfm", packed, cfg)
            v = model.init(jax.random.PRNGKey(0), arrays.ids, arrays.dense)
            outs[flag] = np.asarray(
                model.apply(v, arrays.ids, arrays.dense), np.float32
            )
        np.testing.assert_allclose(outs[False], outs[True],
                                   rtol=2e-2, atol=2e-2)

    def test_criteo_shape_parity(self):
        """F=27 / layers (128,128): the Criteo-scale shape where the
        first layer has 729 input channels — the fused fwd AND the fused
        backward (chunked outer products, selector matmuls) must match
        the oracle."""
        rng = np.random.default_rng(4)
        B, F, D = 64, 27, 16
        x0 = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
        m1 = CIN(num_fields=F, embed_dim=D, layer_sizes=(128, 128),
                 split_half=True)
        m2 = CIN(num_fields=F, embed_dim=D, layer_sizes=(128, 128),
                 split_half=True, use_pallas_stack=True)
        v = m1.init(jax.random.PRNGKey(1), x0)
        np.testing.assert_allclose(
            np.asarray(m1.apply(v, x0)), np.asarray(m2.apply(v, x0)),
            rtol=1e-4, atol=1e-5,
        )
        g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, x0) ** 2))(
            v["params"]
        )
        g2 = jax.grad(lambda p: jnp.sum(m2.apply({"params": p}, x0) ** 2))(
            v["params"]
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
            )


class TestAttentionKernel:
    @pytest.mark.parametrize("use_residual", [True, False])
    def test_module_parity(self, use_residual):
        from deepfm_tpu.ops.attention import MultiHeadSelfAttention

        rng = np.random.default_rng(3)
        B, F, D = 8, 5, 16
        x = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
        m1 = MultiHeadSelfAttention(
            embed_dim=D, num_heads=2, attention_dim=16,
            use_residual=use_residual,
        )
        m2 = MultiHeadSelfAttention(
            embed_dim=D, num_heads=2, attention_dim=16,
            use_residual=use_residual, use_pallas=True,
        )
        v = m1.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m1.apply(v, x)), np.asarray(m2.apply(v, x)),
            rtol=1e-4, atol=1e-5,
        )
        g1 = jax.grad(lambda z: jnp.sum(m1.apply(v, z) ** 2))(x)
        g2 = jax.grad(lambda z: jnp.sum(m2.apply(v, z) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3
        )

    def test_criteo_field_count_parity(self):
        """F=27: the field axis pads to the sublane grid with padded
        keys masked out of the softmax — values/grads must still match
        the unfused module exactly."""
        from deepfm_tpu.ops.attention import MultiHeadSelfAttention

        rng = np.random.default_rng(5)
        B, F, D = 8, 27, 16
        x = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
        m1 = MultiHeadSelfAttention(embed_dim=D, num_heads=4,
                                    attention_dim=64)
        m2 = MultiHeadSelfAttention(embed_dim=D, num_heads=4,
                                    attention_dim=64, use_pallas=True)
        v = m1.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m1.apply(v, x)), np.asarray(m2.apply(v, x)),
            rtol=1e-4, atol=1e-5,
        )
        g1 = jax.grad(lambda z: jnp.sum(m1.apply(v, z) ** 2))(x)
        g2 = jax.grad(lambda z: jnp.sum(m2.apply(v, z) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3
        )


class TestEmbeddingGatherKernel:
    def test_matches_take(self, monkeypatch):
        from deepfm_tpu.ops.pallas import embedding_kernel

        monkeypatch.setattr(embedding_kernel, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(4)
        V, D, N = 1024, 16, 256  # 128-multiple tile in interpret mode
        table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
        got = embedding_kernel.pallas_lookup(table, ids)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(table)[np.asarray(ids)], rtol=1e-6
        )

    def test_gradient_scatter_add(self, monkeypatch):
        from deepfm_tpu.ops.pallas import embedding_kernel

        monkeypatch.setattr(embedding_kernel, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(5)
        V, D, N = 512, 16, 128
        table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
        # include duplicates to exercise accumulate semantics
        ids = jnp.asarray((rng.integers(0, 8, N)).astype(np.int32))

        def loss_k(t):
            return jnp.sum(embedding_kernel.pallas_lookup(t, ids) ** 2)

        def loss_o(t):
            return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_k)(table)),
            np.asarray(jax.grad(loss_o)(table)),
            rtol=1e-5,
        )

    def test_fallback_on_unsupported_shapes(self):
        from deepfm_tpu.ops.pallas.embedding_kernel import pallas_lookup

        table = jnp.ones((10, 3))  # d=3 does not divide 128
        ids = jnp.zeros((7,), jnp.int32)
        assert pallas_lookup(table, ids).shape == (7, 3)


class TestGradDensifyKernel:
    """sparse_grad_lookup: XLA-gather forward, Pallas densify backward."""

    def _oracle(self, ct, ids, num_rows):
        return jnp.zeros((num_rows, ct.shape[1]), ct.dtype).at[ids].add(ct)

    @pytest.mark.parametrize("d", [1, 8, 16, 17])
    def test_densify_matches_scatter_add(self, d):
        from deepfm_tpu.ops.pallas.grad_kernel import densify_rows_grad

        rng = np.random.default_rng(3)
        num_rows, n = 6000, 800
        # duplicates + id 0 + the max row id all present
        ids = rng.integers(0, num_rows, n).astype(np.int32)
        ids[:50] = 0
        ids[50] = num_rows - 1
        ct = rng.normal(size=(n, d)).astype(np.float32)
        got = densify_rows_grad(jnp.asarray(ct), jnp.asarray(ids), num_rows)
        want = self._oracle(jnp.asarray(ct), jnp.asarray(ids), num_rows)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_empty_and_single_id(self):
        from deepfm_tpu.ops.pallas.grad_kernel import densify_rows_grad

        ids = jnp.asarray([7, 7, 7], jnp.int32)
        ct = jnp.ones((3, 4), jnp.float32)
        out = np.asarray(densify_rows_grad(ct, ids, 300))
        assert out[7].tolist() == [3.0] * 4
        assert np.abs(out).sum() == 12.0

    def test_lookup_vjp_matches_take(self):
        from deepfm_tpu.ops.pallas.grad_kernel import sparse_grad_lookup

        rng = np.random.default_rng(4)
        num_rows, d, n = 4096, 16, 1000
        table = jnp.asarray(rng.normal(size=(num_rows, d)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, num_rows, n), jnp.int32)
        ct_up = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

        def loss_k(t):
            return jnp.sum(sparse_grad_lookup(t, ids) * ct_up)

        def loss_o(t):
            return jnp.sum(jnp.take(t, ids, axis=0) * ct_up)

        np.testing.assert_allclose(
            float(loss_k(table)), float(loss_o(table)), rtol=1e-6
        )
        gk = jax.grad(loss_k)(table)
        go = jax.grad(loss_o)(table)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=1e-5, atol=1e-6
        )

    def test_model_grads_match_default_lookup(self):
        """Full DeepFM grad parity: default XLA lookup vs kernel lookup."""
        import sys

        sys.path.insert(0, "tests")
        from conftest import make_synth_batch, make_synth_schema

        from deepfm_tpu.config import config_from_dict
        from deepfm_tpu.data.packing import pack_features, pack_schema
        from deepfm_tpu.models import create_model
        from deepfm_tpu.ops.pallas.grad_kernel import sparse_grad_lookup

        schema = make_synth_schema()
        packed = pack_schema(schema)
        feats, labels = make_synth_batch(schema, 16, seed=9)
        arr = pack_features(packed, feats, labels)
        cfg = config_from_dict({"dnn": {"hidden_units": [8], "dropout": 0.0}})
        ids, dense = jnp.asarray(arr.ids), jnp.asarray(arr.dense)

        m0 = create_model("deepfm", packed, cfg)
        mk = create_model("deepfm", packed, cfg, lookup_fn=sparse_grad_lookup)
        v = m0.init(jax.random.PRNGKey(0), ids, dense)

        def loss(m):
            return lambda p: jnp.sum(
                m.apply({"params": p, **{k: v2 for k, v2 in v.items() if k != "params"}}, ids, dense) ** 2
            )

        g0 = jax.grad(loss(m0))(v["params"])
        gk = jax.grad(loss(mk))(v["params"])
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(gk)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


class TestPackedGradKernel:
    """Packed-table densify: logical scatter-add laid out pack-per-row."""

    def _oracle(self, ct, ids, num_rows, pack):
        d = ct.shape[1]
        num_phys = -(-num_rows // pack)
        logical = jnp.zeros((num_phys * pack, d), jnp.float32).at[ids].add(ct)
        packed = logical.reshape(num_phys, pack * d)
        if pack * d < 128:
            packed = jnp.pad(packed, ((0, 0), (0, 128 - pack * d)))
        return packed

    @pytest.mark.parametrize("d,pack", [(17, 7), (9, 14), (5, 25)])
    def test_matches_logical_scatter(self, d, pack):
        from deepfm_tpu.ops.pallas.packed_grad_kernel import (
            densify_rows_grad_packed,
        )

        rng = np.random.default_rng(5)
        num_rows, n = 6000, 900
        ids = rng.integers(0, num_rows, n).astype(np.int32)
        ids[:40] = 0
        ids[40:80] = 777  # duplicates across one phys row boundary
        ct = rng.normal(size=(n, d)).astype(np.float32)
        got = densify_rows_grad_packed(
            jnp.asarray(ct), jnp.asarray(ids), num_rows, pack
        )
        want = self._oracle(jnp.asarray(ct), jnp.asarray(ids), num_rows, pack)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
        # dead lanes exactly zero
        assert np.abs(np.asarray(got)[:, pack * d :]).max() == 0.0

    def test_lookup_fwd_and_grad(self):
        from deepfm_tpu.ops.pallas.packed_grad_kernel import make_packed_lookup

        rng = np.random.default_rng(6)
        d, pack = 17, 7
        v = 4096 * pack
        phys = v // pack
        n = 600
        table = jnp.asarray(
            rng.normal(size=(phys, 128)).astype(np.float32)
        )
        # dead lanes zero, as the embedding init guarantees
        table = table.at[:, pack * d :].set(0.0)
        ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
        up = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        lookup = make_packed_lookup(d, pack)

        # forward equals the logical-view gather
        logical = table[:, : pack * d].reshape(v, d)
        np.testing.assert_allclose(
            np.asarray(lookup(table, ids)),
            np.asarray(jnp.take(logical, ids, axis=0)),
            rtol=1e-6,
        )

        # gradient equals the packed logical scatter
        g = jax.grad(lambda t: jnp.sum(lookup(t, ids) * up))(table)
        want_logical = jnp.zeros((v, d), jnp.float32).at[ids].add(up)
        want = jnp.pad(
            want_logical.reshape(phys, pack * d),
            ((0, 0), (0, 128 - pack * d)),
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestPackedEmbeddingParity:
    """Full-model parity: packed-table layout vs logical layout with
    transplanted parameters (forward AND gradients)."""

    def test_deepfm_forward_and_grads_match(self):
        import sys

        sys.path.insert(0, "tests")
        from conftest import make_synth_batch, make_synth_schema

        from deepfm_tpu.config import config_from_dict
        from deepfm_tpu.data.packing import pack_features, pack_schema
        from deepfm_tpu.models import MODEL_REGISTRY
        from deepfm_tpu.ops.embedding import pad_rows

        schema = make_synth_schema()
        packed = pack_schema(schema)
        feats, labels = make_synth_batch(schema, 16, seed=12)
        arr = pack_features(packed, feats, labels)
        cfg = config_from_dict(
            {"dnn": {"hidden_units": [8], "dropout": 0.0,
                     "use_batch_norm": False}}
        )
        ids, dense = jnp.asarray(arr.ids), jnp.asarray(arr.dense)

        m0 = MODEL_REGISTRY["deepfm"](packed=packed, config=cfg)
        mp = MODEL_REGISTRY["deepfm"](
            packed=packed, config=cfg, packed_tables=True
        )
        v0 = m0.init(jax.random.PRNGKey(0), ids, dense)

        # transplant: pack each logical table into the packed layout
        vp = mp.init(jax.random.PRNGKey(0), ids, dense)
        p0 = jax.device_get(v0["params"])
        pp = jax.device_get(vp["params"])
        for g in packed.lookup_groups:
            d = g.width
            pack = 128 // (d + 1)
            logical = np.asarray(p0["embedding"][f"table_w{d}"])
            phys_rows = pad_rows(-(-g.total_rows // pack))
            cap = phys_rows * pack
            logical_full = np.zeros((cap, d + 1), np.float32)
            logical_full[: logical.shape[0]] = logical[:cap]
            packed_tab = np.zeros((phys_rows, 128), np.float32)
            packed_tab[:, : pack * (d + 1)] = logical_full.reshape(
                phys_rows, pack * (d + 1)
            )
            pp["embedding"][f"table_w{d}"] = packed_tab
        for k, v in p0["embedding"].items():
            if not k.startswith("table_w"):
                pp["embedding"][k] = v
        for k in p0:
            if k != "embedding":
                pp[k] = p0[k]

        out0 = m0.apply({"params": p0}, ids, dense)
        outp = mp.apply({"params": pp}, ids, dense)
        np.testing.assert_allclose(
            np.asarray(outp), np.asarray(out0), rtol=1e-5, atol=1e-6
        )

        # gradient parity: map the packed table grad back to logical rows
        def loss(m):
            return lambda p: jnp.sum(m.apply({"params": p}, ids, dense) ** 2)

        g0 = jax.grad(loss(m0))(p0)
        gp = jax.grad(loss(mp))(pp)
        for g in packed.lookup_groups:
            d = g.width
            pack = 128 // (d + 1)
            glog = np.asarray(g0["embedding"][f"table_w{d}"])
            gpk = np.asarray(gp["embedding"][f"table_w{d}"])
            # dead lanes zero
            assert np.abs(gpk[:, pack * (d + 1) :]).max() == 0.0
            back = gpk[:, : pack * (d + 1)].reshape(-1, d + 1)
            np.testing.assert_allclose(
                back[: glog.shape[0]], glog, rtol=1e-4, atol=1e-5
            )


class TestFusedTableAdam:
    def test_kernel_matches_optax_chain(self):
        import optax

        from deepfm_tpu.ops.pallas.adam_kernel import fused_table_adam

        rng = np.random.default_rng(8)
        r, c = 512, 128
        p = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32) * 1e-2)
        lr, wd, clip = 1e-3, 2e-5, 1.0

        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.clip_by_global_norm(clip),
            optax.adam(lr),
        )
        st = tx.init(p)
        p_ref, mu_ref, nu_ref = p, jnp.zeros_like(p), jnp.zeros_like(p)
        p_k, mu_k, nu_k = p, jnp.zeros_like(p), jnp.zeros_like(p)
        for step in range(3):
            upd, st = tx.update(g, st, p_ref)
            p_ref = optax.apply_updates(p_ref, upd)
            # kernel path: same decayed-gradient global norm, same lr/wd
            dec = g + wd * p_k
            gnorm = jnp.sqrt(jnp.sum(dec * dec))
            p_k, mu_k, nu_k = fused_table_adam(
                p_k, mu_k, nu_k, g,
                jnp.asarray(lr), jnp.asarray(wd), gnorm,
                jnp.asarray(clip), jnp.asarray(step, jnp.int32),
            )
            np.testing.assert_allclose(
                np.asarray(p_k), np.asarray(p_ref), rtol=2e-5, atol=1e-7,
                err_msg=f"step {step}",
            )

    def test_trainer_fused_matches_dense_adam(self, tmp_path, monkeypatch):
        """A fused-table-adam train step must equal the plain optax step
        (forced on under the CPU backend via monkeypatch)."""
        import sys

        sys.path.insert(0, "tests")
        from conftest import make_synth_batch, make_synth_schema

        import deepfm_tpu.training.trainer as trainer_mod
        from deepfm_tpu.config import config_from_dict
        from deepfm_tpu.data.packing import pack_features, pack_schema
        from deepfm_tpu.models import create_model
        from deepfm_tpu.training.trainer import Trainer

        schema = make_synth_schema()
        packed = pack_schema(schema)
        feats, labels = make_synth_batch(schema, 32, seed=13)
        arr = pack_features(packed, feats, labels)

        def make_cfg():
            return config_from_dict(
                {
                    "output_dir": str(tmp_path),
                    "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
                    "training": {
                        "batch_size": 32, "num_epochs": 1,
                        "scheduler": "none",
                        # optax-parity contract: optax stores f32 moments,
                        # so the comparison pins the optax-exact config
                        # (the bf16-moment default is covered by
                        # TestBf16Moments and the fast-vs-two-pass suite)
                        "moments_dtype": "float32",
                    },
                }
            )

        def one_step(force_fused):
            monkeypatch.setattr(
                trainer_mod,
                "_use_fused_table_adam",
                lambda cfg, mesh=None: force_fused,
            )
            cfg = make_cfg()
            model = create_model("deepfm", packed, cfg)
            tr = Trainer(model, packed, cfg, arr, arr, arr)
            ids = jnp.asarray(arr.ids)
            dense = jnp.asarray(arr.dense)
            lab = jnp.asarray(arr.labels)
            w = jnp.ones((32,), jnp.float32)
            state, loss = tr._train_step(tr.state, ids, dense, lab, w)
            state, loss = tr._train_step(state, ids, dense, lab, w)
            return float(loss), jax.device_get(state.params)

        loss_f, p_f = one_step(True)
        loss_d, p_d = one_step(False)
        assert loss_f == pytest.approx(loss_d, rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_d)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_trainer_fused_model_sharded_matches_dense(
        self, tmp_path, monkeypatch
    ):
        """Fused table Adam on a (4, 2) model-sharded mesh: the kernel
        runs per shard under shard_map (round-2 verdict: the multi-chip
        path used to silently lose the fusion). Must match the masked
        optax step, and the compiled step must not all-gather any table
        around the aliased custom call."""
        import sys

        sys.path.insert(0, "tests")
        from conftest import make_synth_batch, make_synth_schema

        import deepfm_tpu.training.trainer as trainer_mod
        from deepfm_tpu.config import config_from_dict
        from deepfm_tpu.data.packing import pack_features, pack_schema
        from deepfm_tpu.models import create_model
        from deepfm_tpu.parallel import build_mesh
        from deepfm_tpu.training.trainer import Trainer

        schema = make_synth_schema()
        packed = pack_schema(schema)
        feats, labels = make_synth_batch(schema, 32, seed=13)
        arr = pack_features(packed, feats, labels)
        mesh = build_mesh(4, 2)

        def make_cfg():
            return config_from_dict(
                {
                    "output_dir": str(tmp_path),
                    "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
                    "training": {
                        "batch_size": 32, "num_epochs": 1,
                        "scheduler": "none",
                        # optax-parity contract (see the single-device
                        # test above): pin the optax-exact f32 moments
                        "moments_dtype": "float32",
                    },
                }
            )

        def one_step(force_fused, want_hlo=False):
            monkeypatch.setattr(
                trainer_mod,
                "_use_fused_table_adam",
                lambda cfg, mesh=None: force_fused,
            )
            cfg = make_cfg()
            model = create_model("deepfm", packed, cfg, mesh=mesh)
            tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
            if force_fused:
                assert tr.fused_tables, "table rows must divide the axis"
            ids, dense, lab, w = tr._put_batch(
                arr.ids, arr.dense, arr.labels,
                np.ones((32,), np.float32),
            )
            hlo = None
            if want_hlo:
                hlo = (
                    tr._train_step.lower(tr.state, ids, dense, lab, w)
                    .compile()
                    .as_text()
                )
            state, loss = tr._train_step(tr.state, ids, dense, lab, w)
            state, loss = tr._train_step(state, ids, dense, lab, w)
            return float(loss), jax.device_get(state.params), hlo

        loss_f, p_f, hlo = one_step(True, want_hlo=True)
        loss_d, p_d, _ = one_step(False)
        assert loss_f == pytest.approx(loss_d, rel=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_d)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

        from deepfm_tpu.utils.hlo import _match_collective, op_output_bytes

        table_bytes = 130 * 17 * 4  # largest table, f32
        big = [
            line.strip()
            for line in hlo.splitlines()
            if (hit := _match_collective(line)) is not None
            and hit[0] == "all-gather" and hit[1]
            and op_output_bytes(line) >= table_bytes
        ]
        assert not big, (
            f"table-sized all-gather around the fused Adam: {big}"
        )


class TestBf16Moments:
    def test_kernel_bf16_moments_track_f32(self):
        """bf16-stored moments: updates must track the f32 chain within
        bf16 quantization error, and the moment outputs keep their
        storage dtype across steps."""
        from deepfm_tpu.ops.pallas.adam_kernel import fused_table_adam

        rng = np.random.default_rng(9)
        r, c = 256, 128
        p32 = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32) * 1e-2)
        lr, wd, clip = 1e-3, 2e-5, 1.0
        pb = p32
        mu32 = nu32 = jnp.zeros_like(p32)
        mub = nub = jnp.zeros((r, c), jnp.bfloat16)
        for step in range(5):
            dec = g + wd * p32
            gnorm = jnp.sqrt(jnp.sum(dec * dec))
            p32, mu32, nu32 = fused_table_adam(
                p32, mu32, nu32, g, jnp.asarray(lr), jnp.asarray(wd),
                gnorm, jnp.asarray(clip), jnp.asarray(step, jnp.int32),
            )
            decb = g + wd * pb
            gnb = jnp.sqrt(jnp.sum(decb * decb))
            pb, mub, nub = fused_table_adam(
                pb, mub, nub, g, jnp.asarray(lr), jnp.asarray(wd),
                gnb, jnp.asarray(clip), jnp.asarray(step, jnp.int32),
            )
            assert mub.dtype == jnp.bfloat16 and nub.dtype == jnp.bfloat16
        # after 5 steps the cumulative param drift stays at bf16-moment
        # scale (relative moment error ~2^-9, amplified by lr only)
        drift = np.abs(np.asarray(pb - p32))
        step_size = 5 * lr
        assert drift.max() < 0.05 * step_size

    def test_trainer_bf16_moments(self, tmp_path, monkeypatch):
        """training.moments_dtype=bfloat16 end to end: moments are stored
        bf16, losses stay close to the f32-moment run."""
        import sys

        sys.path.insert(0, "tests")
        from conftest import make_synth_batch, make_synth_schema

        import deepfm_tpu.training.trainer as trainer_mod
        from deepfm_tpu.config import config_from_dict
        from deepfm_tpu.data.packing import pack_features, pack_schema
        from deepfm_tpu.models import create_model
        from deepfm_tpu.training.trainer import Trainer

        schema = make_synth_schema()
        packed = pack_schema(schema)
        feats, labels = make_synth_batch(schema, 32, seed=13)
        arr = pack_features(packed, feats, labels)
        monkeypatch.setattr(
            trainer_mod,
            "_use_fused_table_adam",
            lambda cfg, mesh=None: True,
        )

        def run(moments_dtype):
            cfg = config_from_dict(
                {
                    "output_dir": str(tmp_path),
                    "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
                    "training": {
                        "batch_size": 32, "num_epochs": 1,
                        "scheduler": "none",
                        "moments_dtype": moments_dtype,
                    },
                }
            )
            model = create_model("deepfm", packed, cfg)
            tr = Trainer(model, packed, cfg, arr, arr, arr)
            ids = jnp.asarray(arr.ids)
            dense = jnp.asarray(arr.dense)
            lab = jnp.asarray(arr.labels)
            w = jnp.ones((32,), jnp.float32)
            state = tr.state
            losses = []
            for _ in range(3):
                state, loss = tr._train_step(state, ids, dense, lab, w)
                losses.append(float(loss))
            return losses, state

        losses_bf, state_bf = run("bfloat16")
        losses_f32, _ = run("float32")
        for t in state_bf.table_opt.values():
            assert t.mu.dtype == jnp.bfloat16
            assert t.nu.dtype == jnp.bfloat16
        np.testing.assert_allclose(losses_bf, losses_f32, rtol=5e-3)
