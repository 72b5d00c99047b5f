"""Layer/op tests: shapes, math oracles, padding invariants, grad flow
(reference test strategy: tests/test_layers.py — FM efficient-trick vs
explicit O(F^2) loop, padding-idx zeroing, gradient-flow checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_synth_batch, make_synth_schema
from deepfm_tpu.data.packing import pack_features, pack_schema
from deepfm_tpu.ops.attention import MultiHeadSelfAttention
from deepfm_tpu.ops.cin import CIN, cin_output_dim
from deepfm_tpu.ops.dnn import DNN
from deepfm_tpu.ops.embedding import FeatureEmbedding
from deepfm_tpu.ops.fm import fm_interaction

B = 8


@pytest.fixture(scope="module")
def emb_setup():
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, B, seed=0)
    arr = pack_features(packed, feats, labels)
    module = FeatureEmbedding(packed=packed, fm_embed_dim=16)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.asarray(arr.ids), jnp.asarray(arr.dense)
    )
    return schema, packed, arr, module, variables


class TestFeatureEmbedding:
    def test_output_shapes(self, emb_setup):
        schema, packed, arr, module, variables = emb_setup
        fo, fe, fl = module.apply(
            variables, jnp.asarray(arr.ids), jnp.asarray(arr.dense)
        )
        assert fo.shape == (B, 1)
        assert fe.shape == (B, schema.num_fields, 16)
        assert fl.shape == (B, schema.total_embedding_dim)

    def test_all_zero_ids_give_zero_views(self, emb_setup):
        """padding/OOV row semantics: id 0 contributes exactly nothing, and
        dense x=0 with zero-init biases contributes nothing at init."""
        schema, packed, arr, module, variables = emb_setup
        ids = jnp.zeros_like(jnp.asarray(arr.ids))
        dense = jnp.zeros_like(jnp.asarray(arr.dense))
        fo, fe, fl = module.apply(variables, ids, dense)
        np.testing.assert_allclose(np.asarray(fo), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(fe), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(fl), 0.0, atol=1e-7)

    def test_padding_rows_zero_at_init(self, emb_setup):
        """Every field's row 0 (and the padding tail) is zero at init —
        including the fused first-order column (table column `width`)."""
        schema, packed, arr, module, variables = emb_setup
        params = variables["params"]
        for g in packed.lookup_groups:
            tab = np.asarray(params[f"table_w{g.width}"])
            assert tab.shape[1] == g.width + 1  # emb cols + fo col
            for off in np.unique(g.local_offsets):
                assert abs(tab[off]).max() == 0.0
            assert abs(tab[g.total_rows :]).max() == 0.0

    def test_padding_rows_get_zero_gradient(self, emb_setup):
        schema, packed, arr, module, variables = emb_setup
        ids = jnp.asarray(arr.ids)
        dense = jnp.asarray(arr.dense)

        def loss(params):
            fo, fe, fl = module.apply({"params": params}, ids, dense)
            return jnp.sum(fo**2) + jnp.sum(fe**2) + jnp.sum(fl**2)

        grads = jax.grad(loss)(variables["params"])
        # each field's row 0 within each fused table must have zero grad
        for gname, g in grads.items():
            if not gname.startswith("table_w"):
                continue
            width = int(gname.split("w")[1])
            group = [x for x in packed.lookup_groups if x.width == width][0]
            offsets = np.unique(group.local_offsets)
            for off in offsets:
                np.testing.assert_allclose(
                    np.asarray(g)[off], 0.0, atol=1e-7,
                    err_msg=f"{gname} row {off}",
                )

    def test_sequence_mean_pooling(self, emb_setup):
        """A sequence field with k valid tokens must average over k, and the
        flat view must equal the manual masked mean of gathered rows."""
        schema, packed, arr, module, variables = emb_setup
        params = variables["params"]
        group = [g for g in packed.lookup_groups if "tags" in g.field_names][0]
        ids = np.zeros((1, packed.num_slots), np.int32)
        ids[0, group.slot_start] = 3
        ids[0, group.slot_start + 1] = 5
        dense = np.zeros((1, packed.num_dense), np.float32)
        fo, fe, fl = module.apply(
            variables, jnp.asarray(ids), jnp.asarray(dense)
        )
        table = np.asarray(params[f"table_w{group.width}"])
        off = group.local_offsets[0]
        expected = (table[off + 3, :8] + table[off + 5, :8]) / 2
        # tags is the 3rd schema field; flat layout is schema order
        start = 16 + 16
        np.testing.assert_allclose(
            np.asarray(fl)[0, start : start + 8], expected, rtol=1e-5
        )

    def test_first_order_is_sum_of_field_scalars(self, emb_setup):
        schema, packed, arr, module, variables = emb_setup
        params = variables["params"]
        ids = np.asarray(arr.ids)
        fo, _, _ = module.apply(
            variables, jnp.asarray(arr.ids), jnp.asarray(arr.dense)
        )
        manual = np.zeros(B)
        for g in packed.lookup_groups:
            # first-order scalars live in the LAST column of the width table
            fo_col = np.asarray(params[f"table_w{g.width}"])[:, g.width]
            sl = slice(g.slot_start, g.slot_end)
            gids = ids[:, sl] + g.local_offsets[None, :]
            vals = fo_col[gids] * (ids[:, sl] != 0)
            # per-field mean pooling for the sequence field
            for mi, (n_slots, seq) in enumerate(
                zip(g.field_num_slots, g.is_sequence)
            ):
                s0 = sum(g.field_num_slots[:mi])
                v = vals[:, s0 : s0 + n_slots]
                cnt = (ids[:, sl][:, s0 : s0 + n_slots] != 0).sum(1)
                if seq:
                    manual += v.sum(1) / np.maximum(cnt, 1)
                else:
                    manual += v.sum(1)
        w = np.asarray(params["dense_fo_w"])
        b = np.asarray(params["dense_fo_b"])
        manual += np.asarray(arr.dense) @ w + b.sum()
        np.testing.assert_allclose(np.asarray(fo)[:, 0], manual, rtol=1e-4)


class TestFM:
    def test_matches_explicit_pairwise(self):
        rng = np.random.default_rng(0)
        fe = jnp.asarray(rng.normal(size=(B, 5, 16)).astype(np.float32))
        fast = np.asarray(fm_interaction(fe))
        explicit = np.zeros((B, 1))
        fe_np = np.asarray(fe)
        for i in range(5):
            for j in range(i + 1, 5):
                explicit[:, 0] += (fe_np[:, i] * fe_np[:, j]).sum(-1)
        np.testing.assert_allclose(fast, explicit, rtol=1e-4)

    def test_single_field_is_zero(self):
        fe = jnp.ones((B, 1, 16))
        np.testing.assert_allclose(np.asarray(fm_interaction(fe)), 0.0, atol=1e-6)

    def test_shape(self):
        assert fm_interaction(jnp.ones((B, 4, 8))).shape == (B, 1)


class TestDNN:
    def test_shape_and_output_dim(self):
        m = DNN(hidden_units=(32, 16), dropout=0.0)
        x = jnp.ones((B, 24))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (B, 16)
        assert m.output_dim == 16

    def test_unknown_activation_raises(self):
        m = DNN(hidden_units=(8,), activation="nope")
        with pytest.raises(ValueError, match="Unknown activation"):
            m.init(jax.random.PRNGKey(0), jnp.ones((2, 4)))

    def test_empty_hidden_raises(self):
        m = DNN(hidden_units=())
        with pytest.raises(ValueError, match="non-empty"):
            m.init(jax.random.PRNGKey(0), jnp.ones((2, 4)))

    def test_batchnorm_updates_stats_in_train(self):
        m = DNN(hidden_units=(8,), dropout=0.0, use_batch_norm=True)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y, mut = m.apply(
            v, x * 3 + 1, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        before = np.asarray(v["batch_stats"]["bn_0"]["mean"])
        after = np.asarray(mut["batch_stats"]["bn_0"]["mean"])
        assert not np.allclose(before, after)

    def test_grad_flow(self):
        m = DNN(hidden_units=(8, 4), dropout=0.0)
        x = jnp.ones((B, 6))
        v = m.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.sum(m.apply({"params": p, **{k: v[k] for k in v if k != "params"}}, x) ** 2)

        g = jax.grad(loss)(v["params"])
        norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
        assert all(n > 0 for n in norms[:1])  # at least first kernel gets grad


class TestCIN:
    def test_output_dims_split_half(self):
        assert cin_output_dim([64], True) == 64
        assert cin_output_dim([128, 128], True) == 64 + 128
        assert cin_output_dim([128, 128, 64], True) == 64 + 64 + 64
        assert cin_output_dim([128, 128], False) == 256

    def test_forward_shape(self):
        m = CIN(num_fields=5, embed_dim=16, layer_sizes=(16, 16))
        fe = jnp.ones((B, 5, 16))
        v = m.init(jax.random.PRNGKey(0), fe)
        y = m.apply(v, fe)
        assert y.shape == (B, 8 + 16)

    def test_matches_manual_einsum(self):
        """Layer-1 output must equal relu(W @ outer(x0, x0)) sum-pooled."""
        rng = np.random.default_rng(0)
        f, d, m1 = 4, 8, 6
        m = CIN(num_fields=f, embed_dim=d, layer_sizes=(m1,), split_half=True)
        fe = jnp.asarray(rng.normal(size=(B, f, d)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), fe)
        w = np.asarray(v["params"]["conv_0_kernel"])  # (m1, f*f)
        b = np.asarray(v["params"]["conv_0_bias"])
        fe_np = np.asarray(fe)
        outer = np.einsum("bhd,bfd->bhfd", fe_np, fe_np).reshape(B, f * f, d)
        manual = np.maximum(
            np.einsum("mc,bcd->bmd", w, outer) + b[None, :, None], 0
        ).sum(2)
        got = np.asarray(m.apply(v, fe))
        np.testing.assert_allclose(got, manual, rtol=1e-4)

    def test_grad_flow(self):
        m = CIN(num_fields=3, embed_dim=8, layer_sizes=(8, 8))
        fe = jnp.ones((B, 3, 8))
        v = m.init(jax.random.PRNGKey(0), fe)
        g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, fe) ** 2))(
            v["params"]
        )
        total = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
        )
        assert total > 0


class TestAttention:
    def test_shape_preserving(self):
        m = MultiHeadSelfAttention(embed_dim=16, num_heads=2, attention_dim=16)
        fe = jnp.ones((B, 5, 16))
        v = m.init(jax.random.PRNGKey(0), fe)
        assert m.apply(v, fe).shape == (B, 5, 16)

    def test_bad_heads_raises(self):
        m = MultiHeadSelfAttention(embed_dim=16, num_heads=3, attention_dim=16)
        with pytest.raises(ValueError, match="divisible"):
            m.init(jax.random.PRNGKey(0), jnp.ones((2, 4, 16)))

    def test_softmax_rows_sum_to_one_effect(self):
        """With identical V rows, attention output = V row (softmax avg)."""
        m = MultiHeadSelfAttention(
            embed_dim=8, num_heads=1, attention_dim=8, num_layers=1,
            use_residual=False,
        )
        x = jnp.ones((2, 4, 8))  # all fields identical
        v = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(v, x))
        # identical inputs -> identical outputs across fields
        np.testing.assert_allclose(y[:, 0], y[:, 1], rtol=1e-5)

    def test_stacked_layers(self):
        m = MultiHeadSelfAttention(
            embed_dim=8, num_heads=2, attention_dim=8, num_layers=3
        )
        x = jnp.ones((2, 4, 8))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 4, 8)
        assert len(v["params"]) == 3  # block_0..2

    def test_attention_block_matches_manual_einsum(self):
        """The block (einsum formulation) against a hand-written
        einsum oracle at two field counts."""
        rng = np.random.default_rng(4)
        for f in (12, 70):
            d, h, a = 8, 2, 8
            m = MultiHeadSelfAttention(
                embed_dim=d, num_heads=h, attention_dim=a,
                use_residual=False,
            )
            x = jnp.asarray(rng.normal(size=(3, f, d)).astype(np.float32))
            v = m.init(jax.random.PRNGKey(1), x)
            got = np.asarray(m.apply(v, x))

            p = v["params"]["block_0"]
            hd = a // h
            q = (x.reshape(3 * f, d) @ p["wq"] + p["bq"]).reshape(3, f, h, hd)
            k = (x.reshape(3 * f, d) @ p["wk"] + p["bk"]).reshape(3, f, h, hd)
            vv = (x.reshape(3 * f, d) @ p["wv"] + p["bv"]).reshape(3, f, h, hd)
            s = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(hd)
            w = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", w, vv).reshape(3 * f, a)
            want = np.asarray(
                (ctx @ p["wo"] + p["bo"]).reshape(3, f, d)
            )
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
