"""Sharding tests on the 8-virtual-device CPU mesh: sharded lookups must
equal the unsharded gather bitwise-ish (values AND gradients), and the DP
train step must match single-device numerics (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfm_tpu.parallel import (
    AXIS_DATA,
    AXIS_MODEL,
    build_mesh,
    make_a2a_lookup,
    make_psum_lookup,
)
from deepfm_tpu.parallel.sharding import batch_shardings, state_shardings

V, D_EMB = 256, 16  # divisible by any model axis <= 8


@pytest.fixture(scope="module")
def mesh42():
    return build_mesh(4, 2)


@pytest.fixture(scope="module")
def mesh24():
    return build_mesh(2, 4)


def _table_ids(n=64, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, D_EMB)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, n).astype(np.int32))
    return table, ids


@pytest.mark.parametrize("mesh_name", ["mesh42", "mesh24"])
@pytest.mark.parametrize("maker", [make_psum_lookup, make_a2a_lookup])
def test_sharded_lookup_matches_gather(mesh_name, maker, request):
    mesh = request.getfixturevalue(mesh_name)
    table, ids = _table_ids()
    lookup = maker(mesh)
    got = jax.jit(lookup)(table, ids)
    expected = np.asarray(table)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


@pytest.mark.parametrize("maker", [make_psum_lookup, make_a2a_lookup])
def test_sharded_lookup_gradients_match(mesh42, maker):
    table, ids = _table_ids()
    lookup = maker(mesh42)

    def loss_sharded(tbl):
        rows = lookup(tbl, ids)
        return jnp.sum(rows * rows * 0.5)

    def loss_ref(tbl):
        rows = jnp.take(tbl, ids, axis=0)
        return jnp.sum(rows * rows * 0.5)

    g1 = jax.jit(jax.grad(loss_sharded))(table)
    g2 = jax.jit(jax.grad(loss_ref))(table)
    # duplicate ids must scatter-add identically
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_a2a_skewed_ids_overflow_fallback(mesh24):
    """All ids owned by one shard: capacity buckets overflow, psum fallback
    must keep the result exact."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(V, D_EMB)).astype(np.float32))
    # every id in shard 3's row range
    ids = jnp.asarray(
        rng.integers(3 * V // 4, V, 64).astype(np.int32)
    )
    lookup = make_a2a_lookup(mesh24)
    got = jax.jit(lookup)(table, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(table)[np.asarray(ids)], rtol=1e-6
    )


def test_state_sharding_rules(mesh42):
    tree = {
        "embedding": {
            "table_w16": jnp.zeros((128, 16)),
            "fo_table": jnp.zeros((128, 1)),
            "dense_w8": jnp.zeros((4, 8)),
        },
        "dnn": {"dense_0": {"kernel": jnp.zeros((8, 4))}},
    }
    sh = state_shardings(mesh42, tree)
    assert sh["embedding"]["table_w16"].spec == jax.sharding.PartitionSpec(
        AXIS_MODEL, None
    )
    assert sh["embedding"]["fo_table"].spec == jax.sharding.PartitionSpec(
        AXIS_MODEL, None
    )
    assert sh["embedding"]["dense_w8"].spec == jax.sharding.PartitionSpec()
    assert sh["dnn"]["dense_0"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_batch_sharding_rules(mesh42):
    sh = batch_shardings(mesh42, [jnp.zeros((16, 6)), jnp.zeros((16,))])
    assert sh[0].spec == jax.sharding.PartitionSpec(AXIS_DATA, None)
    assert sh[1].spec == jax.sharding.PartitionSpec(AXIS_DATA)


def test_sharded_train_step_matches_unsharded():
    """One full DeepFM train step: (4 data x 2 model) sharded with psum
    lookup vs single-device; loss and updated params must agree."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.dataset import iterate_batches
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.parallel import make_lookup_fn
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 32, seed=5)
    arr = pack_features(packed, feats, labels)
    # SGD: the update is lr*grad, so cross-mesh float noise stays ~1e-7.
    # (Adam's first step normalizes by |g|, amplifying 1e-7 gradient noise
    # to the learning rate for near-zero grads.)
    cfg = config_from_dict(
        {
            "output_dir": "/tmp/ptest",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 32, "optimizer": "sgd"},
        }
    )

    def one_step(mesh, lookup_fn):
        model = create_model("deepfm", packed, cfg, lookup_fn=lookup_fn)
        tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
        batch = next(iterate_batches(arr, 32))
        ids, dense, lab, w = tr._put_batch(
            batch.ids, batch.dense, batch.labels, batch.weights
        )
        state, loss = tr._train_step(tr.state, ids, dense, lab, w)
        return float(loss), jax.device_get(state.params)

    mesh = build_mesh(4, 2)
    loss_sh, params_sh = one_step(mesh, make_lookup_fn(mesh, "psum"))
    loss_1, params_1 = one_step(None, None)
    assert loss_sh == pytest.approx(loss_1, rel=1e-5)
    flat_sh = jax.tree_util.tree_leaves(params_sh)
    flat_1 = jax.tree_util.tree_leaves(params_1)
    for a, b in zip(flat_sh, flat_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("model_name", ["xdeepfm", "attention_deepfm"])
def test_pallas_kernels_under_mesh(model_name):
    """Kernel-enabled models must compile and run under a (data, model)
    mesh (GSPMD partitions around the custom calls)."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.dataset import iterate_batches
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.parallel import make_lookup_fn
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 32, seed=5)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": "/tmp/ptest_mesh",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 32},
            "attention": {"num_heads": 2, "attention_dim": 16},
            "cin": {"layer_sizes": [8, 8]},
        }
    )
    mesh = build_mesh(4, 2)
    model = create_model(
        model_name, packed, cfg, lookup_fn=make_lookup_fn(mesh, "psum")
    )
    tr = Trainer(model, packed, cfg, arr, arr, arr, mesh=mesh)
    batch = next(iterate_batches(arr, 32))
    ids, dense, lab, w = tr._put_batch(
        batch.ids, batch.dense, batch.labels, batch.weights
    )
    tr.state, loss = tr._train_step(tr.state, ids, dense, lab, w)
    assert np.isfinite(float(loss))


def test_psum_lookup_grad_kernel_parity():
    """The Pallas densify backward inside shard_map must match the plain
    take() backward (forced on in interpret mode on the CPU mesh)."""
    from deepfm_tpu.parallel.embedding_shard import make_psum_lookup

    mesh = build_mesh(2, 4)
    v, d, n = 512, 8, 64
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    up = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def loss(lookup):
        return lambda t: jnp.sum(lookup(t, ids) * up)

    base = make_psum_lookup(mesh, use_grad_kernel=False)
    kern = make_psum_lookup(mesh, use_grad_kernel=True)
    np.testing.assert_allclose(
        float(loss(base)(table)), float(loss(kern)(table)), rtol=1e-6
    )
    g0 = jax.grad(loss(base))(table)
    g1 = jax.grad(loss(kern))(table)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-6
    )


def test_checkpoint_restores_across_mesh_shapes(tmp_path):
    """A best-checkpoint saved from a sharded (4x2) trainer must restore
    into an unsharded trainer (and keep values), per SURVEY §5.4."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.parallel import make_lookup_fn
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 64, seed=11)
    feats["user_id"] = feats["user"]
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {
                "batch_size": 32, "num_epochs": 1, "scheduler": "none",
            },
        }
    )

    mesh = build_mesh(4, 2)
    m_sh = create_model("deepfm", packed, cfg, lookup_fn=make_lookup_fn(mesh, "psum"))
    tr_sh = Trainer(m_sh, packed, cfg, arr, arr, arr, mesh=mesh)
    tr_sh.train()  # saves best_model under the sharded state
    saved = jax.device_get(tr_sh.state.params)

    m1 = create_model("deepfm", packed, cfg)
    tr1 = Trainer(m1, packed, cfg, arr, arr, arr)  # no mesh
    tr1.load_best()
    restored = jax.device_get(tr1.state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(saved), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # restored trainer must be able to evaluate
    m = tr1.evaluate(arr)
    assert 0.0 <= m["auc"] <= 1.0


class TestRingAttention:
    def _qkv(self, b=4, f=32, h=2, dh=8, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.normal(size=(b, f, h, dh)).astype(np.float32)
        )
        return mk(), mk(), mk()

    def _oracle(self, q, k, v):
        scale = 1.0 / np.sqrt(q.shape[-1])
        s = jnp.einsum("bqhd,bkhd->bqhk", q, k) * scale
        return jnp.einsum("bqhk,bkhd->bqhd", jax.nn.softmax(s, -1), v)

    def test_matches_unsharded(self):
        from deepfm_tpu.parallel.ring_attention import ring_field_attention

        mesh = build_mesh(2, 4)  # F=32 sharded 4 ways
        q, k, v = self._qkv()
        got = ring_field_attention(q, k, v, mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(self._oracle(q, k, v)),
            rtol=2e-5, atol=2e-6,
        )

    def test_model_axis_one_falls_back(self):
        from deepfm_tpu.parallel.ring_attention import ring_field_attention

        mesh = build_mesh(8, 1)
        q, k, v = self._qkv(f=16)
        got = ring_field_attention(q, k, v, mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(self._oracle(q, k, v)),
            rtol=2e-5, atol=2e-6,
        )

    def test_grad_flows(self):
        from deepfm_tpu.parallel.ring_attention import ring_field_attention

        mesh = build_mesh(2, 4)
        q, k, v = self._qkv(f=8)

        def loss(fn):
            return lambda q: jnp.sum(fn(q, k, v) ** 2)

        g_ring = jax.grad(loss(lambda *a: ring_field_attention(*a, mesh)))(q)
        g_ref = jax.grad(loss(self._oracle))(q)
        np.testing.assert_allclose(
            np.asarray(g_ring), np.asarray(g_ref), rtol=2e-4, atol=2e-5
        )
