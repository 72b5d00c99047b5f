"""lazy_adam (row-sparse table Adam) tests: equivalence to dense Adam on
touched rows, untouched-row immutability, row-0 invariant, dedupe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfm_tpu.training.sparse_opt import (
    dedupe_ids,
    init_table_state,
    lazy_adam_table_update,
    table_ids_for_batch,
)


def test_dedupe_first_occurrence():
    ids = jnp.asarray([5, 3, 5, 7, 3, 3], jnp.int32)
    out = np.asarray(dedupe_ids(ids, 10))
    # each distinct id appears exactly once; others dropped to 10
    kept = out[out < 10]
    assert sorted(kept.tolist()) == [3, 5, 7]
    assert (out == 10).sum() == 3


def test_matches_dense_adam_on_touched_rows():
    import optax

    rng = np.random.default_rng(0)
    v, d, n = 32, 4, 12
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    grad_rows = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ids = jnp.asarray(rng.choice(v, n, replace=False).astype(np.int32))
    dense_grad = jnp.zeros((v, d)).at[ids].add(grad_rows)

    # dense adam reference
    tx = optax.adam(1e-2)
    st = tx.init(table)
    upd, _ = tx.update(dense_grad, st, table)
    dense_new = optax.apply_updates(table, upd)

    state = init_table_state(table)
    lazy_new, _ = lazy_adam_table_update(
        table, dense_grad, state, ids,
        lr=jnp.asarray(1e-2), step=jnp.asarray(0), l2=0.0,
    )
    # touched rows match dense adam step 1
    np.testing.assert_allclose(
        np.asarray(lazy_new)[np.asarray(ids)],
        np.asarray(dense_new)[np.asarray(ids)],
        rtol=1e-5,
    )
    # untouched rows unchanged
    untouched = np.setdiff1d(np.arange(v), np.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(lazy_new)[untouched], np.asarray(table)[untouched]
    )


def test_duplicate_ids_single_update():
    rng = np.random.default_rng(1)
    v, d = 16, 4
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray([3, 3, 3, 3], jnp.int32)
    g_row = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))
    dense_grad = jnp.zeros((v, d)).at[3].add(4.0 * g_row[0])  # accumulated

    state = init_table_state(table)
    new, new_state = lazy_adam_table_update(
        table, dense_grad, state, ids,
        lr=jnp.asarray(1e-2), step=jnp.asarray(0),
    )
    # exactly one Adam application with the ACCUMULATED gradient
    expected_mu = 0.1 * 4.0 * np.asarray(g_row[0])
    np.testing.assert_allclose(
        np.asarray(new_state.mu)[3], expected_mu, rtol=1e-5
    )
    # only row 3 changed
    changed = np.any(np.asarray(new) != np.asarray(table), axis=1)
    assert changed.tolist() == [False] * 3 + [True] + [False] * 12


def test_zero_grad_zero_weight_row_stays_zero():
    v, d = 8, 4
    table = jnp.zeros((v, d)).at[1:].set(1.0)
    state = init_table_state(table)
    new, _ = lazy_adam_table_update(
        table, jnp.zeros((v, d)), state, jnp.asarray([0, 0], jnp.int32),
        lr=jnp.asarray(1e-2), step=jnp.asarray(0), l2=1e-3,
    )
    np.testing.assert_array_equal(np.asarray(new)[0], np.zeros(d))


def test_lazy_l2_decays_touched_rows():
    v, d = 8, 4
    table = jnp.ones((v, d))
    state = init_table_state(table)
    new, _ = lazy_adam_table_update(
        table, jnp.zeros((v, d)), state, jnp.asarray([2], jnp.int32),
        lr=jnp.asarray(1e-2), step=jnp.asarray(0), l2=0.5,
    )
    # row 2 decays (grad = 2*0.5*1 = 1), others untouched
    assert np.asarray(new)[2].max() < 1.0
    np.testing.assert_array_equal(np.asarray(new)[3], np.ones(d))


def test_table_ids_for_batch(synth_schema):
    from deepfm_tpu.data.packing import pack_schema

    packed = pack_schema(synth_schema)
    ids = jnp.zeros((4, packed.num_slots), jnp.int32).at[:, :].set(1)
    tids = table_ids_for_batch(packed, ids)
    # first-order weights ride as a table column, so the width tables are
    # the only sparse-update targets
    assert set(tids) == {"table_w8", "table_w16"}
    assert tids["table_w16"].shape == (4 * 2,)  # 2 sparse slots of width 16


def test_trainer_lazy_adam_learns(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 128, seed=2)
    labels = (((feats["user"] + feats["item"]) % 2) == 0).astype(np.float32)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {
                "batch_size": 64,
                "num_epochs": 3,
                "optimizer": "lazy_adam",
                "scheduler": "none",
            },
        }
    )
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    first_loss, _ = tr._train_epoch()
    for _ in range(3):
        last_loss, _ = tr._train_epoch()
    assert last_loss < first_loss
    # padding rows stayed exactly zero through lazy updates
    p = tr.state.params["embedding"]
    for g in packed.lookup_groups:
        tab = np.asarray(p[f"table_w{g.width}"])
        for off in np.unique(g.local_offsets):
            assert abs(tab[off]).max() == 0.0


def test_packed_lazy_adam_matches_logical(tmp_path):
    """lazy_adam on PACKED tables (physical-row granularity): with the
    same batch repeated, every physical row's touched set is identical
    each step, so packed-lazy must track logical-lazy exactly — and the
    OOV/padding logical rows must stay zero inside the packed layout.

    l2 is set to 0 here: with l2 > 0 the packed variant lazily decays
    whole physical rows (untouched neighbors included), which is
    intentionally closer to dense Adam's every-row decay than to
    logical-lazy — an expected, documented semantic difference, not a
    bug (see table_ids_for_batch docstring)."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer
    from deepfm_tpu.utils.layout import unpack_table

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 32, seed=9)
    arr = pack_features(packed, feats, labels)

    def run(layout, init_emb=None):
        from deepfm_tpu.utils.layout import pack_table

        cfg = config_from_dict(
            {
                "output_dir": str(tmp_path / layout),
                "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
                "feature": {"embedding_l2_reg": 0.0},
                "training": {
                    "batch_size": 32,
                    "optimizer": "lazy_adam",
                    "scheduler": "none",
                },
                "pallas": {"table_layout": layout},
            }
        )
        model = create_model("deepfm", packed, cfg)
        assert model.packed_tables == (layout == "packed")
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        if init_emb is not None:
            # transplant the logical run's initial tables (init RNG draws
            # differ across layouts; the comparison needs one start point)
            emb = dict(tr.state.params["embedding"])
            for g in packed.lookup_groups:
                d = g.width
                pk = 128 // (d + 1)
                src = np.asarray(init_emb[f"table_w{d}"])
                if pk > 1:
                    phys = emb[f"table_w{d}"].shape[0]
                    src = pack_table(src, d + 1, pk, phys)
                emb[f"table_w{d}"] = jnp.asarray(src)
            params = dict(tr.state.params)
            params["embedding"] = {
                k: emb.get(k, v)
                for k, v in tr.state.params["embedding"].items()
            }
            tr.state = tr.state.replace(params=params)
        ids, dense, lab, w = tr._put_batch(
            arr.ids, arr.dense, arr.labels, np.ones((32,), np.float32)
        )
        # snapshot BEFORE stepping: _train_step donates the state
        init_snapshot = jax.device_get(tr.state.params["embedding"])
        state = tr.state
        for _ in range(3):
            state, loss = tr._train_step(state, ids, dense, lab, w)
        preds = tr._eval_step(state.params, state.batch_stats, ids, dense)
        return (
            np.asarray(preds),
            jax.device_get(state.params["embedding"]),
            init_snapshot,
        )

    preds_l, emb_l, init_l = run("logical")
    preds_p, emb_p, _ = run("packed", init_emb=init_l)
    np.testing.assert_allclose(preds_p, preds_l, rtol=2e-5, atol=2e-6)

    # layout-level parity of the trained tables + zero padding rows
    for g in packed.lookup_groups:
        d = g.width
        pack = 128 // (d + 1)
        tab_p = np.asarray(emb_p[f"table_w{d}"])
        tab_l = np.asarray(emb_l[f"table_w{d}"])
        if pack > 1:
            tab_p = unpack_table(tab_p, d + 1, pack, tab_l.shape[0])
        np.testing.assert_allclose(tab_p, tab_l, rtol=2e-5, atol=2e-6)
        for off in np.unique(g.local_offsets):
            assert abs(tab_p[off]).max() == 0.0
