"""Trainer tests: smoke train, eval ranges, weight updates, scheduler,
resume (reference test strategy: tests/test_trainer.py + resume addition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_synth_batch, make_synth_schema
from deepfm_tpu.data.dataset import iterate_batches
from deepfm_tpu.data.packing import pack_features, pack_schema
from deepfm_tpu.models import create_model
from deepfm_tpu.training.trainer import PlateauScheduler, Trainer


def _make_data(n=128, seed=1):
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, n, seed=seed)
    # learnable structure with per-user label variety (so ranking groups
    # keep both classes): label = parity of user+item
    labels = (((feats["user"] + feats["item"]) % 2) == 0).astype(np.float32)
    feats["user_id"] = feats["user"]
    arr = pack_features(packed, feats, labels)
    return packed, arr


def _cfg(tmp_path, **training):
    from deepfm_tpu.config import config_from_dict

    tr = {"batch_size": 32, "num_epochs": 2, "scheduler": "none"}
    tr.update(training)
    return config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": tr,
        }
    )


def test_smoke_train_returns_metrics(tmp_path):
    packed, arr = _make_data()
    cfg = _cfg(tmp_path)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    best = tr.train()
    assert "auc" in best and "logloss" in best
    assert 0.0 <= best["auc"] <= 1.0
    assert (tmp_path / "results.json").exists()
    assert (tmp_path / "best_model").exists()


def test_evaluate_ranges(tmp_path):
    packed, arr = _make_data()
    cfg = _cfg(tmp_path)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    m = tr.evaluate(arr)
    assert 0.0 <= m["auc"] <= 1.0
    assert m["logloss"] > 0
    # ranking metrics present because user_ids were packed
    assert any(k.startswith("HR@") for k in m)


def test_weights_change_after_step(tmp_path):
    packed, arr = _make_data()
    cfg = _cfg(tmp_path)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    before = jax.device_get(tr.state.params)
    batch = next(iterate_batches(arr, 32))
    ids, dense, lab, w = tr._put_batch(
        batch.ids, batch.dense, batch.labels, batch.weights
    )
    tr.state, _ = tr._train_step(tr.state, ids, dense, lab, w)
    after = jax.device_get(tr.state.params)
    diffs = [
        float(np.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        )
    ]
    assert max(diffs) > 0


def test_padded_rows_do_not_affect_loss(tmp_path):
    """Loss on a padded batch must equal loss on the unpadded rows."""
    packed, arr = _make_data(n=24)
    cfg = _cfg(tmp_path, batch_size=32)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    batch = next(iterate_batches(arr, 32))  # 24 real + 8 padded
    assert batch.weights.sum() == 24
    ids, dense, lab, w = tr._put_batch(
        batch.ids, batch.dense, batch.labels, batch.weights
    )
    # manual weighted loss check
    import optax

    has_bn = bool(tr.state.batch_stats)
    variables = {"params": tr.state.params}
    if has_bn:
        variables["batch_stats"] = tr.state.batch_stats
    logits = model.apply(variables, ids, dense)[:, 0]
    per = optax.sigmoid_binary_cross_entropy(logits, lab)
    manual = float((per * w).sum() / w.sum())
    unpadded = float(np.asarray(per)[:24].mean())
    assert manual == pytest.approx(unpadded, rel=1e-6)


def test_resume_roundtrip(tmp_path):
    packed, arr = _make_data()
    cfg = _cfg(tmp_path, num_epochs=2, resume=True)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    tr.train()
    step_after = int(jax.device_get(tr.state.step))

    cfg2 = _cfg(tmp_path, num_epochs=4, resume=True)
    model2 = create_model("deepfm", packed, cfg2)
    tr2 = Trainer(model2, packed, cfg2, arr, arr, arr)
    meta = tr2._try_resume()
    assert meta is not None
    assert meta["epoch"] == 2
    assert int(jax.device_get(tr2.state.step)) == step_after
    # resumed params identical to saved ones
    a = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # per-epoch history rides the resume meta
    assert [h["epoch"] for h in tr2.history] == [1, 2]


def test_predict_streams_large_splits(tmp_path):
    """A split bigger than the staging budget is scored chunk-by-chunk
    (bounded eval memory) with scores identical to the staged path."""
    packed, arr = _make_data(n=256)
    cfg_stream = _cfg(tmp_path / "a", stage_budget_mb=0)  # 1 batch/chunk
    model = create_model("deepfm", packed, cfg_stream)
    tr = Trainer(model, packed, cfg_stream, arr, arr, arr)
    streamed = tr.predict(arr)
    assert len(streamed) == 256
    assert not hasattr(tr, "_eval_stage_cache") or not tr._eval_stage_cache

    cfg_staged = _cfg(tmp_path / "b", stage_budget_mb=1024)
    model2 = create_model("deepfm", packed, cfg_staged)
    tr2 = Trainer(model2, packed, cfg_staged, arr, arr, arr)
    tr2.state = tr2.state.replace(
        params=tr.state.params, batch_stats=tr.state.batch_stats
    )
    np.testing.assert_allclose(streamed, tr2.predict(arr), atol=1e-6)


def test_history_in_results(tmp_path):
    import json

    packed, arr = _make_data()
    cfg = _cfg(tmp_path, num_epochs=2)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    tr.train()
    res = json.loads((tmp_path / "results.json").read_text())
    h = res["history"]
    assert [e["epoch"] for e in h] == [1, 2]
    for rec in h:
        assert {"train_loss", "lr", "epoch_seconds", "examples_per_sec",
                "val_auc", "val_logloss"} <= set(rec)
        assert np.isfinite(rec["train_loss"])


def test_load_best_restores_params(tmp_path):
    packed, arr = _make_data()
    cfg = _cfg(tmp_path)
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    tr.train()
    best_params = jax.device_get(tr.state.params)
    # perturb live state, then restore best
    tr.state = tr.state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, tr.state.params)
    )
    tr.load_best()
    restored = jax.device_get(tr.state.params)
    # best checkpoint was saved at some epoch <= final; params must be
    # finite and differ from the perturbed ones
    for x, y in zip(
        jax.tree_util.tree_leaves(best_params),
        jax.tree_util.tree_leaves(restored),
    ):
        assert np.isfinite(np.asarray(y)).all()
        assert not np.allclose(np.asarray(y), np.asarray(x) + 1.0)


class TestPlateauScheduler:
    def test_reduces_after_patience(self):
        s = PlateauScheduler(lr=1.0, factor=0.5, patience=2)
        assert s.step(0.5) == 1.0  # best
        assert s.step(0.5) == 1.0  # bad 1
        assert s.step(0.5) == 1.0  # bad 2
        assert s.step(0.5) == 0.5  # bad 3 > patience -> reduce
        assert s.step(0.6) == 0.5  # new best resets

    def test_improvement_resets(self):
        s = PlateauScheduler(lr=1.0, factor=0.5, patience=1)
        s.step(0.5)
        s.step(0.4)
        assert s.step(0.6) == 1.0  # improvement -> no reduction
        assert s.num_bad == 0

    def test_disabled(self):
        s = PlateauScheduler(lr=1.0, enabled=False)
        for _ in range(10):
            assert s.step(0.0) == 1.0

    def test_state_roundtrip(self):
        s = PlateauScheduler(lr=1.0)
        s.step(0.5)
        s.step(0.4)
        d = s.state_dict()
        s2 = PlateauScheduler(lr=123.0)
        s2.load_state_dict(d)
        assert s2.lr == s.lr and s2.best == s.best and s2.num_bad == s.num_bad


class TestCosineScheduler:
    def test_trajectory(self):
        from deepfm_tpu.training.trainer import CosineScheduler

        s = CosineScheduler(lr=1.0, total_epochs=10, warmup_epochs=3)
        lrs = [s.lr] + [s.step(0.0) for _ in range(9)]
        assert lrs[0] == pytest.approx(1 / 3)  # epoch 1: warmup ramp
        assert lrs[1] == pytest.approx(2 / 3)
        assert lrs[2] == pytest.approx(1.0)  # warmup peak
        assert lrs[-1] == pytest.approx(0.01)  # min_frac * base
        # cosine decay is monotone non-increasing after the peak
        assert all(a >= b - 1e-12 for a, b in zip(lrs[2:], lrs[3:]))

    def test_no_warmup_starts_at_base(self):
        from deepfm_tpu.training.trainer import CosineScheduler

        s = CosineScheduler(lr=0.5, total_epochs=4)
        assert s.lr == pytest.approx(0.5)
        s.step(0.0)
        assert s.lr < 0.5

    def test_state_roundtrip(self):
        from deepfm_tpu.training.trainer import CosineScheduler

        s = CosineScheduler(lr=1.0, total_epochs=8, warmup_epochs=2)
        s.step(0.0)
        s.step(0.0)
        d = s.state_dict()
        s2 = CosineScheduler(lr=9.0, total_epochs=8, warmup_epochs=2)
        s2.load_state_dict(d)
        assert s2.lr == s.lr and s2.epoch == s.epoch

    def test_trainer_applies_warmup_lr(self, tmp_path):
        """Epoch 1 runs at the warmed-up LR, not the base LR."""
        packed, arr = _make_data()
        cfg = _cfg(
            tmp_path,
            scheduler="warmup_cosine",
            warmup_epochs=2,
            num_epochs=4,
            lr=0.01,
        )
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        lr0 = float(tr.state.opt_state.hyperparams["learning_rate"])
        assert lr0 == pytest.approx(0.005)  # base * 1/2
        best = tr.train()
        assert np.isfinite(best["auc"])
        # after training, the scheduler sits at/below the base LR
        assert tr.scheduler.lr <= 0.01 + 1e-12


def test_epoch_scan_matches_per_step_loop(tmp_path):
    """The one-dispatch lax.scan epoch must be numerically identical to
    stepping batch-by-batch (same shuffle order, same dropout folding)."""
    packed, arr = _make_data(n=96, seed=3)
    cfg = _cfg(tmp_path, batch_size=32, num_epochs=1)

    def run(step_fn):
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        tr.np_rng = np.random.default_rng(0)  # fix the shuffle stream
        [(nb, staged)] = tr._stage_chunks(
            arr, 32, shuffle=True, drop_remainder=True
        )
        return step_fn(tr, nb, staged)

    def via_scan(tr, nb, staged):
        state, loss = tr._epoch_scan(tr.state, staged)
        return float(loss), jax.device_get(state.params)

    def via_loop(tr, nb, staged):
        total = 0.0
        for i in range(nb):
            ids, dense, labels, weights = tr._slice_batch(staged, i)
            tr.state, loss = tr._train_step(
                tr.state, ids, dense, labels, weights
            )
            total += float(loss)
        return total, jax.device_get(tr.state.params)

    loss_s, params_s = run(via_scan)
    loss_l, params_l = run(via_loop)
    assert loss_s == pytest.approx(loss_l, rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_s), jax.tree_util.tree_leaves(params_l)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_l2_as_weight_decay_matches_loss_term(tmp_path):
    """Optimizer-fused embedding L2 (add_decayed_weights before clip) must
    produce the same update as the reference's loss-term formulation."""
    import optax

    from deepfm_tpu.models.base import embedding_l2_loss

    packed, arr = _make_data(n=32, seed=5)
    l2 = 1e-3
    cfg = _cfg(tmp_path, optimizer="sgd", gradient_clip_norm=1.0)
    cfg = cfg.__class__(**{**cfg.__dict__})  # frozen copy
    from deepfm_tpu.config import config_from_dict

    cfg = config_from_dict(
        {
            "output_dir": str(tmp_path),
            "feature": {"embedding_l2_reg": l2},
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {
                "batch_size": 32, "num_epochs": 1, "scheduler": "none",
                "optimizer": "sgd", "gradient_clip_norm": 1.0,
            },
        }
    )
    model = create_model("deepfm", packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    batch = next(iterate_batches(arr, 32))
    ids, dense, lab, w = tr._put_batch(
        batch.ids, batch.dense, batch.labels, batch.weights
    )
    before = jax.device_get(tr.state.params)
    tr.state, _ = tr._train_step(tr.state, ids, dense, lab, w)
    after_decay = jax.device_get(tr.state.params)

    # manual reference: grad of (bce + l2 loss term), clip, sgd — with the
    # same train-mode forward (BN batch statistics) as the real step
    bs = jax.device_get(tr.state.batch_stats)

    def loss_fn(p):
        vb = {"params": p, "batch_stats": bs} if bs else {"params": p}
        logits, _ = model.apply(
            vb, ids, dense, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        logits = logits[:, 0]
        per = optax.sigmoid_binary_cross_entropy(logits, lab)
        loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss + embedding_l2_loss(p, l2)

    g = jax.grad(loss_fn)(before)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3, momentum=0.9))
    upd, _ = tx.update(g, tx.init(before), before)
    want = optax.apply_updates(before, upd)
    for a, b in zip(
        jax.tree_util.tree_leaves(after_decay), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_chunked_staging_matches_single_chunk(tmp_path):
    """A tiny stage budget (multiple chunks per epoch) must train exactly
    like the single-chunk path: same shuffle stream, same updates."""
    packed, arr = _make_data(n=128, seed=7)

    def run(budget_mb):
        from deepfm_tpu.config import config_from_dict

        cfg = config_from_dict(
            {
                "output_dir": str(tmp_path / f"b{budget_mb}"),
                "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
                "training": {
                    "batch_size": 32, "num_epochs": 2, "scheduler": "none",
                    "stage_budget_mb": budget_mb,
                },
            }
        )
        model = create_model("deepfm", packed, cfg)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        loss, nb = tr._train_epoch()
        return loss, nb, jax.device_get(tr.state.params)

    # budget 0 -> 1 batch per chunk (4 chunks); huge budget -> 1 chunk
    loss_a, n_a, p_a = run(0)
    loss_b, n_b, p_b = run(4096)
    assert n_a == n_b
    assert loss_a == pytest.approx(loss_b, rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
