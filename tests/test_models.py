"""Model-level tests: shapes, predict range, L2, registry
(reference test strategy: tests/test_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_synth_batch, make_synth_schema
from deepfm_tpu.data.packing import pack_features, pack_schema
from deepfm_tpu.models import MODEL_REGISTRY, create_model, embedding_l2_loss

B = 8


@pytest.fixture(scope="module")
def setup(request):
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, B, seed=0)
    arr = pack_features(packed, feats, labels)
    return packed, arr


@pytest.fixture(scope="module")
def small_cfg():
    from deepfm_tpu.config import config_from_dict

    return config_from_dict(
        {
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "cin": {"layer_sizes": [8, 8]},
            "attention": {"num_heads": 2, "attention_dim": 16},
        }
    )


@pytest.mark.parametrize("name", list(MODEL_REGISTRY))
def test_forward_and_predict(name, setup, small_cfg):
    packed, arr = setup
    model = create_model(name, packed, small_cfg)
    ids, dense = jnp.asarray(arr.ids), jnp.asarray(arr.dense)
    v = model.init(jax.random.PRNGKey(0), ids, dense)
    logits = model.apply(v, ids, dense)
    assert logits.shape == (B, 1)
    assert logits.dtype == jnp.float32
    probs = np.asarray(model.apply(v, ids, dense, method=model.predict))
    assert probs.shape == (B, 1)
    assert (probs >= 0).all() and (probs <= 1).all()


@pytest.mark.parametrize("name", list(MODEL_REGISTRY))
def test_grad_flow_all_params(name, setup, small_cfg):
    packed, arr = setup
    model = create_model(name, packed, small_cfg)
    ids, dense = jnp.asarray(arr.ids), jnp.asarray(arr.dense)
    v = model.init(jax.random.PRNGKey(0), ids, dense)

    def loss(p):
        out = model.apply({"params": p, **{k: v[k] for k in v if k != "params"}}, ids, dense)
        return jnp.sum(out**2)

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_l2_reg_positive(setup, small_cfg):
    packed, arr = setup
    model = create_model("deepfm", packed, small_cfg)
    v = model.init(
        jax.random.PRNGKey(0), jnp.asarray(arr.ids), jnp.asarray(arr.dense)
    )
    l2 = embedding_l2_loss(v["params"], 1e-5)
    assert float(l2) > 0


def test_l2_covers_embedding_only(setup, small_cfg):
    packed, arr = setup
    model = create_model("deepfm", packed, small_cfg)
    v = model.init(
        jax.random.PRNGKey(0), jnp.asarray(arr.ids), jnp.asarray(arr.dense)
    )
    manual = sum(
        float(jnp.sum(jnp.square(p)))
        for p in jax.tree_util.tree_leaves(v["params"]["embedding"])
    )
    assert float(embedding_l2_loss(v["params"], 1.0)) == pytest.approx(
        manual, rel=1e-6
    )


def test_registry_unknown_raises(setup, small_cfg):
    packed, _ = setup
    with pytest.raises(ValueError, match="Unknown model"):
        create_model("nope", packed, small_cfg)


def test_registry_names():
    # the reference's three models + the ablation baselines
    assert set(MODEL_REGISTRY) == {
        "deepfm", "xdeepfm", "attention_deepfm", "lr", "fm", "dnn",
    }


def test_accepts_dataset_schema(small_cfg):
    schema = make_synth_schema()
    model = create_model("deepfm", schema, small_cfg)
    assert model.packed.num_fields == schema.num_fields
