"""Real-TPU exactness spot-checks.

Lives OUTSIDE tests/ because tests/conftest.py pins the suite to the CPU
backend; run on a machine with a TPU attached:

    python -m pytest tests_tpu/ -q

The CPU suite validates every kernel in Mosaic interpret mode; these
tests re-validate the compiled Mosaic artifacts on hardware, where
layout/tiling behavior (and the MXU's bf16 quantization of f32 matmuls)
actually applies.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU attached")
    return jax


def test_densify_exact_vs_scatter(tpu):
    import jax.numpy as jnp

    from deepfm_tpu.ops.pallas.grad_kernel import densify_rows_grad

    rng = np.random.default_rng(0)
    v, d, n = 1_000_448, 17, 65_536
    ids = rng.integers(0, v, n).astype(np.int32)
    ids[:500] = 0  # padding ids
    ids[500:600] = 777  # hot id
    ct = rng.normal(size=(n, d)).astype(np.float32)
    got = densify_rows_grad(jnp.asarray(ct), jnp.asarray(ids), v)
    want = jnp.zeros((v, d), jnp.float32).at[jnp.asarray(ids)].add(
        jnp.asarray(ct)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_cin_stack_kernel_vs_oracle(tpu):
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.ops.cin import CIN

    rng = np.random.default_rng(1)
    b, f, d = 512, 16, 16
    x0 = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    def run(use_pallas):
        m = CIN(
            num_fields=f, embed_dim=d, layer_sizes=(32, 32),
            split_half=True, use_pallas_stack=use_pallas,
        )
        v = m.init(jax.random.PRNGKey(0), x0)
        return np.asarray(m.apply(v, x0))

    ref = run(False)
    got = run(True)
    # MXU bf16 quantization tolerance on the f32 path
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_train_step_kernel_vs_xla_lookup(tpu):
    """One DeepFM train step with the densify-backward lookup must match
    the XLA gather/scatter lookup bit-closely on hardware."""
    import jax
    import jax.numpy as jnp
    from cpu_conftest_helpers import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.ops.embedding import default_lookup
    from deepfm_tpu.ops.pallas.grad_kernel import sparse_grad_lookup
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 64, seed=3)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": "/tmp/tpu_exact",
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 64, "optimizer": "sgd",
                         "scheduler": "none"},
        }
    )

    def one_step(lookup):
        model = create_model("deepfm", packed, cfg, lookup_fn=lookup)
        tr = Trainer(model, packed, cfg, arr, arr, arr)
        ids = jnp.asarray(arr.ids)
        dense = jnp.asarray(arr.dense)
        lab = jnp.asarray(arr.labels)
        w = jnp.ones((64,), jnp.float32)
        state, loss = tr._train_step(tr.state, ids, dense, lab, w)
        return float(loss), jax.device_get(state.params)

    loss_k, p_k = one_step(sparse_grad_lookup)
    loss_x, p_x = one_step(default_lookup)
    assert loss_k == pytest.approx(loss_x, rel=1e-6)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(p_k), jax.tree_util.tree_leaves(p_x)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
