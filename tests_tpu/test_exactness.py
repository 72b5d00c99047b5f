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


@pytest.mark.parametrize(
    "layers,split",
    [
        ((128, 128), True),       # flagship bench geometry
        ((64,), False),           # xdeepfm_movielens config
        ((128, 128, 64), True),   # cin_tuned config (3 layers)
    ],
)
def test_cin_stack_backward_criteo_shape(tpu, layers, split):
    """F=27 (729/1728 input channels): the fused stack BACKWARD kernel
    (f-major chunked outer products — see cin_stack_kernel.py) must
    match the XLA adjoints on hardware at the rel-L2 level, across the
    shipped layer geometries. Element-wise max comparisons are
    meaningless here: MXU bf16 quantization flips ReLU boundary masks
    between the two computations."""
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.ops.cin import cin_compress, cin_layer_sizes
    from deepfm_tpu.ops.pallas.cin_stack_kernel import make_cin_stack_pallas

    f, d, b = 27, 16, 2048
    ds_, ns_ = cin_layer_sizes(layers, split)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    ws, bs = [], []
    prev = f
    for i, ls in enumerate(layers):
        ws.append(jnp.asarray(
            rng.normal(size=(ls, prev * f)).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(
            rng.normal(size=(ls,)).astype(np.float32) * 0.1))
        prev = ns_[i] if (split and i < len(layers) - 1) else ls

    fn = make_cin_stack_pallas(layers, split)

    def oracle(x0, ws, bs):
        hidden = x0
        outs = []
        for i, ls in enumerate(layers):
            comp = jax.nn.relu(cin_compress(hidden, x0, ws[i], bs[i]))
            if split and i < len(layers) - 1:
                direct = comp[:, : ds_[i], :]
                hidden = comp[:, ds_[i] :, :]
            else:
                direct = comp
                hidden = comp
            outs.append(jnp.sum(direct, axis=2))
        return jnp.concatenate(outs, axis=1)

    g = jnp.asarray(rng.normal(size=(b, fn.output_dim)).astype(np.float32))
    gk = jax.jit(jax.grad(
        lambda *A: jnp.sum(fn(*A) * g), argnums=(0, 1, 2)))(x0, ws, bs)
    go = jax.jit(jax.grad(
        lambda *A: jnp.sum(oracle(*A) * g), argnums=(0, 1, 2)))(x0, ws, bs)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(go)
    ):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b_, np.float64)
        rel_l2 = np.linalg.norm(a64 - b64) / max(np.linalg.norm(b64), 1e-9)
        assert rel_l2 < 0.03, f"shape {a64.shape}: rel L2 {rel_l2:.4f}"


def test_attention_kernel_criteo_field_count(tpu):
    """F=27 pads the field axis to 32 in-kernel; padded keys must get no
    attention mass on hardware."""
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.ops.attention import MultiHeadSelfAttention

    rng = np.random.default_rng(3)
    b, f, d = 512, 27, 16
    x = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))

    def run(use_pallas):
        m = MultiHeadSelfAttention(
            embed_dim=d, num_heads=4, attention_dim=64,
            use_pallas=use_pallas,
        )
        v = m.init(jax.random.PRNGKey(0), x)
        return np.asarray(m.apply(v, x))

    ref = run(False)
    got = run(True)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)

def test_attention_fmajor_grads_on_hardware(tpu):
    """Feature-major fused attention: dx AND every param grad vs the XLA
    tower, compiled Mosaic on hardware (interpret mode cannot catch
    layout miscompiles; tolerances absorb MXU bf16 quantization)."""
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.ops.attention import MultiHeadSelfAttention
    from deepfm_tpu.ops.pallas.attention_fmajor_kernel import fmajor_tile

    rng = np.random.default_rng(7)
    b, f, d, h, a = 256, 27, 16, 4, 64
    # bf16 input: the production configuration (compute_dtype), and the
    # only one the kernel engages at F=27 — the f32 buffers exceed the
    # VMEM budget (fmajor_tile(..., itemsize=4) is None by design)
    assert fmajor_tile(b, f, d, a, h, 2) is not None
    x = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def grads(use_pallas):
        m = MultiHeadSelfAttention(
            embed_dim=d, num_heads=h, attention_dim=a,
            use_residual=True, use_pallas=use_pallas,
        )
        v = m.init(jax.random.PRNGKey(0), x)

        def loss(params, z):
            return jnp.sum(m.apply(params, z) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))(v, x)

    gp_ref, gx_ref = grads(False)
    gp_fm, gx_fm = grads(True)
    np.testing.assert_allclose(
        np.asarray(gx_ref), np.asarray(gx_fm), rtol=3e-2, atol=3e-2
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(gp_ref)
    fm_leaves = dict(jax.tree_util.tree_leaves_with_path(gp_fm))
    for path, leaf in ref_leaves:
        want = np.asarray(leaf)
        got = np.asarray(fm_leaves[path])
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(
            got, want, rtol=3e-2, atol=3e-2 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_sparse_fused_adam_on_hardware(tpu):
    """Merged densify+Adam kernel vs the two-pass path ON HARDWARE.

    Interpret mode cannot catch Mosaic layout miscompiles (the CIN
    sublane-reshape lesson), so the merged kernel's grad accumulation,
    in-place Adam tail, and SMEM psq accumulation must be checked on
    the real chip — ragged last tile and heavy duplicates included.
    """
    import jax
    import jax.numpy as jnp

    from deepfm_tpu.ops.pallas.adam_kernel import fused_table_adam
    from deepfm_tpu.ops.pallas.packed_grad_kernel import (
        densify_rows_grad_packed,
    )
    from deepfm_tpu.ops.pallas.sparse_adam_kernel import (
        sort_pairs,
        sorted_segment_sumsq,
        sparse_table_adam_packed,
    )

    rng = np.random.default_rng(0)
    d, pack = 17, 7
    phys = 10_240 + 128  # ragged vs TILE_PHYS=512
    V = phys * pack
    n = 65_536
    ids = rng.integers(0, V, n).astype(np.int32)
    ids[:500] = 0  # padding ids (zero cotangent in real training)
    ids[500:2000] = 777  # hot id: a 1500-deep duplicate run
    ct = (rng.normal(size=(n, d)) * 0.1).astype(np.float32)
    p = (rng.normal(size=(phys, 128)) * 0.05).astype(np.float32)
    mu = (rng.normal(size=(phys, 128)) * 0.01).astype(np.float32)
    nu = ((rng.normal(size=(phys, 128)) * 0.01) ** 2).astype(np.float32)
    lr, wd, clip = 1e-3, 2e-5, 1.0
    step = jnp.asarray(5, jnp.int32)

    g = densify_rows_grad_packed(jnp.asarray(ct), jnp.asarray(ids), V, pack)[
        :phys
    ]
    gn = jnp.sqrt(jnp.sum(jnp.square(g + wd * jnp.asarray(p))))
    p1, mu1, nu1 = fused_table_adam(
        jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), g,
        lr, wd, gn, clip, step,
    )

    sids, ctsT = sort_pairs(jnp.asarray(ids), jnp.asarray(ct))
    ssq = sorted_segment_sumsq(sids, ctsT)
    np.testing.assert_allclose(
        float(ssq), float(jnp.sum(jnp.square(g))), rtol=1e-5
    )
    p2, mu2, nu2, psq2 = sparse_table_adam_packed(
        jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), sids, ctsT,
        lr, wd, gn, clip, step, pack,
    )
    np.testing.assert_allclose(
        np.asarray(mu1), np.asarray(mu2), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(nu1), np.asarray(nu2), rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p2), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        float(psq2), float(jnp.sum(jnp.square(p1))), rtol=1e-5
    )


def test_trainer_gate_engages_fused_path_on_hardware(tpu, tmp_path):
    """REGRESSION (round 3): on the real TPU backend create_model used
    to inject the grad-kernel lookup, and the trainer's 'no custom
    lookup' gate silently kept training.fused_backward on the two-pass
    path — every CPU test passed (they force the env var), only
    hardware diverged. Assert the default config engages the fused
    sparse backward end to end through create_model + Trainer, and one
    real step runs."""
    import os

    import jax.numpy as jnp

    # cpu_conftest_helpers, NOT tests/conftest: the module name
    # "conftest" is already bound to tests_tpu's own conftest in
    # sys.modules, so `from conftest import ...` silently resolves
    # there (caught on hardware round 5)
    from cpu_conftest_helpers import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.trainer import Trainer

    assert os.environ.get("DEEPFM_TPU_FORCE_FUSED_ADAM") != "1", (
        "this test must exercise the REAL backend gate"
    )
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 64, seed=3)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "training": {"batch_size": 32, "num_epochs": 1,
                         "scheduler": "none"},
        }
    )
    model = create_model("deepfm", packed, cfg)
    assert model.lookup_fn is None
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    assert tr.sparse_fused, "fused sparse backward must engage on TPU"
    ids = jnp.asarray(arr.ids)[:32]
    dense = jnp.asarray(arr.dense)[:32]
    lab = jnp.asarray(arr.labels)[:32]
    w = jnp.ones((32,), jnp.float32)
    state, loss = tr._train_step(tr.state, ids, dense, lab, w)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize(
    "model_name", ["deepfm", "xdeepfm", "attention_deepfm"]
)
def test_engagement_labels_match_lowered_hlo(tpu, tmp_path, model_name):
    """Ground-truth check of the telemetry: every Mosaic-lowering label
    trainer_engagement reports must appear as a tpu_custom_call kernel
    in the LOWERED train step (training/telemetry.py). A silent gating
    regression (round-3 49ec8b3 class) now fails here instead of
    shipping as an unexplained slowdown."""
    import jax.numpy as jnp
    from cpu_conftest_helpers import make_synth_batch, make_synth_schema

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_features, pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.training.telemetry import (
        expected_mosaic_kernels,
        lowered_kernel_names,
        trainer_engagement,
    )
    from deepfm_tpu.training.trainer import Trainer

    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 64, seed=3)
    arr = pack_features(packed, feats, labels)
    cfg = config_from_dict(
        {
            "model_name": model_name,
            "output_dir": str(tmp_path),
            "dnn": {"hidden_units": [16, 8], "dropout": 0.0},
            "attention": {"attention_dim": 16, "num_heads": 2},
            "training": {"batch_size": 64, "num_epochs": 1,
                         "scheduler": "none"},
        }
    )
    model = create_model(model_name, packed, cfg)
    tr = Trainer(model, packed, cfg, arr, arr, arr)
    eng = trainer_engagement(tr)
    assert eng["backward"] == "sparse_fused"

    ids = jnp.asarray(arr.ids)
    dense = jnp.asarray(arr.dense)
    lab = jnp.asarray(arr.labels)
    w = jnp.ones((64,), jnp.float32)
    txt = tr._train_step.lower(tr.state, ids, dense, lab, w).as_text()
    found = lowered_kernel_names(txt)
    for alternatives in expected_mosaic_kernels(eng):
        assert any(
            any(name in f for f in found) for name in alternatives
        ), f"{alternatives} not in lowered kernels {sorted(found)}"


def test_stablehlo_export_runs_on_tpu(tpu, tmp_path):
    """The serving artifact lowers for and executes on the TPU backend,
    matching the in-process predict scores."""
    import jax
    import numpy as np

    from deepfm_tpu.config import config_from_dict
    from deepfm_tpu.data.packing import pack_schema
    from deepfm_tpu.models import create_model
    from deepfm_tpu.utils.export import (
        export_scoring,
        load_scoring,
        save_scoring,
        serving_config,
    )
    from cpu_conftest_helpers import make_synth_schema

    cfg = serving_config(
        config_from_dict(
            {
                "feature": {"fm_embed_dim": 8},
                "dnn": {"hidden_units": [16], "dropout": 0.0},
            }
        )
    )
    packed = pack_schema(make_synth_schema())
    model = create_model("deepfm", packed, cfg)
    ids0 = np.zeros((8, packed.num_slots), np.int32)
    dense0 = np.zeros((8, packed.num_dense), np.float32)
    variables = model.init(jax.random.PRNGKey(0), ids0, dense0, train=False)
    exported = export_scoring(
        model,
        variables["params"],
        variables.get("batch_stats", {}),
        packed.num_slots,
        packed.num_dense,
        platforms=("tpu",),
    )
    path = tmp_path / "m.stablehlo"
    save_scoring(path, exported)
    score = load_scoring(path)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 3, (16, packed.num_slots)).astype(np.int32)
    dense = rng.normal(size=(16, packed.num_dense)).astype(np.float32)
    got = score(ids, dense)
    vr = {"params": variables["params"]}
    if variables.get("batch_stats"):
        vr["batch_stats"] = variables["batch_stats"]
    want = np.asarray(
        model.apply(vr, ids, dense, method=model.predict)
    )[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-5)
