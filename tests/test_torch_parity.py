"""Numerical parity vs reference formulas executed in PyTorch.

The strongest oracle available without the real dataset: build the
reference's computational graph in torch (from its documented equations —
reference deepfm/models/layers/{fm,cin,attention,dnn}.py), load OUR
parameters into it, and require elementwise agreement. Catches silent
semantic drift (wrong einsum order, BN eps, softmax axis, init-shape
transposes) that shape tests can't.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deepfm_tpu.ops.attention import MultiHeadSelfAttention  # noqa: E402
from deepfm_tpu.ops.cin import CIN  # noqa: E402
from deepfm_tpu.ops.dnn import DNN  # noqa: E402
from deepfm_tpu.ops.fm import fm_interaction  # noqa: E402

B, F, D = 6, 5, 16


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_fm_parity():
    rng = np.random.default_rng(0)
    fe = rng.normal(size=(B, F, D)).astype(np.float32)
    ours = np.asarray(fm_interaction(jnp.asarray(fe)))
    tfe = t(fe)
    theirs = 0.5 * (
        (tfe.sum(1).pow(2) - tfe.pow(2).sum(1)).sum(1, keepdim=True)
    )
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4)


def test_cin_parity_with_conv1d():
    """Our (M, H*F) matmul == torch Conv1d(kernel_size=1) compression,
    including split-half routing across two layers."""
    rng = np.random.default_rng(1)
    layer_sizes = (8, 6)
    m = CIN(num_fields=F, embed_dim=D, layer_sizes=layer_sizes, split_half=True)
    fe = rng.normal(size=(B, F, D)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(fe))
    ours = np.asarray(m.apply(v, jnp.asarray(fe)))

    x0 = t(fe)
    hidden = x0
    outputs = []
    prev = F
    for i, ls in enumerate(layer_sizes):
        w = t(v["params"][f"conv_{i}_kernel"])  # (ls, prev*F)
        b = t(v["params"][f"conv_{i}_bias"])
        conv = torch.nn.Conv1d(prev * F, ls, kernel_size=1)
        with torch.no_grad():
            conv.weight.copy_(w[:, :, None])
            conv.bias.copy_(b)
        outer = torch.einsum("bhd,bfd->bhfd", hidden, x0).reshape(B, -1, D)
        comp = torch.relu(conv(outer))
        if i < len(layer_sizes) - 1:
            direct, hidden = comp.split([ls // 2, ls - ls // 2], dim=1)
            prev = ls - ls // 2
        else:
            direct = comp
        outputs.append(direct.sum(dim=2))
    theirs = torch.cat(outputs, dim=1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)


def test_attention_parity():
    rng = np.random.default_rng(2)
    m = MultiHeadSelfAttention(
        embed_dim=D, num_heads=2, attention_dim=16, num_layers=1,
        use_residual=True,
    )
    fe = rng.normal(size=(B, F, D)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(fe))
    ours = np.asarray(m.apply(v, jnp.asarray(fe)))

    p = v["params"]["block_0"]
    x = t(fe)

    def lin(wname, bname):
        w = t(p[wname])  # (in, out)
        b = t(p[bname])
        return lambda z: z @ w + b

    q = lin("wq", "bq")(x).view(B, F, 2, 8).transpose(1, 2)
    k = lin("wk", "bk")(x).view(B, F, 2, 8).transpose(1, 2)
    vv = lin("wv", "bv")(x).view(B, F, 2, 8).transpose(1, 2)
    scores = torch.matmul(q, k.transpose(-2, -1)) / np.sqrt(8)
    attn = torch.softmax(scores, dim=-1)
    out = torch.matmul(attn, vv).transpose(1, 2).reshape(B, F, 16)
    out = lin("wo", "bo")(out)
    ln = torch.nn.LayerNorm(D, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(t(p["ln_scale"]))
        ln.bias.copy_(t(p["ln_bias"]))
    theirs = ln(out + x).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)


def test_dnn_parity_with_batchnorm_train_mode():
    rng = np.random.default_rng(3)
    m = DNN(hidden_units=(12,), activation="relu", dropout=0.0,
            use_batch_norm=True)
    x = rng.normal(size=(B, 10)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours, _ = m.apply(
        v, jnp.asarray(x), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )

    lin = torch.nn.Linear(10, 12)
    bn = torch.nn.BatchNorm1d(12, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        lin.weight.copy_(t(v["params"]["dense_0"]["kernel"]).T)
        lin.bias.copy_(t(v["params"]["dense_0"]["bias"]))
        bn.weight.copy_(t(v["params"]["bn_0"]["scale"]))
        bn.bias.copy_(t(v["params"]["bn_0"]["bias"]))
    bn.train()
    theirs = torch.relu(bn(lin(t(x)))).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-4)


def test_dnn_gelu_exact_parity():
    rng = np.random.default_rng(4)
    m = DNN(hidden_units=(8,), activation="gelu", dropout=0.0,
            use_batch_norm=False)
    x = rng.normal(size=(B, 6)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(v, jnp.asarray(x)))
    lin = torch.nn.Linear(6, 8)
    with torch.no_grad():
        lin.weight.copy_(t(v["params"]["dense_0"]["kernel"]).T)
        lin.bias.copy_(t(v["params"]["dense_0"]["bias"]))
    theirs = torch.nn.functional.gelu(lin(t(x))).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
