"""Pallas TPU kernel: the ENTIRE CIN stack fused in VMEM.

Goes beyond the single-layer fusion in cin_kernel.py: per batch tile it
keeps x0 resident in VMEM, runs every CIN layer (outer product -> MXU
compression -> bias -> ReLU -> split-half routing) without ever writing an
intermediate feature map to HBM, and emits only the final sum-pooled
concatenation (B, sum(direct_sizes)). HBM traffic becomes just
x0 in + weights in + pooled out — the (B, M, D) per-layer activations the
jnp/XLA path (and the reference's Conv1d pipeline, reference
deepfm/models/layers/cin.py:66-105) materializes simply do not exist.

Backward uses jax.vjp over the mathematically-identical jnp oracle
(recompute-in-backward a la remat): CIN activations are cheap to recompute
relative to their HBM round-trip cost.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfm_tpu.ops.cin import cin_layer_sizes


def _stack_kernel(x0_ref, *refs, layer_sizes, split_half, direct_sizes,
                  next_sizes):
    n_layers = len(layer_sizes)
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]

    f, d, tb = x0_ref.shape
    x0 = x0_ref[:].reshape(1, f, d * tb)
    hidden = x0_ref[:]  # (H_k, D, TB), starts at H_0 = F

    col = 0
    for i in range(n_layers):
        h = hidden.shape[0]
        outer = (hidden.reshape(h, 1, d * tb) * x0).reshape(h * f, d * tb)
        comp = jax.lax.dot_general(
            w_refs[i][:],
            outer,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        comp = jnp.maximum(comp + b_refs[i][:], 0.0)  # (M_i, D*TB)
        if split_half and i < n_layers - 1:
            direct = comp[: direct_sizes[i]]
            hidden = comp[direct_sizes[i] :].reshape(next_sizes[i], d, tb)
        else:
            direct = comp
            hidden = comp.reshape(layer_sizes[i], d, tb)
        # sum-pool over D: (M_dir, D, TB) -> (M_dir, TB)
        pooled = jnp.sum(direct.reshape(-1, d, tb), axis=1)
        out_ref[col : col + pooled.shape[0], :] = pooled
        col += pooled.shape[0]


def _pick_tile(b: int, f: int, d: int, layer_sizes, split_half) -> int | None:
    """Batch tile: the TPU lane dimension, so it must be a multiple of 128
    (Mosaic block constraint); None -> caller falls back to the jnp path.

    Accounting: x0 in-block and pooled out-block are double-buffered; the
    per-layer outer product + compressed maps are live scratch; weights are
    resident.
    """
    direct_sizes, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    output_dim = sum(direct_sizes)
    budget = 14 * 1024 * 1024
    w_elems = 0
    prev = f
    for i, ls in enumerate(layer_sizes):
        w_elems += ls * (prev * f + 1)
        prev = next_sizes[i] if (split_half and i < len(layer_sizes) - 1) else ls
    per_layer = []
    prev = f
    for i, ls in enumerate(layer_sizes):
        per_layer.append(prev * f * d + ls * d)
        prev = next_sizes[i] if (split_half and i < len(layer_sizes) - 1) else ls
    for tb in (512, 384, 256, 128):
        if b % tb != 0:
            continue
        elems = (
            2 * f * d * tb + 2 * output_dim * tb + max(per_layer) * tb
            + 2 * w_elems
        )
        if 4 * elems <= budget:
            return tb
    return None


def make_cin_stack_pallas(layer_sizes, split_half):
    """Returns fn(x0 (B,F,D), weights, biases) -> (B, output_dim)."""
    layer_sizes = tuple(layer_sizes)
    direct_sizes, next_sizes = cin_layer_sizes(layer_sizes, split_half)
    output_dim = sum(direct_sizes)

    def oracle(x0, weights, biases):
        from deepfm_tpu.ops.cin import cin_compress

        hidden = x0
        outs = []
        for i, ls in enumerate(layer_sizes):
            comp = jax.nn.relu(cin_compress(hidden, x0, weights[i], biases[i]))
            if split_half and i < len(layer_sizes) - 1:
                direct = comp[:, : direct_sizes[i], :]
                hidden = comp[:, direct_sizes[i] :, :]
            else:
                direct = comp
                hidden = comp
            outs.append(jnp.sum(direct, axis=2))
        return jnp.concatenate(outs, axis=1)

    def forward(x0, weights, biases):
        bsz, f, d = x0.shape
        if jax.default_backend() == "cpu":
            tb = bsz  # interpreter mode: no tiling constraints
        else:
            tb = _pick_tile(bsz, f, d, layer_sizes, split_half)
        if tb is None:
            return oracle(x0, weights, biases)
        x0_t = jnp.transpose(x0, (1, 2, 0)).astype(jnp.float32)  # (F, D, B)

        kernel = partial(
            _stack_kernel,
            layer_sizes=layer_sizes,
            split_half=split_half,
            direct_sizes=direct_sizes,
            next_sizes=next_sizes,
        )
        in_specs = [
            pl.BlockSpec((f, d, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ]
        prev = f
        args = [x0_t]
        for i, ls in enumerate(layer_sizes):
            in_ch = prev * f
            in_specs.append(
                pl.BlockSpec((ls, in_ch), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(weights[i].astype(jnp.float32))
            prev = next_sizes[i] if (split_half and i < len(layer_sizes) - 1) else ls
        for i, ls in enumerate(layer_sizes):
            in_specs.append(
                pl.BlockSpec((ls, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(biases[i].astype(jnp.float32).reshape(-1, 1))

        flops = 0
        prev = f
        for i, ls in enumerate(layer_sizes):
            flops += 2 * bsz * ls * prev * f * d + bsz * prev * f * d
            prev = next_sizes[i] if (split_half and i < len(layer_sizes) - 1) else ls

        out_t = pl.pallas_call(
            kernel,
            grid=(bsz // tb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (output_dim, tb), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((output_dim, bsz), jnp.float32),
            interpret=jax.default_backend() == "cpu",
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * bsz * (f * d + output_dim),
                transcendentals=0,
            ),
        )(*args)
        return jnp.transpose(out_t, (1, 0)).astype(x0.dtype)

    @jax.custom_vjp
    def cin_stack(x0, weights, biases):
        return forward(x0, weights, biases)

    def fwd(x0, weights, biases):
        return forward(x0, weights, biases), (x0, weights, biases)

    def bwd(res, g):
        """Hand-written reverse pass (remat): recompute per-layer activations
        with the fast fused layer kernel, then run the per-layer adjoint
        einsums in reverse. Cheaper than jax.vjp(oracle) because the
        recompute rides the Pallas forward, not the materializing jnp path.
        """
        from deepfm_tpu.ops.pallas.cin_kernel import cin_compress_pallas

        x0, weights, biases = res
        x32 = x0.astype(jnp.float32)
        n = len(layer_sizes)

        # recompute activations (pallas fwd per layer)
        comps = []
        hidden = x32
        for i in range(n):
            comp = jax.nn.relu(
                cin_compress_pallas(hidden, x32, weights[i].astype(jnp.float32),
                                    biases[i].astype(jnp.float32))
            )
            comps.append(comp)
            if split_half and i < n - 1:
                hidden = comp[:, direct_sizes[i] :, :]
            else:
                hidden = comp

        g = g.astype(jnp.float32)
        g_cols = []
        col = 0
        for ds in direct_sizes:
            g_cols.append(g[:, col : col + ds])
            col += ds

        dx0 = jnp.zeros_like(x32)
        dws = [None] * n
        dbs = [None] * n
        dhid_next = None
        for i in reversed(range(n)):
            comp = comps[i]
            # adjoint of sum-pool over D on the direct maps
            ddirect = jnp.broadcast_to(
                g_cols[i][:, :, None],
                (comp.shape[0], direct_sizes[i], comp.shape[2]),
            )
            if split_half and i < n - 1:
                dcomp = jnp.concatenate([ddirect, dhid_next], axis=1)
            elif dhid_next is not None:
                dcomp = ddirect + dhid_next
            else:
                dcomp = ddirect
            dcomp = dcomp * (comp > 0)

            hid_in = x32 if i == 0 else (
                comps[i - 1][:, direct_sizes[i - 1] :, :]
                if (split_half and i - 1 < n - 1)
                else comps[i - 1]
            )
            w3 = weights[i].astype(jnp.float32).reshape(
                layer_sizes[i], hid_in.shape[1], x0.shape[1]
            )
            dhid = jnp.einsum("bmd,mhf,bfd->bhd", dcomp, w3, x32)
            dx0 = dx0 + jnp.einsum("bmd,mhf,bhd->bfd", dcomp, w3, hid_in)
            dws[i] = (
                jnp.einsum("bmd,bhd,bfd->mhf", dcomp, hid_in, x32)
                .reshape(layer_sizes[i], -1)
                .astype(weights[i].dtype)
            )
            dbs[i] = jnp.sum(dcomp, axis=(0, 2)).astype(biases[i].dtype)
            dhid_next = dhid
        dx0 = dx0 + dhid_next  # hid_0 = x0
        return dx0.astype(x0.dtype), dws, dbs

    cin_stack.defvjp(fwd, bwd)
    cin_stack.output_dim = output_dim
    return cin_stack
