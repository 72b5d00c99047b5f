"""Fused Pallas Adam for embedding tables.

XLA's Adam fusion on a (phys, 128) table streams ~6.9GB/step at bench
scale (reads grad + param + mu + nu + re-reads for the update chain).
This kernel performs the whole update — weight decay, clip scaling,
moment updates, bias correction, parameter step — in ONE pass over
tile-pipelined blocks with the param/mu/nu buffers aliased in place:
4 reads + 3 writes of table-sized data, nothing else.

Semantics are exactly optax.chain(add_decayed_weights(wd),
clip_by_global_norm(clip), adam(lr)) restricted to one tensor, with the
GLOBAL norm supplied by the caller (it spans every parameter, so it
cannot be computed per-tensor). The kernel replicates optax's literal
f32 operation sequence — clip's divide-then-multiply, update_moment
ordering, bias-correction divisions — because Adam's normalization
amplifies last-ulp differences into +/-lr-scale trajectory divergence
within two steps. Two-step trainer parity vs the optax chain measures
0 to 4e-9.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 2048


def _adam_kernel(
    sc_ref,  # SMEM (8,) f32: [lr, wd, gnorm, clip, bc1, bc2, eps, noclip]
    p_ref, mu_ref, nu_ref, g_ref,  # (TILE_R, C) VMEM blocks
    po_ref, muo_ref, nuo_ref,  # aliased outputs
    *,
    b1: float,
    b2: float,
):
    lr = sc_ref[0]
    wd = sc_ref[1]
    gnorm = sc_ref[2]
    clip = sc_ref[3]
    bc1 = sc_ref[4]
    bc2 = sc_ref[5]
    eps = sc_ref[6]
    noclip = sc_ref[7]

    p = p_ref[:]
    # same op ORDER as optax (decay -> clip's divide-then-multiply ->
    # update_moment -> bias_correction divisions): Adam's normalization
    # amplifies last-ulp differences into +/-lr-scale trajectory
    # divergence, so matching the literal f32 operation sequence matters
    # for step-parity. Moments may be STORED bf16 (training.moments_dtype)
    # — math is always f32; only the mu/nu writeback quantizes.
    g = g_ref[:] + wd * p
    g = jnp.where(noclip > 0.0, g, g / gnorm * clip)
    mu = (1.0 - b1) * g + b1 * mu_ref[:].astype(jnp.float32)
    nu = (1.0 - b2) * (g * g) + b2 * nu_ref[:].astype(jnp.float32)
    mu_hat = mu / bc1
    nu_hat = nu / bc2
    po_ref[:] = p - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps))
    muo_ref[:] = mu.astype(muo_ref.dtype)
    nuo_ref[:] = nu.astype(nuo_ref.dtype)


@partial(jax.jit, static_argnums=(9, 10, 11))
def fused_table_adam(
    param: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    grad: jax.Array,
    lr: jax.Array,
    weight_decay: jax.Array,
    global_norm: jax.Array,
    clip_norm: jax.Array,
    step: jax.Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One in-place-ish Adam step over a 2-D table. Returns (p', mu', nu').

    ``step`` is the number of completed steps (bias correction uses
    step + 1, matching optax's count-after-increment). ``global_norm``
    is the norm of the full decayed gradient tree; clipping replicates
    optax's ``where(norm < clip, g, g / norm * clip)`` exactly
    (clip_norm <= 0 disables).
    """
    r, c = param.shape
    t = step.astype(jnp.float32) + 1.0
    gnorm = jnp.asarray(global_norm, jnp.float32)
    clipv = jnp.asarray(clip_norm, jnp.float32)
    noclip = jnp.where((clipv <= 0.0) | (gnorm < clipv), 1.0, 0.0)
    scalars = jnp.stack(
        [
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(weight_decay, jnp.float32),
            jnp.maximum(gnorm, 1e-30),
            clipv,
            1.0 - jnp.power(b1, t),
            1.0 - jnp.power(b2, t),
            jnp.asarray(eps, jnp.float32),
            noclip,
        ]
    )
    tile = min(TILE_R, r)
    grid = pl.cdiv(r, tile)
    spec = pl.BlockSpec((tile, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_adam_kernel, b1=b1, b2=b2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, c), jnp.float32),
            jax.ShapeDtypeStruct((r, c), mu.dtype),
            jax.ShapeDtypeStruct((r, c), nu.dtype),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=12 * r * c,
            bytes_accessed=(3 * 4 + 2 * 2 * mu.dtype.itemsize) * r * c,
            transcendentals=r * c,
        ),
    )(scalars, param, mu, nu, grad)
    return out[0], out[1], out[2]
