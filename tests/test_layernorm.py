"""Fused single-pass LayerNorm kernel: Pallas (interpret) vs the XLA spec,
spec vs flax, and custom-VJP grads vs autodiff through the spec.

Reference contract: torch `nn.LayerNorm(dim, eps, elementwise_affine=True)`
as used at `/root/reference/models/audio_model.py:231` and
`/root/reference/models/router.py:205` — fp32 statistics over the last dim,
affine scale+bias, output in the input dtype.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from bindyouravatar_tpu.ops.layernorm import _ln_kernel, _ln_ref, fused_layernorm


def _mk(shape, d, dtype, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], shape + (d,), jnp.float32) * 2.3 + 0.7
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (d,), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[2], (d,), jnp.float32)
    return x.astype(dtype), scale, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rows,d", [(8, 128), (24, 256), (40, 384)])
def test_pallas_kernel_matches_spec(dtype, rows, d):
    x, scale, bias = _mk((rows,), d, dtype)
    eps = 1e-5
    spec = pl.BlockSpec((8, d), lambda i: (i, 0))
    vspec = pl.BlockSpec((1, d), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // 8,),
        in_specs=[spec, vspec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=True,
    )(x, scale.reshape(1, d), bias.reshape(1, d))
    ref = _ln_ref(x, scale, bias, eps)
    atol = 1e-6 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(np.asarray(out, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=atol)


def test_spec_matches_flax_layernorm():
    import flax.linen as nn

    x, scale, bias = _mk((3, 17), 256, jnp.float32, seed=1)
    eps = 1e-6
    mod = nn.LayerNorm(epsilon=eps)
    ref = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    out = _ln_ref(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_public_entry_and_grads():
    """fused_layernorm == spec on CPU, and its custom-VJP grads equal
    autodiff through the spec (the bwd routes through _ln_ref)."""
    x, scale, bias = _mk((5, 9), 384, jnp.float32, seed=2)
    eps = 1e-5
    out = fused_layernorm(x, scale, bias, eps)
    ref = _ln_ref(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def loss_f(fn):
        return lambda x_, s_, b_: jnp.sum(jnp.sin(fn(x_, s_, b_, eps)))

    g1 = jax.grad(loss_f(fused_layernorm), argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_f(_ln_ref), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_models_layernorm_uses_fused_path():
    """models.layers.LayerNorm output is unchanged by the fused-LN routing
    (CPU falls back to the identical spec)."""
    from bindyouravatar_tpu.models.layers import LayerNorm

    x, scale, bias = _mk((2, 13), 128, jnp.bfloat16, seed=3)
    y = LayerNorm(eps=1e-5).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    ref = _ln_ref(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(y, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=1e-2)


def test_lean_layernorm_matches_spec_and_grads():
    """lean_layernorm (memory-lean vjp: bf16 input + squeezed stats saved,
    closed-form backward) == the fp32 spec, forward and grads, at the
    per-head QK-norm geometry ([B, S, H, dh])."""
    from bindyouravatar_tpu.ops.layernorm import lean_layernorm

    eps = 1e-6
    ks = jax.random.split(jax.random.key(7), 3)
    x = jax.random.normal(ks[0], (2, 24, 4, 64), jnp.float32)
    scale = 1.0 + 0.2 * jax.random.normal(ks[1], (64,))
    bias = 0.2 * jax.random.normal(ks[2], (64,))

    out = lean_layernorm(x, scale, bias, eps)
    ref = _ln_ref(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def loss_f(fn):
        return lambda x_, s_, b_: jnp.sum(jnp.sin(fn(x_, s_, b_, eps)))

    g1 = jax.grad(loss_f(lean_layernorm), argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_f(_ln_ref), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    # bf16 activations: cotangent dtype follows the primal (bf16 dx), and
    # values match the fp32-spec grads to bf16 tolerance
    xb = x.astype(jnp.bfloat16)
    g3 = jax.grad(lambda x_: jnp.sum(
        lean_layernorm(x_, scale, bias, eps).astype(jnp.float32) ** 2))(xb)
    assert g3.dtype == jnp.bfloat16
    g4 = jax.grad(lambda x_: jnp.sum(
        _ln_ref(x_, scale, bias, eps).astype(jnp.float32) ** 2))(xb)
    np.testing.assert_allclose(np.asarray(g3, jnp.float32),
                               np.asarray(g4, jnp.float32),
                               atol=5e-2, rtol=5e-2)


def test_models_layernorm_lean_flag():
    """models.layers.LayerNorm(lean=True) routes through lean_layernorm
    with the same param tree and output."""
    from bindyouravatar_tpu.models.layers import LayerNorm

    x, scale, bias = _mk((2, 13), 128, jnp.bfloat16, seed=5)
    y = LayerNorm(eps=1e-5, lean=True).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    ref = _ln_ref(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(y, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=1e-2)
