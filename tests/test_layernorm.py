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


def test_head_layernorm_matches_per_head_spec():
    """head_layernorm (flat [.., H*dh], affine shared over heads) == LN
    over the last dim of the [.., H, dh] view, forward and grads."""
    from bindyouravatar_tpu.ops.layernorm import head_layernorm

    eps = 1e-6
    ks = jax.random.split(jax.random.key(11), 3)
    h, dh = 4, 64
    x = jax.random.normal(ks[0], (2, 23, h * dh), jnp.float32)
    scale = 1.0 + 0.2 * jax.random.normal(ks[1], (dh,))
    bias = 0.2 * jax.random.normal(ks[2], (dh,))

    def spec(x_, s_, b_):
        xr = x_.reshape(2, 23, h, dh)
        return _ln_ref(xr, s_, b_, eps).reshape(x_.shape)

    out = head_layernorm(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(spec(x, scale, bias)),
                               atol=1e-5)

    loss = lambda f: (lambda *a: jnp.sum(jnp.sin(f(*a))))
    g1 = jax.grad(loss(lambda x_, s_, b_: head_layernorm(x_, s_, b_, eps)),
                  argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss(spec), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_head_layernorm_pallas_kernels_interpret():
    """The TPU segment-stat kernels (fwd + bwd), run in interpret mode,
    match the spec — including a NON-dividing row grid (boundary masking
    of the ds/db row-sums)."""
    import functools as ft

    import jax.experimental.pallas as pl
    from bindyouravatar_tpu.ops.layernorm import (_hln_bwd_kernel,
                                                  _hln_fwd_kernel, _ln_ref)

    eps = 1e-6
    h, dh = 2, 64
    c = h * dh
    m = 20                       # rows=8 -> 3 blocks, last one partial
    ks = jax.random.split(jax.random.key(3), 4)
    x = jax.random.normal(ks[0], (m, c), jnp.float32)
    g = jax.random.normal(ks[1], (m, c), jnp.float32)
    scale = 1.0 + 0.2 * jax.random.normal(ks[2], (dh,))
    bias = 0.2 * jax.random.normal(ks[3], (dh,))
    sf = jnp.tile(scale, h).reshape(1, c)
    bf = jnp.tile(bias, h).reshape(1, c)

    rows = 8
    nb = -(-m // rows)
    spec = pl.BlockSpec((rows, c), lambda i: (i, 0))
    vspec = pl.BlockSpec((1, c), lambda i: (0, 0))
    pspec = pl.BlockSpec((8, c), lambda i: (0, 0))

    out = pl.pallas_call(
        ft.partial(_hln_fwd_kernel, eps=eps, dh=dh), grid=(nb,),
        in_specs=[spec, vspec, vspec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=True)(x, sf, bf)
    ref = _ln_ref(x.reshape(m, h, dh), scale, bias, eps).reshape(m, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    dx, dsp, dbp = pl.pallas_call(
        ft.partial(_hln_bwd_kernel, eps=eps, dh=dh, m=m, rows=rows),
        grid=(nb,), in_specs=[spec, vspec, spec],
        out_specs=[spec, pspec, pspec],
        out_shape=[jax.ShapeDtypeStruct((m, c), x.dtype),
                   jax.ShapeDtypeStruct((8, c), jnp.float32),
                   jax.ShapeDtypeStruct((8, c), jnp.float32)],
        interpret=True)(x, sf, g)
    ds = jnp.sum(dsp, 0).reshape(h, dh).sum(0)
    db = jnp.sum(dbp, 0).reshape(h, dh).sum(0)

    f = lambda x_, s_, b_: jnp.sum(
        _ln_ref(x_.reshape(m, h, dh), s_, b_, eps).reshape(m, c) * g)
    rdx, rds, rdb = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(rds), atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rdb), atol=1e-4)


def test_row_ln_bwd_kernel_interpret():
    """The full-width LN backward kernel (fused_layernorm's TPU vjp)
    matches autodiff of the spec, non-dividing grid included."""
    import functools as ft

    import jax.experimental.pallas as pl
    from bindyouravatar_tpu.ops.layernorm import _ln_bwd_kernel

    eps = 1e-5
    m, d = 19, 256
    ks = jax.random.split(jax.random.key(5), 4)
    x = jax.random.normal(ks[0], (m, d), jnp.float32)
    g = jax.random.normal(ks[1], (m, d), jnp.float32)
    scale = 1.0 + 0.2 * jax.random.normal(ks[2], (d,))
    bias = 0.2 * jax.random.normal(ks[3], (d,))

    rows = 8
    nb = -(-m // rows)
    spec = pl.BlockSpec((rows, d), lambda i: (i, 0))
    vspec = pl.BlockSpec((1, d), lambda i: (0, 0))
    pspec = pl.BlockSpec((8, d), lambda i: (0, 0))
    dx, dsp, dbp = pl.pallas_call(
        ft.partial(_ln_bwd_kernel, eps=eps, m=m, rows=rows),
        grid=(nb,), in_specs=[spec, vspec, spec],
        out_specs=[spec, pspec, pspec],
        out_shape=[jax.ShapeDtypeStruct((m, d), x.dtype),
                   jax.ShapeDtypeStruct((8, d), jnp.float32),
                   jax.ShapeDtypeStruct((8, d), jnp.float32)],
        interpret=True)(x, scale.reshape(1, d).astype(jnp.float32), g)

    f = lambda x_, s_, b_: jnp.sum(_ln_ref(x_, s_, b_, eps) * g)
    rdx, rds, rdb = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(dsp, 0)), np.asarray(rds),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.sum(dbp, 0)), np.asarray(rdb),
                               atol=1e-4)


def test_models_head_layernorm_module():
    """HeadLayerNorm module: same param tree as LayerNorm, per-head math."""
    from bindyouravatar_tpu.models.layers import HeadLayerNorm

    x, scale, bias = _mk((2, 13, 4), 64, jnp.bfloat16, seed=9)
    y = HeadLayerNorm(eps=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    ref = _ln_ref(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(y, jnp.float32),
                               np.asarray(ref, jnp.float32), atol=1e-2)
