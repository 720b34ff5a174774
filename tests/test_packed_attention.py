"""Packed-head tiny-sequence attention kernel vs its einsum spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.ops.packed_attention import (
    _einsum_attention, _kernel, packed_head_attention)


def _per_head_reference(q, k, v, heads, scale):
    """Plain per-head attention (the semantics the packed mask must equal)."""
    m, sh, d = q.shape
    s = sh // heads
    qs = q.reshape(m, s, heads, d)
    ks = k.reshape(m, s, heads, d)
    vs = v.reshape(m, s, heads, d)
    sc = jnp.einsum("mahd,mbhd->mhab", qs, ks,
                    preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("mhab,mbhd->mahd", p.astype(vs.dtype), vs)
    return o.reshape(m, sh, d)


@pytest.mark.parametrize("s,heads", [(13, 8), (2, 8), (5, 4)])
def test_packed_mask_equals_per_head(s, heads):
    d = 64
    m = 24
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (m, s * heads, d), jnp.float32)
               for kk in ks)
    want = _per_head_reference(q, k, v, heads, d ** -0.5)
    got = _einsum_attention(q, k, v, heads, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_kernel_interpret_matches_spec():
    """The Pallas kernel body (interpret mode) vs the einsum spec."""
    import functools

    from jax.experimental import pallas as pl

    m, s, heads, d = 16, 13, 8, 64
    sh = s * heads
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (m, sh, d), jnp.float32) for kk in ks)
    spec = pl.BlockSpec((8, sh, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, sm_scale=d ** -0.5),
        grid=(m // 8,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, sh, d), q.dtype),
        interpret=True,
    )(q, k, v)
    want = _einsum_attention(q, k, v, heads, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_packed_attention_grads():
    """custom_vjp backward equals autodiff through the einsum spec."""
    m, s, heads, d = 8, 5, 4, 16
    sh = s * heads
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (m, sh, d), jnp.float32) for kk in ks)

    f_kernel = lambda q, k, v: packed_head_attention(q, k, v, heads,
                                                     d ** -0.5).sum()
    f_spec = lambda q, k, v: _einsum_attention(q, k, v, heads,
                                               d ** -0.5).sum()
    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_spec, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_tiny_seq_channel_spec_equals_packed():
    """Channel-packed spec == per-head attention on channel slices."""
    from bindyouravatar_tpu.ops.packed_attention import (_spec_channel,
                                                         tiny_seq_attention)

    m, s, heads, dh = 12, 13, 8, 16
    c = heads * dh
    ks = jax.random.split(jax.random.key(3), 3)
    q, k, v = (jax.random.normal(kk, (m, s, c), jnp.float32) for kk in ks)
    got = tiny_seq_attention(q, k, v, heads, dh ** -0.5)   # spec on CPU
    # reference: independent per-head attention over channel slices
    want = np.zeros((m, s, c), np.float32)
    qn, kn, vn = (np.asarray(x) for x in (q, k, v))
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        sc = np.einsum("mad,mbd->mab", qn[..., sl], kn[..., sl]) * dh ** -0.5
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want[..., sl] = np.einsum("mab,mbd->mad", p, vn[..., sl])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_slice_kernel_interpret_matches_spec():
    import functools

    from jax.experimental import pallas as pl

    from bindyouravatar_tpu.ops.packed_attention import (_slice_kernel,
                                                         _spec_channel)

    m, s, heads, dh = 16, 13, 4, 32
    c = heads * dh
    ks = jax.random.split(jax.random.key(4), 3)
    q, k, v = (jax.random.normal(kk, (m, s, c), jnp.float32) for kk in ks)
    spec = pl.BlockSpec((8, s, c), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_slice_kernel, heads=heads, sm_scale=dh ** -0.5),
        grid=(m // 8,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, s, c), q.dtype),
        interpret=True,
    )(q, k, v)
    want = _spec_channel(q, k, v, heads, dh ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_tiny_seq_attention_grads():
    from bindyouravatar_tpu.ops.packed_attention import (_spec_channel,
                                                         tiny_seq_attention)

    m, s, heads, dh = 6, 5, 4, 8
    c = heads * dh
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (jax.random.normal(kk, (m, s, c), jnp.float32) for kk in ks)
    g1 = jax.grad(lambda q, k, v: tiny_seq_attention(
        q, k, v, heads, dh ** -0.5).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: _spec_channel(
        q, k, v, heads, dh ** -0.5).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_slice_bwd_kernel_interpret_matches_spec():
    """Pallas backward of the lane-sliced tiny-seq attention (interpret
    mode) vs the einsum-spec VJP — incl. a non-dividing row grid."""
    from bindyouravatar_tpu.ops.packed_attention import (_spec_channel,
                                                         _tiny_bwd_pallas)

    m, s, heads, dh = 132, 13, 4, 32      # 132 % 128 != 0: boundary block
    c = heads * dh
    ks = jax.random.split(jax.random.key(6), 4)
    q, k, v, g = (jax.random.normal(kk, (m, s, c), jnp.float32) for kk in ks)
    got = _tiny_bwd_pallas(q, k, v, g, heads, dh ** -0.5, interpret=True)
    _, vjp = jax.vjp(
        lambda q, k, v: _spec_channel(q, k, v, heads, dh ** -0.5), q, k, v)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pair_kernel_interpret_matches_spec():
    """Pair-axis Pallas kernel (interpret) vs the einsum spec, and the spec
    vs the channel-packed spec on the equivalent transposed layout."""
    import functools

    from jax.experimental import pallas as pl

    from bindyouravatar_tpu.ops.packed_attention import (_pair_kernel,
                                                         _pair_spec,
                                                         _spec_channel)

    b, m, heads, dh = 2, 24, 4, 32
    c = heads * dh
    ks = jax.random.split(jax.random.key(6), 3)
    q, k, v = (jax.random.normal(kk, (b, 2, m, c), jnp.float32) for kk in ks)
    spec = pl.BlockSpec((1, 2, 8, c), lambda b_, i: (b_, 0, i, 0))
    out = pl.pallas_call(
        functools.partial(_pair_kernel, heads=heads, sm_scale=dh ** -0.5),
        grid=(b, m // 8),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, 2, m, c), q.dtype),
        interpret=True,
    )(q, k, v)
    want = _pair_spec(q, k, v, heads, dh ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # cross-check the spec against the channel-packed spec on [M, S, C]
    tr = lambda x: x.transpose(0, 2, 1, 3).reshape(b * m, 2, c)
    want2 = _spec_channel(tr(q), tr(k), tr(v), heads, dh ** -0.5)
    got2 = tr(want)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=1e-5, rtol=1e-5)


def test_pair_axis_attention_grads():
    from bindyouravatar_tpu.ops.packed_attention import (_pair_spec,
                                                         pair_axis_attention)

    b, m, heads, dh = 1, 6, 4, 8
    c = heads * dh
    ks = jax.random.split(jax.random.key(7), 3)
    q, k, v = (jax.random.normal(kk, (b, 2, m, c), jnp.float32) for kk in ks)
    g1 = jax.grad(lambda q, k, v: pair_axis_attention(
        q, k, v, heads, dh ** -0.5).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: _pair_spec(
        q, k, v, heads, dh ** -0.5).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-5)


def test_pair_spec2_matches_spec_fwd_and_grads():
    """The flat closed-form 2-way softmax (_pair_spec2, the memory-lean
    backward) == the einsum spec, forward and grads."""
    from bindyouravatar_tpu.ops.packed_attention import (_pair_spec,
                                                         _pair_spec2)

    heads, dh, m = 4, 32, 13
    c = heads * dh
    ks = jax.random.split(jax.random.key(21), 3)
    q = jax.random.normal(ks[0], (2, 2, m, c))
    k = jax.random.normal(ks[1], (2, 2, m, c))
    v = jax.random.normal(ks[2], (2, 2, m, c))
    sm = dh ** -0.5

    o1 = _pair_spec2(q, k, v, heads, sm)
    o2 = _pair_spec(q, k, v, heads, sm)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-5)

    loss = lambda f: (lambda *a: jnp.sum(jnp.sin(f(*a, heads, sm))))
    g1 = jax.grad(loss(_pair_spec2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(_pair_spec), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
