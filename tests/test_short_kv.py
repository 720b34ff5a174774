"""Short-KV cross-attention kernels (interpret mode) vs their einsum specs.

Covers both IO layouts: head-major q [G,H,Sq,D] and q-major [G,Sq,H,D]
(the natural projection layout, head swap done in-kernel)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from bindyouravatar_tpu.ops.short_kv_attention import (
    _kernel, _kernel_qmajor, _spec_attend, _spec_attend_qmajor,
    _spec_combined, _spec_combined_qmajor)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.fixture(scope="module")
def qkvw():
    g, h, sq, d, n_id, kk = 3, 4, 40, 32, 2, 8
    ks = jax.random.split(jax.random.key(0), 4)
    q = _rand(ks[0], (g, h, sq, d))
    k = _rand(ks[1], (g, n_id, h, kk, d))
    v = _rand(ks[2], (g, n_id, h, kk, d))
    w = jax.nn.sigmoid(_rand(ks[3], (g, sq, n_id)))
    return q, k, v, w


def test_specs_agree_across_layouts(qkvw):
    """q-major spec == head-major spec on transposed inputs."""
    q, k, v, w = qkvw
    sm = 0.17
    qm = jnp.swapaxes(q, 1, 2)                       # [G,Sq,H,D]
    a = _spec_attend(q, k, v, sm)                    # [G,I,H,Sq,D]
    b = _spec_attend_qmajor(qm, k, v, sm)            # [G,I,Sq,H,D]
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(a, 2, 3)),
                               np.asarray(b), atol=1e-5, rtol=1e-5)
    c = _spec_combined(q, k, v, w, sm)               # [G,H,Sq,D]
    dcomb = _spec_combined_qmajor(qm, k, v, w, sm)   # [G,Sq,H,D]
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(c, 1, 2)),
                               np.asarray(dcomb), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("combine", [False, True])
def test_kernel_interpret_matches_spec(qkvw, combine):
    q, k, v, w = qkvw
    g, h, sq, d = q.shape
    n_id, kk = k.shape[1], k.shape[3]
    sm = 0.21
    rows = 8
    in_specs = [
        pl.BlockSpec((1, h, rows, d), lambda gi, qi: (gi, 0, qi, 0)),
        pl.BlockSpec((1, n_id, h, kk, d), lambda gi, qi: (gi, 0, 0, 0, 0)),
        pl.BlockSpec((1, n_id, h, kk, d), lambda gi, qi: (gi, 0, 0, 0, 0)),
    ]
    inputs = [q, k, v]
    if combine:
        in_specs.append(pl.BlockSpec((1, rows, n_id),
                                     lambda gi, qi: (gi, qi, 0)))
        inputs.append(w)
        out_spec = pl.BlockSpec((1, h, rows, d), lambda gi, qi: (gi, 0, qi, 0))
        out_shape = jax.ShapeDtypeStruct((g, h, sq, d), q.dtype)
        want = _spec_combined(q, k, v, w, sm)
    else:
        out_spec = pl.BlockSpec((1, n_id, h, rows, d),
                                lambda gi, qi: (gi, 0, 0, qi, 0))
        out_shape = jax.ShapeDtypeStruct((g, n_id, h, sq, d), q.dtype)
        want = _spec_attend(q, k, v, sm)
    got = pl.pallas_call(
        functools.partial(_kernel, n_id=n_id, sm_scale=sm, combine=combine),
        grid=(g, sq // rows),
        in_specs=in_specs, out_specs=out_spec, out_shape=out_shape,
        interpret=True)(*inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("combine", [False, True])
def test_qmajor_kernel_interpret_matches_spec(qkvw, combine):
    q, k, v, w = qkvw
    qm = jnp.swapaxes(q, 1, 2)                       # [G,Sq,H,D]
    g, sq, h, d = qm.shape
    n_id, kk = k.shape[1], k.shape[3]
    sm = 0.21
    rows = 8
    in_specs = [
        pl.BlockSpec((1, rows, h, d), lambda gi, qi: (gi, qi, 0, 0)),
        pl.BlockSpec((1, n_id, h, kk, d), lambda gi, qi: (gi, 0, 0, 0, 0)),
        pl.BlockSpec((1, n_id, h, kk, d), lambda gi, qi: (gi, 0, 0, 0, 0)),
    ]
    inputs = [qm, k, v]
    if combine:
        in_specs.append(pl.BlockSpec((1, rows, n_id),
                                     lambda gi, qi: (gi, qi, 0)))
        inputs.append(w)
        out_spec = pl.BlockSpec((1, rows, h, d), lambda gi, qi: (gi, qi, 0, 0))
        out_shape = jax.ShapeDtypeStruct((g, sq, h, d), qm.dtype)
        want = _spec_combined_qmajor(qm, k, v, w, sm)
    else:
        out_spec = pl.BlockSpec((1, n_id, rows, h, d),
                                lambda gi, qi: (gi, 0, qi, 0, 0))
        out_shape = jax.ShapeDtypeStruct((g, n_id, sq, h, d), qm.dtype)
        want = _spec_attend_qmajor(qm, k, v, sm)
    got = pl.pallas_call(
        functools.partial(_kernel_qmajor, n_id=n_id, sm_scale=sm,
                          combine=combine),
        grid=(g, sq // rows),
        in_specs=in_specs, out_specs=out_spec, out_shape=out_shape,
        interpret=True)(*inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_qmajor_grads_match_spec(qkvw):
    q, k, v, w = qkvw
    from bindyouravatar_tpu.ops.short_kv_attention import (
        short_kv_attention_combined_qmajor)
    qm = jnp.swapaxes(q, 1, 2)
    sm = 0.3
    f1 = lambda *a: short_kv_attention_combined_qmajor(*a, sm).sum()
    f2 = lambda *a: _spec_combined_qmajor(*a, sm).sum()
    g1 = jax.grad(f1, argnums=(0, 1, 2, 3))(qm, k, v, w)
    g2 = jax.grad(f2, argnums=(0, 1, 2, 3))(qm, k, v, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_flat_kernel_interpret_matches_spec(qkvw):
    """Head-pair-grid flat-q kernel vs spec (interpret mode)."""
    q, k, v, w = qkvw
    g, h, sq, d = q.shape          # d=32 -> hpb=4, h=4 -> one pair block
    qf = jnp.swapaxes(q, 1, 2).reshape(g, sq, h * d)
    sm = 0.19
    from bindyouravatar_tpu.ops.short_kv_attention import (
        _kernel_flat, _spec_combined_flat)
    n_id, kk = k.shape[1], k.shape[3]
    hpb = max(1, 128 // d)
    rows = 8
    got = pl.pallas_call(
        functools.partial(_kernel_flat, n_id=n_id, hpb=hpb, dh=d,
                          sm_scale=sm),
        grid=(g, h // hpb, sq // rows),
        in_specs=[
            pl.BlockSpec((1, rows, hpb * d), lambda gi, hp, qi: (gi, qi, hp)),
            pl.BlockSpec((1, n_id, hpb, kk, d),
                         lambda gi, hp, qi: (gi, 0, hp, 0, 0)),
            pl.BlockSpec((1, n_id, hpb, kk, d),
                         lambda gi, hp, qi: (gi, 0, hp, 0, 0)),
            pl.BlockSpec((1, rows, n_id), lambda gi, hp, qi: (gi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, hpb * d),
                               lambda gi, hp, qi: (gi, qi, hp)),
        out_shape=jax.ShapeDtypeStruct((g, sq, h * d), qf.dtype),
        interpret=True)(qf, k, v, w)
    want = _spec_combined_flat(qf, k, v, w, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flat_combined_grads_match_spec(qkvw):
    q, k, v, w = qkvw
    g, h, sq, d = q.shape
    qf = jnp.swapaxes(q, 1, 2).reshape(g, sq, h * d)
    from bindyouravatar_tpu.ops.short_kv_attention import (
        _spec_combined_flat, short_kv_attention_combined_flat)
    sm = 0.3
    g1 = jax.grad(lambda *a: short_kv_attention_combined_flat(*a, sm).sum(),
                  argnums=(0, 1, 2, 3))(qf, k, v, w)
    g2 = jax.grad(lambda *a: _spec_combined_flat(*a, sm).sum(),
                  argnums=(0, 1, 2, 3))(qf, k, v, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
