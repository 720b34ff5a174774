"""Sequence-chunked feed-forward with a recompute backward.

Single-chip training depth is HBM-bound (VERDICT r4 #5): at 17,776
tokens the block backward holds BOTH FF intermediates —
net_0's output and net_2's input, bf16 [S, 4*dim] = 416 MB each at
flagship geometry (reference FF: diffusers FeedForward as used by
/root/reference/models/transformer.py:143-262) — live at once.

`ff_chunked` computes the same gelu-approximate MLP over S-chunks with a
custom VJP that recomputes the chunk's intermediates in the backward, so
the live set is [S/chunks, 4*dim] instead of [S, 4*dim].  Cost: one extra
net_0+gelu pass per backward (the net_2 matmul in the recompute is not
needed).  Numerics match flax's Dense(dtype=bf16, param_dtype=fp32)
convention: params cast to the activation dtype before the dot, fp32
param grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ff_core(xc, w0, b0, w2, b2):
    """One chunk forward in the activation dtype (flax Dense semantics)."""
    h = xc @ w0 + b0
    a = jax.nn.gelu(h, approximate=True)
    return a @ w2 + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ff_chunked(x, w0, b0, w2, b2, chunks: int):
    """gelu-approximate MLP y = gelu(x@w0+b0)@w2+b2 over S-chunks.

    x: [B, S, D] (any float dtype); w0 [D, Dh], b0 [Dh], w2 [Dh, D],
    b2 [D] in param dtype (cast to x.dtype inside, like flax Dense).
    `chunks` must be static; S is padded up to a chunk multiple.
    """
    return _ff_fwd(x, w0, b0, w2, b2, chunks)[0]


def _pad_chunks(x, chunks):
    b, s, d = x.shape
    sc = -(-s // chunks) * chunks
    if sc != s:
        x = jnp.pad(x, [(0, 0), (0, sc - s), (0, 0)])
    return x, s, sc


def _ff_fwd(x, w0, b0, w2, b2, chunks):
    dt = x.dtype
    w0c, b0c, w2c, b2c = (p.astype(dt) for p in (w0, b0, w2, b2))
    xp, s, sc = _pad_chunks(x, chunks)
    b = xp.shape[0]
    xcs = xp.reshape(b, chunks, sc // chunks, x.shape[-1])

    def one(_, xc):
        return None, _ff_core(xc, w0c, b0c, w2c, b2c)

    _, ycs = jax.lax.scan(one, None, jnp.swapaxes(xcs, 0, 1))
    y = jnp.swapaxes(ycs, 0, 1).reshape(b, sc, -1)[:, :s]
    return y, (x, w0, b0, w2, b2)


def _ff_bwd(chunks, res, dy):
    x, w0, b0, w2, b2 = res
    dt = x.dtype
    w0c, b0c, w2c, _ = (p.astype(dt) for p in (w0, b0, w2, b2))
    xp, s, sc = _pad_chunks(x, chunks)
    dyp, _, _ = _pad_chunks(dy.astype(dt), chunks)
    b = xp.shape[0]
    din, dh_ = x.shape[-1], w0.shape[-1]
    xcs = jnp.swapaxes(xp.reshape(b, chunks, sc // chunks, din), 0, 1)
    dycs = jnp.swapaxes(dyp.reshape(b, chunks, sc // chunks, -1), 0, 1)

    def one(carry, xs):
        dw0, db0, dw2, db2 = carry
        xc, dyc = xs
        # recompute the chunk's intermediates (the whole point: the full
        # [S, 4*dim] h/a tensors never exist in the backward)
        h = xc @ w0c + b0c
        a = jax.nn.gelu(h, approximate=True)
        da = dyc @ w2c.T
        dw2 = dw2 + jnp.einsum("bsd,bso->do", a, dyc).astype(jnp.float32)
        db2 = db2 + dyc.sum((0, 1)).astype(jnp.float32)
        # gelu'(h), tanh approximation, fp32 internals like jax.nn.gelu
        hf = h.astype(jnp.float32)
        c = jnp.sqrt(2.0 / jnp.pi).astype(jnp.float32)
        t = jnp.tanh(c * (hf + 0.044715 * hf ** 3))
        dg = 0.5 * (1.0 + t) + 0.5 * hf * (1.0 - t * t) * c * (
            1.0 + 3 * 0.044715 * hf * hf)
        dh = (da.astype(jnp.float32) * dg).astype(dt)
        dw0 = dw0 + jnp.einsum("bsd,bso->do", xc, dh).astype(jnp.float32)
        db0 = db0 + dh.sum((0, 1)).astype(jnp.float32)
        dxc = dh @ w0c.T
        return (dw0, db0, dw2, db2), dxc

    zeros = (jnp.zeros((din, dh_), jnp.float32),
             jnp.zeros((dh_,), jnp.float32),
             jnp.zeros((dh_, din), jnp.float32),
             jnp.zeros((din,), jnp.float32))
    (dw0, db0, dw2, db2), dxcs = jax.lax.scan(one, zeros, (xcs, dycs))
    dx = jnp.swapaxes(dxcs, 0, 1).reshape(b, sc, din)[:, :s]
    cast = lambda g, p: g.astype(p.dtype)
    return (dx.astype(x.dtype), cast(dw0, w0), cast(db0, b0),
            cast(dw2, w2), cast(db2, b2))


ff_chunked.defvjp(_ff_fwd, _ff_bwd)
