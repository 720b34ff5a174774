"""Pallas TPU kernel for tiny-sequence multi-head self-attention.

The MultiIPRouter's factored attentions (reference `models/router.py:425-493`)
run over tiny sequences with huge batches — temporal: S=13 over 2,700 rows,
multi-ID: S=2 over 17,550 rows (dim 512, 8 heads).  In XLA these materialise
fp32 score tensors whose minor dims are (S, S) — padded to (8·k, 128) tiles,
a 10-60x memory blowup — so every softmax elementwise op runs at a few
percent of HBM bandwidth (measured: ~18 ms of a 55 ms router invocation).

Kernel idea: fold (S, heads) into ONE packed axis of length S*H (104 / 16)
and compute, per row r of the batch, the full packed score matrix
[S*H, S*H] = Q_r @ K_r^T with a SINGLE batched MXU matmul, masking
cross-head pairs with -inf before the softmax (a head-block-diagonal mask).
The masked entries exp() to zero, so the P @ V matmul needs no further
masking.  Scores live only in VMEM — no padded HBM traffic at all.  The MXU
does H x more score work than strictly needed (off-diagonal head pairs), but
at S*H <= 128 the whole packed matrix is one MXU tile — the "waste" is free.

Backward: einsum-based recompute under `jax.custom_vjp` (training runs are
dominated by the DiT flash attention, not these tiny ops).

Non-TPU platforms (the 8-device CPU test mesh) use the einsum fallback,
which is the executable spec the kernel is tested against (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
VMEM_LIMIT = 64 * 1024 * 1024


def _head_mask(sh: int, heads: int) -> jnp.ndarray:
    """[SH, SH] bool: True where row and column belong to the same head.
    Packing order is (s, h) -> s*H + h, so head id = index mod H."""
    row = jax.lax.broadcasted_iota(jnp.int32, (sh, sh), 0) % heads
    col = jax.lax.broadcasted_iota(jnp.int32, (sh, sh), 1) % heads
    return row == col


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, sm_scale: float):
    q = q_ref[...]                                   # [R, SH, D]
    k = k_ref[...]
    v = v_ref[...]
    sh = q.shape[1]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [R, SH, SH]
    s = s * sm_scale
    s = jnp.where(_head_mask(sh, heads)[None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [R, SH, D]
    o_ref[...] = o.astype(o_ref.dtype)


def _einsum_attention(q, k, v, heads, sm_scale):
    """Executable spec (and CPU/backward path): same packed-mask math."""
    sh = q.shape[1]
    s = jnp.einsum("mad,mbd->mab", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(_head_mask(sh, heads)[None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("mab,mbd->mad", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_head_attention(q, k, v, heads: int, sm_scale: float):
    """Multi-head self-attention over a tiny packed axis.

    q/k/v: [M, S*H, D] with packing (s, h) -> s*H + h (i.e. the natural
    reshape of [M, S, H, D]).  Returns [M, S*H, D].  Use when S*H is at most
    ~128 — the packed score matrix must be one MXU tile for the fold to be
    free.
    """
    return _packed_fwd_impl(q, k, v, heads, sm_scale)


def _packed_fwd_impl(q, k, v, heads, sm_scale):
    if jax.devices()[0].platform != "tpu":
        return _einsum_attention(q, k, v, heads, sm_scale)

    m, sh, d = q.shape
    rows = 128 if sh > 32 else 512
    rows = min(rows, max(8, m))

    # non-dividing final block: Mosaic pads boundary loads and masks
    # boundary stores (validated exact on-chip) — no HBM pad copies needed
    spec = pl.BlockSpec((rows, sh, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, sm_scale=sm_scale),
        grid=(pl.cdiv(m, rows),),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, sh, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
    )(q, k, v)


def _packed_fwd(q, k, v, heads, sm_scale):
    return _packed_fwd_impl(q, k, v, heads, sm_scale), (q, k, v)


def _packed_bwd(heads, sm_scale, res, g):
    q, k, v = res
    sh = q.shape[1]
    s = jnp.einsum("mad,mbd->mab", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(_head_mask(sh, heads)[None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("mab,mad->mbd", p, gf)
    dp = jnp.einsum("mad,mbd->mab", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * sm_scale
    dq = jnp.einsum("mab,mbd->mad", ds, k.astype(jnp.float32))
    dk = jnp.einsum("mab,mad->mbd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


packed_head_attention.defvjp(_packed_fwd, _packed_bwd)
