"""Pallas TPU kernel for long-query / short-KV cross-attention.

Both conditioning attentions of the DiT attend a LONG video-token query
stream to a tiny per-identity KV set:

  * audio frame-local cross-attn (reference `models/audio_model.py:223-270`):
    per latent frame, 1,350 queries x 32 audio tokens, 48 heads x 64;
  * PerceiverCrossAttention face injection (reference
    `models/router.py:196-275`): 17,550 queries x 32 face tokens per
    identity, 16 heads x 128.

In XLA the [.., heads, Sq, K=32] fp32 score tensors pad K to 128 lanes (4x)
and every softmax pass is an HBM round-trip over the padded tensor —
hundreds of MB per layer.  This kernel keeps scores entirely in VMEM: the
whole KV block (I*K tokens) is resident, the query stream is tiled in a
head-major [H, R, D] layout, and scores/softmax/PV run as head-batched
dot_generals (one MXU op chain per identity — no per-head unrolling).

Optionally fuses the identity combine: given per-query weights [.., Sq, I]
(the routing matrix), the kernel accumulates sum_i w_i * attn_i directly and
writes ONE output instead of I of them — the audio path's swap-and-invert
routing combine costs no extra HBM round-trips (PARITY divergence #10
extended into the kernel).

Backward: `jax.vjp` through the einsum spec (`_spec_*`) under
`jax.custom_vjp`.  Non-TPU platforms use the spec directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 96 * 1024 * 1024


def _kernel(*refs, n_id: int, sm_scale: float, combine: bool):
    if combine:
        q_ref, k_ref, v_ref, w_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs

    q = q_ref[0]                                     # [H, R, D]
    acc = None
    for i in range(n_id):
        k = k_ref[0, i]                              # [H, K, D]
        v = v_ref[0, i]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale    # [H, R, K]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [H, R, D]
        if combine:
            w = w_ref[0, :, i].astype(jnp.float32).reshape(1, -1, 1)
            acc = o * w if acc is None else acc + o * w
        else:
            o_ref[0, i] = o.astype(o_ref.dtype)
    if combine:
        o_ref[0] = acc.astype(o_ref.dtype)


def _spec_attend(q, k, v, sm_scale):
    """q [G,H,Sq,D] x k/v [G,I,H,K,D] -> per-id [G,I,H,Sq,D] (einsum spec)."""
    s = jnp.einsum("ghqd,gihkd->gihqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gihqk,gihkd->gihqd", p.astype(v.dtype), v)


def _spec_combined(q, k, v, w, sm_scale):
    o = _spec_attend(q, k, v, sm_scale)              # [G,I,H,Sq,D]
    return jnp.einsum("gihqd,gqi->ghqd", o, w.astype(o.dtype))


def _call_kernel(q, k, v, w, sm_scale):
    g, h, sq, d = q.shape
    n_id, kk = k.shape[1], k.shape[3]
    combine = w is not None
    rows = max(8, min(512, 2 * 2 ** 20 // (h * d)) // 8 * 8)
    grid = (g, pl.cdiv(sq, rows))

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
    else:
        out_spec = pl.BlockSpec((1, n_id, h, rows, d),
                                lambda gi, qi: (gi, 0, 0, qi, 0))
        out_shape = jax.ShapeDtypeStruct((g, n_id, h, sq, d), q.dtype)

    return pl.pallas_call(
        functools.partial(_kernel, n_id=n_id, sm_scale=sm_scale,
                          combine=combine),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(*inputs)


# ------------------------------------------------------------------ #
# public entry points (custom_vjp; einsum-spec backward)

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def short_kv_attention(q, k, v, sm_scale: float):
    """Per-identity cross-attention: q [G,H,Sq,D], k/v [G,I,H,K,D] ->
    [G, I, H, Sq, D].  K (and I*K) must be small — all KV lives in VMEM."""
    if jax.devices()[0].platform != "tpu":
        return _spec_attend(q, k, v, sm_scale)
    return _call_kernel(q, k, v, None, sm_scale)


def _fwd_a(q, k, v, sm_scale):
    return short_kv_attention(q, k, v, sm_scale), (q, k, v)


def _bwd_a(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _spec_attend(q, k, v, sm_scale), q, k, v)
    return vjp(g)


short_kv_attention.defvjp(_fwd_a, _bwd_a)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def short_kv_attention_combined(q, k, v, w, sm_scale: float):
    """Identity-combined cross-attention: q [G,H,Sq,D], k/v [G,I,H,K,D],
    w [G,Sq,I] -> sum_i w_i * attn_i as [G, H, Sq, D], with scores, softmax,
    PV, and the combine all fused in VMEM."""
    if jax.devices()[0].platform != "tpu":
        return _spec_combined(q, k, v, w, sm_scale)
    return _call_kernel(q, k, v, w, sm_scale)


def _fwd_c(q, k, v, w, sm_scale):
    return short_kv_attention_combined(q, k, v, w, sm_scale), (q, k, v, w)


def _bwd_c(sm_scale, res, g):
    q, k, v, w = res
    _, vjp = jax.vjp(
        lambda q, k, v, w: _spec_combined(q, k, v, w, sm_scale), q, k, v, w)
    return vjp(g)


short_kv_attention_combined.defvjp(_fwd_c, _bwd_c)
