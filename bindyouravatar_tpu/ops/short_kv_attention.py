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
    sm2 = sm_scale * 1.4426950408889634   # log2e fold: softmax in exp2
    acc = None
    for i in range(n_id):
        k = k_ref[0, i]                              # [H, K, D]
        v = v_ref[0, i]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm2    # [H, R, K]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
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


def _kernel_qmajor(*refs, n_id: int, sm_scale: float, combine: bool):
    """Same math as `_kernel`, but q (and the output) ride in the
    projections' NATURAL q-major layout [R, H, D] — the head-major swap
    happens on VMEM tiles inside the kernel instead of as an HBM transpose
    fused into the to_q matmul epilogue (measured to drop that matmul to
    ~24 TF/s in-model)."""
    if combine:
        q_ref, k_ref, v_ref, w_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs

    q = jnp.swapaxes(q_ref[0], 0, 1)                 # [R, H, D] -> [H, R, D]
    sm2 = sm_scale * 1.4426950408889634   # log2e fold: softmax in exp2
    acc = None
    for i in range(n_id):
        k = k_ref[0, i]                              # [H, K, D]
        v = v_ref[0, i]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm2    # [H, R, K]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [H, R, D]
        if combine:
            w = w_ref[0, :, i].astype(jnp.float32).reshape(1, -1, 1)
            acc = o * w if acc is None else acc + o * w
        else:
            o_ref[0, i] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)
    if combine:
        o_ref[0] = jnp.swapaxes(acc, 0, 1).astype(o_ref.dtype)


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


def _spec_attend_qmajor(q, k, v, sm_scale):
    """q [G,Sq,H,D] x k/v [G,I,H,K,D] -> per-id [G,I,Sq,H,D]."""
    s = jnp.einsum("gqhd,gihkd->gihqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gihqk,gihkd->giqhd", p.astype(v.dtype), v)


def _spec_combined_qmajor(q, k, v, w, sm_scale):
    o = _spec_attend_qmajor(q, k, v, sm_scale)       # [G,I,Sq,H,D]
    return jnp.einsum("giqhd,gqi->gqhd", o, w.astype(o.dtype))


def _spec_combined_flat(q, k, v, w, sm_scale):
    """q FLAT [G,Sq,H*D] x k/v [G,I,H,K,D], w [G,Sq,I] -> [G,Sq,H*D]."""
    g, sq, hd = q.shape
    h, d = k.shape[2], k.shape[4]
    o = _spec_combined_qmajor(q.reshape(g, sq, h, d), k, v, w, sm_scale)
    return o.reshape(g, sq, hd)


def _kernel_flat(q_ref, k_ref, v_ref, w_ref, o_ref, *, n_id: int, hpb: int,
                 dh: int, sm_scale: float):
    """Head-pair grid over FLAT q [1, R, hpb*dh] — q rides the to_q
    projection's natural (8,128)-tiled layout; no lane-padded [.., H, 64]
    arrays exist anywhere (the 4D q-major variant above still pads 64->128
    and fuses the relayout into the to_q epilogue — measured regression)."""
    q = q_ref[0]                                     # [R, hpb*dh]
    outs = []
    for h in range(hpb):
        qh = q[:, h * dh:(h + 1) * dh]               # [R, dh]
        acc = None
        for i in range(n_id):
            k = k_ref[0, i, h]                       # [K, dh]
            v = v_ref[0, i, h]
            s = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale   # [R, K]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [R, dh]
            w = w_ref[0, :, i].astype(jnp.float32).reshape(-1, 1)
            acc = o * w if acc is None else acc + o * w
        outs.append(acc)
    out = jnp.concatenate(outs, axis=1) if hpb > 1 else outs[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _call_kernel_flat(q, k, v, w, sm_scale):
    g, sq, hd = q.shape
    n_id, h, kk, d = k.shape[1], k.shape[2], k.shape[3], k.shape[4]
    hpb = max(1, 128 // d)
    assert h % hpb == 0 and (hpb * d) % 128 == 0, (h, d)
    rows = min(2048, (sq + 7) // 8 * 8)
    grid = (g, h // hpb, pl.cdiv(sq, rows))

    dpair = hpb * d
    in_specs = [
        pl.BlockSpec((1, rows, dpair), lambda gi, hp, qi: (gi, qi, hp)),
        pl.BlockSpec((1, n_id, hpb, kk, d),
                     lambda gi, hp, qi: (gi, 0, hp, 0, 0)),
        pl.BlockSpec((1, n_id, hpb, kk, d),
                     lambda gi, hp, qi: (gi, 0, hp, 0, 0)),
        pl.BlockSpec((1, rows, n_id), lambda gi, hp, qi: (gi, qi, 0)),
    ]
    return pl.pallas_call(
        functools.partial(_kernel_flat, n_id=n_id, hpb=hpb, dh=d,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, dpair),
                               lambda gi, hp, qi: (gi, qi, hp)),
        out_shape=jax.ShapeDtypeStruct((g, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(q, k, v, w)


def _call_kernel_qmajor(q, k, v, w, sm_scale):
    g, sq, h, d = q.shape
    n_id, kk = k.shape[1], k.shape[3]
    combine = w is not None
    # smaller rows than the head-major kernel: the in-kernel [R,H,D] <->
    # [H,R,D] swaps and the lane-padded [H,R,K] score tiles live in VMEM
    # simultaneously (124.9M > limit measured at rows=512, audio shape)
    rows = max(8, min(256, 2 * 2 ** 20 // (h * d)) // 8 * 8)
    grid = (g, pl.cdiv(sq, rows))

    in_specs = [
        pl.BlockSpec((1, rows, h, d), lambda gi, qi: (gi, qi, 0, 0)),
        pl.BlockSpec((1, n_id, h, kk, d), lambda gi, qi: (gi, 0, 0, 0, 0)),
        pl.BlockSpec((1, n_id, h, kk, d), lambda gi, qi: (gi, 0, 0, 0, 0)),
    ]
    inputs = [q, k, v]
    if combine:
        in_specs.append(pl.BlockSpec((1, rows, n_id),
                                     lambda gi, qi: (gi, qi, 0)))
        inputs.append(w)
        out_spec = pl.BlockSpec((1, rows, h, d), lambda gi, qi: (gi, qi, 0, 0))
        out_shape = jax.ShapeDtypeStruct((g, sq, h, d), q.dtype)
    else:
        out_spec = pl.BlockSpec((1, n_id, rows, h, d),
                                lambda gi, qi: (gi, 0, qi, 0, 0))
        out_shape = jax.ShapeDtypeStruct((g, n_id, sq, h, d), q.dtype)

    return pl.pallas_call(
        functools.partial(_kernel_qmajor, n_id=n_id, sm_scale=sm_scale,
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def short_kv_attention_qmajor(q, k, v, sm_scale: float):
    """Per-identity cross-attention, q-major IO: q [G,Sq,H,D] (the natural
    reshape of a [G,Sq,H*D] projection), k/v [G,I,H,K,D] ->
    [G,I,Sq,H,D].  No HBM head transposes on the query stream."""
    if jax.devices()[0].platform != "tpu":
        return _spec_attend_qmajor(q, k, v, sm_scale)
    return _call_kernel_qmajor(q, k, v, None, sm_scale)


def _fwd_aq(q, k, v, sm_scale):
    return short_kv_attention_qmajor(q, k, v, sm_scale), (q, k, v)


def _bwd_aq(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _spec_attend_qmajor(q, k, v, sm_scale), q, k, v)
    return vjp(g)


short_kv_attention_qmajor.defvjp(_fwd_aq, _bwd_aq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def short_kv_attention_combined_qmajor(q, k, v, w, sm_scale: float):
    """Identity-combined cross-attention, q-major IO: q [G,Sq,H,D],
    k/v [G,I,H,K,D], w [G,Sq,I] -> sum_i w_i * attn_i as [G,Sq,H,D] —
    a free reshape away from the flat [G,Sq,H*D] the out-projection wants."""
    if jax.devices()[0].platform != "tpu":
        return _spec_combined_qmajor(q, k, v, w, sm_scale)
    return _call_kernel_qmajor(q, k, v, w, sm_scale)


def _fwd_cq(q, k, v, w, sm_scale):
    return short_kv_attention_combined_qmajor(q, k, v, w, sm_scale), (q, k, v, w)


def _bwd_cq(sm_scale, res, g):
    q, k, v, w = res
    _, vjp = jax.vjp(
        lambda q, k, v, w: _spec_combined_qmajor(q, k, v, w, sm_scale),
        q, k, v, w)
    return vjp(g)


short_kv_attention_combined_qmajor.defvjp(_fwd_cq, _bwd_cq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def short_kv_attention_combined_flat(q, k, v, w, sm_scale: float):
    """Identity-combined cross-attention, FLAT q: q [G,Sq,H*D] (the to_q
    projection's natural layout — no reshape, no lane padding),
    k/v [G,I,H,K,D], w [G,Sq,I] -> [G,Sq,H*D]."""
    if jax.devices()[0].platform != "tpu":
        return _spec_combined_flat(q, k, v, w, sm_scale)
    return _call_kernel_flat(q, k, v, w, sm_scale)


def _fwd_cf(q, k, v, w, sm_scale):
    return short_kv_attention_combined_flat(q, k, v, w, sm_scale), (q, k, v, w)


def _bwd_cf(sm_scale, res, g):
    q, k, v, w = res
    _, vjp = jax.vjp(
        lambda q, k, v, w: _spec_combined_flat(q, k, v, w, sm_scale),
        q, k, v, w)
    return vjp(g)


short_kv_attention_combined_flat.defvjp(_fwd_cf, _bwd_cf)
