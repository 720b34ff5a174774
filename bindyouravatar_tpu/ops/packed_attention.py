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


# --------------------------------------------------------------------- #
# channel-packed front end: [M, S, C] without HBM head reshapes

def _slice_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, sm_scale: float):
    """Per-head lane-sliced attention on channel-packed [R, S, C] tiles.
    Beats the packed fold for S >= ~8 (the [M,S,C] -> [M,S*H,D] HBM
    reshapes cost more than the per-head dot unrolling); loses for S = 2
    where the per-head dots degenerate."""
    r, s, c = q_ref.shape
    dh = c // heads
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        sc = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _spec_channel(q, k, v, heads, sm_scale):
    """Einsum spec for channel-packed [M, S, C] (head h = channels
    [h*dh, (h+1)*dh)) — identical math to the packed fold."""
    m, s, c = q.shape
    dh = c // heads
    qs = q.reshape(m, s, heads, dh)
    ks = k.reshape(m, s, heads, dh)
    vs = v.reshape(m, s, heads, dh)
    sc = jnp.einsum("mahd,mbhd->mhab", qs, ks,
                    preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("mhab,mbhd->mahd", p.astype(vs.dtype), vs)
    return o.reshape(m, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tiny_seq_attention(q, k, v, heads: int, sm_scale: float):
    """Multi-head self-attention over a tiny sequence, channel-packed IO:
    q/k/v [M, S, C] (C = heads * dh, h-major) -> [M, S, C].  Dispatches to
    the lane-sliced kernel (S >= 8) or the packed-head fold (smaller S),
    keeping the projections' natural layout end to end — no HBM reshapes.
    """
    return _tiny_impl(q, k, v, heads, sm_scale)


def _tiny_impl(q, k, v, heads, sm_scale):
    m, s, c = q.shape
    if jax.devices()[0].platform != "tpu":
        return _spec_channel(q, k, v, heads, sm_scale)
    if s < 8:
        dh = c // heads
        o = _packed_fwd_impl(q.reshape(m, s * heads, dh),
                             k.reshape(m, s * heads, dh),
                             v.reshape(m, s * heads, dh), heads, sm_scale)
        return o.reshape(m, s, c)
    rows = max(8, min(256, 2 ** 20 // (s * c)) // 8 * 8)
    rows = min(rows, max(8, m))
    spec = pl.BlockSpec((rows, s, c), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_slice_kernel, heads=heads, sm_scale=sm_scale),
        grid=(pl.cdiv(m, rows),),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, s, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024),
    )(q, k, v)


# --------------------------------------------------------------------- #
# pair-axis attention: [B, 2, M, C] across the LEADING pair axis
#
# The multi-ID STAB attention (S = num_ids = 2) previously transposed x to
# [..., I, C] and ran projections + kernel on [M, 2, 512] arrays — whose
# second-minor dim 2 tiles to 8 sublanes in HBM: a 4x layout blowup paid by
# the transpose, all four projections, AND the kernel reads (measured
# 277 GB/s effective).  Keeping the id axis LEADING ([B, I, THW, C] — a
# free reshape of the trunk's [B, I, T, H, W, C]) makes every array
# dense-tiled; this kernel blocks (1, 2, rows, C) so the pair never enters
# the minor dims, and the 2-way softmax runs as closed-form VPU ops.

def _pair_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, sm_scale: float):
    """MXU segment-reduce form.  The old per-head form lane-SLICED q/k/v at
    64-lane offsets (sub-vreg shuffles) and reduced each slice on the VPU —
    measured 109 GB/s effective, ~7x off the HBM roofline.  Here the
    per-head q.k dots are ONE full-width elementwise product followed by a
    [C, 128] head-indicator matmul (full 512-deep systolic contraction),
    and the per-head sigmoid weights broadcast back to their channels with
    the transposed indicator — no sub-128-lane slicing anywhere."""
    _, _, r, c = q_ref.shape
    dh = c // heads
    f32 = jnp.float32
    q = q_ref[0].astype(f32) * sm_scale              # [2, rows, C]
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    # head indicator seg[ch, h] = 1 iff ch // dh == h (in-register iota;
    # lanes h >= heads stay all-zero and drop out of both matmuls)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
    seg = (ci // dh == hi).astype(f32)               # [C, 128]
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (128, c), 1)
    hi2 = jax.lax.broadcasted_iota(jnp.int32, (128, c), 0)
    seg_t = (ci2 // dh == hi2).astype(f32)           # [128, C]
    dots = lambda a, b: jax.lax.dot_general(
        a * b, seg, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                  # [rows, 128]
    s00 = dots(q[0], k[0])
    s01 = dots(q[0], k[1])
    s10 = dots(q[1], k[0])
    s11 = dots(q[1], k[1])
    # closed-form 2-way softmax weights (per query row, per head lane)
    w01 = 1.0 / (1.0 + jnp.exp(s00 - s01))           # sigmoid(s01 - s00)
    w11 = 1.0 / (1.0 + jnp.exp(s10 - s11))
    bcast = lambda w: jax.lax.dot_general(
        w, seg_t, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dv = v[1] - v[0]
    o_ref[0, 0] = (v[0] + bcast(w01) * dv).astype(o_ref.dtype)
    o_ref[0, 1] = (v[0] + bcast(w11) * dv).astype(o_ref.dtype)


def _pair_spec(q, k, v, heads, sm_scale):
    """Einsum spec (CPU/backward path) for the pair-axis layout."""
    b, s, m, c = q.shape
    dh = c // heads
    qs = q.reshape(b, s, m, heads, dh)
    ks = k.reshape(b, s, m, heads, dh)
    vs = v.reshape(b, s, m, heads, dh)
    sc = jnp.einsum("bimhd,bjmhd->bmhij", qs, ks,
                    preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bmhij,bjmhd->bimhd", p.astype(vs.dtype), vs)
    return o.reshape(b, s, m, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pair_axis_attention(q, k, v, heads: int, sm_scale: float):
    """Attention across a LEADING pair axis: q/k/v [B, 2, M, C] -> same.

    Each (b, m, head) attends over the 2 entries of axis 1 (the multi-ID
    axis).  Layout-optimal for tiny S: no [.., S, C] second-minor-padded
    arrays are ever created (see _pair_kernel note)."""
    return _pair_impl(q, k, v, heads, sm_scale)


def _pair_impl(q, k, v, heads, sm_scale):
    b, s, m, c = q.shape
    if s != 2 or jax.devices()[0].platform != "tpu":
        return _pair_spec(q, k, v, heads, sm_scale)
    rows = min(1024, max(8, m))
    spec = pl.BlockSpec((1, 2, rows, c), lambda b_, i: (b_, 0, i, 0))
    return pl.pallas_call(
        functools.partial(_pair_kernel, heads=heads, sm_scale=sm_scale),
        grid=(b, pl.cdiv(m, rows)),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, m, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(q, k, v)


def _pair_fwd(q, k, v, heads, sm_scale):
    return _pair_impl(q, k, v, heads, sm_scale), (q, k, v)


def _pair_spec2(q, k, v, heads, sm_scale):
    """Closed-form 2-way softmax in the FLAT channel layout (identical
    math to `_pair_spec` at s == 2: softmax over two logits IS a sigmoid
    of their difference; per-head dots via a [C, H] segment-indicator
    einsum, the `_pair_kernel` trick).  Differentiating THIS instead of
    the einsum spec keeps every autodiff temp [B, M, C]-flat or [B, M, H]:
    the spec's backward materialised a 64x-lane-padded f32[M, H, 2, 2]
    (137 MB for 2.14 MB of data) plus a dozen half-padded
    bf16[2, M, H, dh] reshapes — together the remaining depth-14
    single-chip HBM gap (runs/chip_r5b/depth14_pln.log items 2, 6-16)."""
    b, s, m, c = q.shape
    dh = c // heads
    f32 = jnp.float32
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    seg = (ci // dh == hi).astype(f32)                     # [C, H]
    q32 = q.astype(f32) * sm_scale
    k32 = k.astype(f32)
    v32 = v.astype(f32)
    dots = lambda i, j: jnp.einsum("bmc,ch->bmh", q32[:, i] * k32[:, j], seg)
    w0 = jax.nn.sigmoid(dots(0, 1) - dots(0, 0))           # v1 weight, query 0
    w1 = jax.nn.sigmoid(dots(1, 1) - dots(1, 0))
    bcast = lambda w: jnp.einsum("bmh,ch->bmc", w, seg)
    dv = v32[:, 1] - v32[:, 0]
    o0 = v32[:, 0] + bcast(w0) * dv
    o1 = v32[:, 0] + bcast(w1) * dv
    return jnp.stack([o0, o1], 1).astype(q.dtype)


def _pair_bwd(heads, sm_scale, res, g):
    q, k, v = res
    f = _pair_spec2 if q.shape[1] == 2 else _pair_spec
    _, vjp = jax.vjp(
        lambda q, k, v: f(q, k, v, heads, sm_scale), q, k, v)
    return vjp(g)


pair_axis_attention.defvjp(_pair_fwd, _pair_bwd)


def _slice_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                      heads: int, sm_scale: float):
    """Backward of `_slice_kernel`: per-head lane-sliced score recompute +
    the standard softmax VJP, everything in VMEM.  The einsum backward's
    fp32 [M, H, S, S] score/ds tensors tile (13, 13) -> (16, 128) in HBM —
    a 12.1x padding blowup that was the #2 HBM temp of the depth-14
    single-chip train step (runs/chip_r4/depth14.log items 4/5/7)."""
    r, s, c = q_ref.shape
    dh = c // heads
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        sc = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale      # [R, S, S]
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        gh = g[:, :, sl].astype(jnp.float32)
        vh = v[:, :, sl].astype(jnp.float32)
        dv = jax.lax.dot_general(                                # rab,rad->rbd
            p, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(                                # rad,rbd->rab
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * sm_scale
        dq = jax.lax.dot_general(                                # rab,rbd->rad
            ds, k[:, :, sl].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(                                # rab,rad->rbd
            ds, q[:, :, sl].astype(jnp.float32),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dq_ref[...] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


def _tiny_bwd_pallas(q, k, v, g, heads, sm_scale, interpret=False):
    m, s, c = q.shape
    rows = max(8, min(128, 2 ** 19 // (s * c)) // 8 * 8)
    rows = min(rows, max(8, m))
    spec = pl.BlockSpec((rows, s, c), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_slice_bwd_kernel, heads=heads, sm_scale=sm_scale),
        grid=(pl.cdiv(m, rows),),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, s, c), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, g)


def _tiny_fwd(q, k, v, heads, sm_scale):
    return _tiny_impl(q, k, v, heads, sm_scale), (q, k, v)


def _tiny_bwd(heads, sm_scale, res, g):
    q, k, v = res
    s = q.shape[1]
    if jax.default_backend() == "tpu" and s >= 8:
        return _tiny_bwd_pallas(q, k, v, g, heads, sm_scale)
    _, vjp = jax.vjp(
        lambda q, k, v: _spec_channel(q, k, v, heads, sm_scale), q, k, v)
    return vjp(g)


tiny_seq_attention.defvjp(_tiny_fwd, _tiny_bwd)
