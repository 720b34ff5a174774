"""Pallas TPU flash attention for the DiT joint self-attention.

Forward: tiled online-softmax kernel (fp32 statistics, bf16 matmul inputs),
non-causal, with trailing-padding kv masking — the DiT's 17,776-token joint
sequence is padded to a block multiple and the pad masked in-kernel.

RoPE fusion: the rotate-half rotary embedding is applied to q/k TILES inside
the kernel (text positions get identity rows cos=1/sin=0).  Without fusion,
rotating [B, 48, 17776, 64] q and k in HBM materialises ~3.3 GB of 2-4x
pad-expanded temporaries per step (measured via the XLA HBM dump) and burns
bandwidth the kernel re-reads anyway.  The backward pass recomputes the
rotation per tile and back-rotates the accumulated dq/dk with the adjoint
R^T = rope(cos, -sin) before storing.

Backward: Pallas dKV and dQ kernels under `jax.custom_vjp` (a chunked plain
JAX recompute path is kept for reference/debug).

Replaces the reference's torch SDPA flash attention (the #1 hot spot,
SURVEY.md §2.9); RoPE application semantics follow diffusers
`apply_rotary_emb` as wired at reference `models/transformer.py:200-208`.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = 1.4426950408889634   # log2(e): exp(x) == exp2(x * LOG2E)
# scoped-VMEM budget for the kernels: the 16 MB default rejects the swept
# 1536-block config (21.3 MB with rope tiles + double buffering); v5e has
# 128 MB of VMEM
VMEM_LIMIT = 48 * 1024 * 1024


def _rope_tile(x, cos, sin):
    """Rotate-half RoPE on a [rows, d] tile (fp32 math, returns x.dtype).

    rope(x) = x*cos + rot(x)*sin with rot(x) = concat(-x2, x1); the adjoint
    is rope(g, cos, -sin).
    """
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[:, d // 2:], xf[:, : d // 2]], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


def _tile(ref, bshd: bool):
    """Read a [rows, d] tile from a [1,1,rows,d] (bhsd) or [1,rows,1,d]
    (bshd) block."""
    return ref[0, :, 0, :] if bshd else ref[0, 0]


def _layernorm_tile(x, scale_ref, bias_ref, eps=1e-6):
    """Per-row LayerNorm over the last (head) dim of a [rows, d] tile,
    fp32 statistics — the QK-norm fused into the kernel.  Outside the
    kernel this LN runs on the [B, S, H, 64] layout whose minor dims pad
    to (8, 128) tiles: 2x HBM blowup on fp32 round trips (~234 ms/step of
    converts measured in the r3 profile)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps)
    return y * scale_ref[...] + bias_ref[...]


def _fwd_kernel(*refs, sm_scale: float, kv_len: int, block_k: int,
                num_kv_blocks: int, need_mask: bool, save_residuals: bool,
                has_rope: bool, bshd: bool, has_qk_norm: bool = False,
                lse_compact: bool = False, q_len: int = 0):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    if has_rope:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[:4]
        refs = refs[4:]
    if has_qk_norm:
        qs_ref, qb_ref, ks_ref, kb_ref = refs[:4]
        refs = refs[4:]
    rest = refs
    if save_residuals:
        o_ref, lse_ref, m_ref, acc_ref = rest
    else:
        o_ref, m_ref, acc_ref = rest

    ik = pl.program_id(3)
    if save_residuals and lse_compact:
        nq_rows = m_ref.shape[0]
        q_rows = pl.program_id(2) * nq_rows + jax.lax.broadcasted_iota(
            jnp.int32, (nq_rows, 1), 0)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = _tile(q_ref, bshd)  # [bq, d]
    k = _tile(k_ref, bshd)  # [bk, d]
    if has_qk_norm:          # QK-LN first, then rope (reference order)
        q = _layernorm_tile(q, qs_ref, qb_ref).astype(q.dtype)
        k = _layernorm_tile(k, ks_ref, kb_ref).astype(k.dtype)
    if has_rope:
        q = _rope_tile(q, cq_ref[...], sq_ref[...])
        k = _rope_tile(k, ck_ref[...], sk_ref[...])
    v = _tile(v_ref, bshd)                     # [bk, d]

    if need_mask:
        # the grid is non-dividing: k/v boundary loads beyond kv_len hold
        # UNDEFINED values (NaN in interpret mode) — zero those [bk, d]
        # tails (post-rope, so garbage cos/sin rows are covered too).  At
        # d=64 these passes cost ~1/12 of one [bq, bk] score pass; the
        # [bq, bk] NEG_INF score mask they replace cost ~3 such passes
        # (3.8 ms/call measured at the joint shape).
        rows_kd = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, k.shape, 0)
        k = jnp.where(rows_kd < kv_len, k, jnp.zeros_like(k))
        v = jnp.where(rows_kd < kv_len, v, jnp.zeros_like(v))

    # fold the softmax scale AND log2(e) into the [bq, d] q tile — scaling
    # the [bq, bk] fp32 score tile instead costs a full VPU pass per block
    # (bk/d = 24x more elements; the kernel is VPU-bound).  With the log2e
    # fold the softmax runs in exp2 (what exp lowers to anyway) with zero
    # per-tile multiplies; the LSE is converted back to nat units at the
    # cheap [bq, 1] store (same trick as the combined backward kernel).
    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    # (r3, measured: rounding the scores to bf16 after the dot — to halve
    # the softmax passes' VMEM bandwidth — is NOT faster (57.2 vs 56.5 ms)
    # and costs 2.5x output accuracy; Mosaic also requires fp32 matmul acc,
    # so the early-bf16 variant can't skip the cast pass.  fp32 kept.)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]

    m_prev = m_ref[:, :1]                      # [bq, 1] (log2 units)
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)                   # [bq, bk] fp32

    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)

    # row-sum of p rides the PV matmul: v is lane-padded 64 -> 128 on the
    # MXU anyway, so an extra column at index d makes acc[:, d] the softmax
    # normaliser for free — the [bq, bk] fp32 VPU reduction disappears
    # (the kernel is VPU-bound: softmax passes outnumber MXU cycles).
    #
    # kv-tail masking ALSO rides that column: instead of a NEG_INF
    # iota+compare+select over the [bq, bk] scores (~3 VPU passes, measured
    # 3.8 ms/call at the joint shape), the column holds VALIDITY (1 for
    # rows < kv_len, 0 for the zero-padded tail) — pad columns then
    # contribute 0 to both the numerator (v rows are zero-padded) and the
    # denominator, which is exact: the online-softmax max shift cancels in
    # the p@v / p@valid ratio.  The tail's s=0 scores only raise the
    # running max (a stability shift, harmless for the QK-LN-bounded
    # scores of this model).  The validity column is a [bk, 1] compute.
    d = v.shape[-1]
    if need_mask:
        rows = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (v.shape[0], 1), 0)
        valid = (rows < kv_len).astype(v.dtype)
    else:
        valid = jnp.ones((v.shape[0], 1), v.dtype)
    v_ext = jnp.concatenate([v, valid], axis=1)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [bq, d+1]; col d = sum(p)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ik == num_kv_blocks - 1)
    def _store():
        l_fin = acc_ref[:, d:d + 1]
        inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        out = (acc_ref[:, :d] * inv).astype(o_ref.dtype)
        if bshd:
            o_ref[0, :, 0, :] = out
        else:
            o_ref[0, 0] = out
        if save_residuals:
            # LSE per row; all-masked (padded-q) rows get +BIG so the
            # backward recompute yields p = exp(s - BIG) = 0
            # m is in log2 units (q carries the log2e fold); emit the LSE in
            # NAT units — the fwd<->bwd residual contract is unchanged
            m_fin = m_ref[:, :1] * (1.0 / LOG2E)
            lse = jnp.where(l_fin == 0.0, -NEG_INF, m_fin + jnp.log(l_fin))
            if lse_compact:
                # [1, bq] row into the compact [B, H, 1, S] residual (the
                # lane-broadcast [B,H,S,128] layout costs 453 MB at the
                # joint shape); sublane->lane rotation via identity matmul.
                # Mask tail rows first: boundary-loaded q rows
                # (non-dividing grid) hold undefined values which would
                # contaminate EVERY lane through the matmul (NaN*0 = NaN).
                n = lse.shape[0]
                lse_s = jnp.where(q_rows < q_len, lse, -NEG_INF)
                eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) ==
                       jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                       ).astype(jnp.float32)
                lse_ref[0, 0] = jax.lax.dot_general(
                    lse_s, eye, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_rope(rope, s_pad: int):
    """Pad joint-length [S, d] fp32 tables to s_pad with identity rows."""
    cos, sin = rope
    extra = s_pad - cos.shape[0]
    if extra > 0:
        cos = jnp.concatenate(
            [cos, jnp.ones((extra, cos.shape[1]), jnp.float32)], axis=0)
        sin = jnp.concatenate(
            [sin, jnp.zeros((extra, sin.shape[1]), jnp.float32)], axis=0)
    return cos, sin


def _specs(block_q, block_k, d, bshd, kv_grid_order=False):
    """(q/o, kv, lse) BlockSpecs for [B,H,S,D] (bhsd) or [B,S,H,D] (bshd).

    `kv_grid_order`: grid is (b, h, ik, iq) (the dkv kernel) instead of
    (b, h, iq, ik).
    """
    if kv_grid_order:
        qi = lambda b_, h_, ik, iq: ((b_, iq, h_, 0) if bshd else (b_, h_, iq, 0))
        ki = lambda b_, h_, ik, iq: ((b_, ik, h_, 0) if bshd else (b_, h_, ik, 0))
        li = lambda b_, h_, ik, iq: (b_, h_, iq, 0)
        rq = lambda b_, h_, ik, iq: (iq, 0)
        rk = lambda b_, h_, ik, iq: (ik, 0)
    else:
        qi = lambda b_, h_, iq, ik: ((b_, iq, h_, 0) if bshd else (b_, h_, iq, 0))
        ki = lambda b_, h_, iq, ik: ((b_, ik, h_, 0) if bshd else (b_, h_, ik, 0))
        li = lambda b_, h_, iq, ik: (b_, h_, iq, 0)
        rq = lambda b_, h_, iq, ik: (iq, 0)
        rk = lambda b_, h_, iq, ik: (ik, 0)
    qshape = (1, block_q, 1, d) if bshd else (1, 1, block_q, d)
    kshape = (1, block_k, 1, d) if bshd else (1, 1, block_k, d)
    return (pl.BlockSpec(qshape, qi), pl.BlockSpec(kshape, ki),
            pl.BlockSpec((1, 1, block_q, LANES), li),
            pl.BlockSpec((block_q, d), rq), pl.BlockSpec((block_k, d), rk))


def _pad_seq(arrs, s_pad, bshd):
    axis = 1 if bshd else 2
    out = []
    for x in arrs:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, s_pad - x.shape[axis])
        out.append(jnp.pad(x, pad))
    return out


def _fwd_impl(q, k, v, rope, sm_scale: float, kv_len: int,
              block_q: int, block_k: int, interpret: bool,
              save_residuals: bool = False, bshd: bool = False,
              qk_norm=None, lse_compact: bool = False):
    if bshd:
        b, s, h, d = q.shape
    else:
        b, h, s, d = q.shape
    # NO input padding or output slicing: the grid is non-dividing (Mosaic
    # pads boundary loads — contents undefined, handled by the in-kernel
    # tail zeroing — and masks boundary stores).  The explicit jnp.pads +
    # out[:, :s] slice cost ~1.5 ms of HBM copies per layer call at the
    # 17,776-token joint shape (r3 step profile).
    nq = pl.cdiv(s, block_q)
    nk = pl.cdiv(s, block_k)
    has_rope = rope is not None

    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, kv_len=kv_len,
        block_k=block_k, num_kv_blocks=nk, need_mask=kv_len < nk * block_k,
        save_residuals=save_residuals, has_rope=has_rope, bshd=bshd,
        has_qk_norm=qk_norm is not None, lse_compact=lse_compact, q_len=s)

    qo_spec, kv_spec, lse_spec, rq_spec, rk_spec = _specs(
        block_q, block_k, d, bshd)
    in_specs = [qo_spec, kv_spec, kv_spec]
    inputs = [q, k, v]
    if has_rope:
        cos, sin = rope
        in_specs += [rq_spec, rq_spec, rk_spec, rk_spec]
        inputs += [cos, sin, cos, sin]
    if qk_norm is not None:
        aff_spec = pl.BlockSpec((1, d), lambda *idx: (0, 0))
        for a in qk_norm:   # (q_scale, q_bias, k_scale, k_bias), each [d]
            inputs.append(a.astype(jnp.float32).reshape(1, d))
            in_specs.append(aff_spec)

    oshape = (b, s, h, d) if bshd else (b, h, s, d)
    out_shapes = [jax.ShapeDtypeStruct(oshape, q.dtype)]
    out_specs = [qo_spec]
    if save_residuals:   # lse output costs VMEM — only when training needs it
        if lse_compact:
            out_shapes.append(jax.ShapeDtypeStruct((b, h, 1, s), jnp.float32))
            out_specs.append(pl.BlockSpec(
                (1, 1, 1, block_q), lambda b_, h_, iq, ik: (b_, h_, 0, iq)))
        else:
            out_shapes.append(
                jax.ShapeDtypeStruct((b, h, s, LANES), jnp.float32))
            out_specs.append(lse_spec)

    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(b, h, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),   # m
            pltpu.VMEM((block_q, d + 1), jnp.float32),   # acc | l column
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)
    if save_residuals:
        out, lse = res
        return out, lse
    return res[0]


# --------------------------------------------------------------------------
# flat-layout forward: q/k/v/o as [B, S, H*D] — no [B,S,H,D] arrays in HBM
# --------------------------------------------------------------------------
#
# The [B, S, H, 64] bshd arrays XLA materialises for the bhsd kernel are
# lane-padded 64 -> 128 (2x HBM on every q/k/v/o and every LN round trip),
# and the [B,H,S,D] transposes fuse into the projection epilogues (to_v
# measured at 88 TF/s vs 139 for a clean dot).  This kernel keeps the
# projections' FLAT layout end to end: blocks are 128-lane HEAD PAIRS
# (for d=64; generally 128//d heads per block), the per-head QK LayerNorm
# and RoPE run in-kernel, and — unlike the reverted per-grid-step fusion
# (+26 ms/call) — the transformed q tile is cached in scratch per iq and
# the transformed K for the whole sequence is cached in scratch at iq == 0,
# so LN/rope run ONCE per tile instead of nk/nq times.  Inference path
# only (no custom_vjp; training keeps the bshd path + outside LN).

def _fwd_flat_kernel(*refs, sm_scale: float, kv_len: int, block_k: int,
                     num_kv_blocks: int, need_mask: bool, has_rope: bool,
                     has_qk_norm: bool, dh: int, hpb: int,
                     save_residuals: bool = False, q_len: int = 0):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    if has_rope:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[:4]
        refs = refs[4:]
    if has_qk_norm:
        qs_ref, qb_ref, ks_ref, kb_ref = refs[:4]
        refs = refs[4:]
    o_ref = refs[0]
    refs = refs[1:]
    lse_ref = None
    if save_residuals:
        lse_ref = refs[0]
        refs = refs[1:]
    qc_ref, kc_ref = refs[:2]
    m_refs = refs[2:2 + hpb]
    acc_refs = refs[2 + hpb:2 + 2 * hpb]

    iq = pl.program_id(2)
    ik = pl.program_id(3)
    if save_residuals:
        nq_rows = m_refs[0].shape[0]
        q_rows = iq * nq_rows + jax.lax.broadcasted_iota(
            jnp.int32, (nq_rows, 1), 0)

    def prep(x, is_q):
        if has_qk_norm:
            sc, bi = (qs_ref, qb_ref) if is_q else (ks_ref, kb_ref)
            x = _layernorm_tile(x, sc, bi).astype(x.dtype)
        if has_rope:
            cos, sin = (cq_ref, sq_ref) if is_q else (ck_ref, sk_ref)
            x = _rope_tile(x, cos[...], sin[...])
        return x

    @pl.when(ik == 0)
    def _init():
        for mr, ar in zip(m_refs, acc_refs):
            mr[...] = jnp.full_like(mr, NEG_INF)
            ar[...] = jnp.zeros_like(ar)
        qt = q_ref[0]                            # [bq, hpb*dh]
        halves = [prep(qt[:, h * dh:(h + 1) * dh], True) for h in range(hpb)]
        qq = jnp.concatenate(halves, axis=1) if hpb > 1 else halves[0]
        # scale fold includes log2(e): the softmax below runs in exp2 with
        # zero per-tile multiplies (exp lowers to exp2+mul anyway); the LSE
        # converts back to nat units at the [bq, 1]-wide store
        qc_ref[...] = (qq.astype(jnp.float32)
                       * (sm_scale * LOG2E)).astype(qc_ref.dtype)

    @pl.when(iq == 0)
    def _cache_k():
        kt = k_ref[0]                            # [bk, hpb*dh]
        halves = [prep(kt[:, h * dh:(h + 1) * dh], False) for h in range(hpb)]
        kk = jnp.concatenate(halves, axis=1) if hpb > 1 else halves[0]
        if need_mask:
            rows = ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, kk.shape, 0)
            kk = jnp.where(rows < kv_len, kk, jnp.zeros_like(kk))
        kc_ref[pl.ds(ik * block_k, block_k), :] = kk.astype(kc_ref.dtype)

    v = v_ref[0]                                 # [bk, hpb*dh]
    if need_mask:
        rows = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(rows < kv_len, v, jnp.zeros_like(v))
        rcol = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (v.shape[0], 1), 0)
        valid = (rcol < kv_len).astype(v.dtype)
    else:
        valid = jnp.ones((v.shape[0], 1), v.dtype)

    kblk = kc_ref[pl.ds(ik * block_k, block_k), :]
    qall = qc_ref[...]
    for h in range(hpb):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            qall[:, sl], kblk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        m_ref = m_refs[h]
        acc_ref = acc_refs[h]
        m_prev = m_ref[:, :1]                    # (log2 units)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        v_ext = jnp.concatenate([v[:, sl], valid], axis=1)   # [bk, dh+1]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, dh+1]
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ik == num_kv_blocks - 1)
    def _store():
        outs = []
        for acc_ref in acc_refs:
            l_fin = acc_ref[:, dh:dh + 1]
            inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            outs.append(acc_ref[:, :dh] * inv)
        out = jnp.concatenate(outs, axis=1) if hpb > 1 else outs[0]
        o_ref[0] = out.astype(o_ref.dtype)
        if save_residuals:
            # per-head LSE row [1, bq]: the stats live as [bq, 1] columns
            # (q rows on sublanes); rotate sublanes -> lanes via an
            # identity matmul (MXU transpose, ~1M MACs — no Mosaic 2D
            # vector transpose needed).  Compact [hpb, bq] tile per store.
            n = m_refs[0].shape[0]
            eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) ==
                   jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                   ).astype(jnp.float32)
            rows = []
            for m_ref, acc_ref in zip(m_refs, acc_refs):
                l_fin = acc_ref[:, dh:dh + 1]
                # m in log2 units (log2e fold) -> emit NAT-units LSE
                lse_col = jnp.where(l_fin == 0.0, -NEG_INF,
                                    m_ref[:, :1] * (1.0 / LOG2E)
                                    + jnp.log(l_fin))
                # mask boundary-loaded tail rows (undefined values would
                # contaminate every lane through the matmul: NaN*0 = NaN)
                lse_col = jnp.where(q_rows < q_len, lse_col, -NEG_INF)
                rows.append(jax.lax.dot_general(
                    lse_col, eye, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            lse_ref[0, 0] = (jnp.concatenate(rows, axis=0)
                             if hpb > 1 else rows[0])


def _fwd_flat_impl(q, k, v, heads: int, rope, sm_scale: float, kv_len: int,
                   block_q: int, block_k: int, interpret: bool,
                   qk_norm=None, save_residuals: bool = False):
    """q/k/v: [B, S, H*D] flat.  Returns [B, S, H*D] (and, with
    `save_residuals`, the LSE as compact [B, H//hpb, hpb, S] fp32)."""
    b, s, hd = q.shape
    d = hd // heads
    hpb = max(1, LANES // d)                     # heads per 128-lane block
    assert heads % hpb == 0 and (hpb * d) % LANES == 0, (heads, d)
    nq = pl.cdiv(s, block_q)
    nk = pl.cdiv(s, block_k)
    has_rope = rope is not None

    kernel = functools.partial(
        _fwd_flat_kernel, sm_scale=sm_scale, kv_len=kv_len,
        block_k=block_k, num_kv_blocks=nk, need_mask=kv_len < nk * block_k,
        has_rope=has_rope, has_qk_norm=qk_norm is not None, dh=d, hpb=hpb,
        save_residuals=save_residuals, q_len=s)

    dpair = hpb * d
    qi = lambda b_, hp, iq, ik: (b_, iq, hp)
    ki = lambda b_, hp, iq, ik: (b_, ik, hp)
    rq = lambda b_, hp, iq, ik: (iq, 0)
    rk = lambda b_, hp, iq, ik: (ik, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, dpair), qi),
        pl.BlockSpec((1, block_k, dpair), ki),
        pl.BlockSpec((1, block_k, dpair), ki),
    ]
    inputs = [q, k, v]
    if has_rope:
        cos, sin = rope
        in_specs += [pl.BlockSpec((block_q, d), rq),
                     pl.BlockSpec((block_q, d), rq),
                     pl.BlockSpec((block_k, d), rk),
                     pl.BlockSpec((block_k, d), rk)]
        inputs += [cos, sin, cos, sin]
    if qk_norm is not None:
        aff_spec = pl.BlockSpec((1, d), lambda *idx: (0, 0))
        for a in qk_norm:   # (q_scale, q_bias, k_scale, k_bias), each [d]
            inputs.append(a.astype(jnp.float32).reshape(1, d))
            in_specs.append(aff_spec)

    scratch = [
        pltpu.VMEM((block_q, dpair), q.dtype),           # qc (LN+rope+scale)
        pltpu.VMEM((nk * block_k, dpair), k.dtype),      # kc (whole-seq K)
    ]
    scratch += [pltpu.VMEM((block_q, LANES), jnp.float32)] * hpb   # m
    scratch += [pltpu.VMEM((block_q, d + 1), jnp.float32)] * hpb   # acc|l

    out_shapes = [jax.ShapeDtypeStruct((b, s, hd), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, dpair), qi)]
    if save_residuals:
        out_shapes.append(jax.ShapeDtypeStruct((b, heads // hpb, hpb, s),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 1, hpb, block_q), lambda b_, hp, iq, ik: (b_, hp, 0, iq)))

    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(b, heads // hpb, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)
    if save_residuals:
        return res[0], res[1]
    return res[0]


def _fwd_flat_t_store(acc_refs, qc_ref, o_ref, dh, hpb, out_transposed,
                      num_kv_blocks, ik):
    """Final-kv-block store shared by the staged and pipelined schedules:
    normalise by the ones-row row-sum and either keep the accumulator's
    [dh, bq] orientation (`out_transposed`) or rotate with an exact eye
    matmul."""
    @pl.when(ik == num_kv_blocks - 1)
    def _store():
        if out_transposed:
            outs = []
            for acc_ref in acc_refs:
                l_fin = acc_ref[dh:dh + 1, :]    # [1, bq]
                inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
                outs.append((acc_ref[:dh, :] * inv).astype(o_ref.dtype))
            out = jnp.concatenate(outs, axis=0) if hpb > 1 else outs[0]
            o_ref[0] = out
            return
        bq = qc_ref.shape[0]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
               ).astype(o_ref.dtype)
        outs = []
        for acc_ref in acc_refs:
            l_fin = acc_ref[dh:dh + 1, :]        # [1, bq]
            inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            xs = (acc_ref[:dh, :] * inv).astype(o_ref.dtype)   # [dh, bq]
            outs.append(jax.lax.dot_general(
                eye, xs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        out = jnp.concatenate(outs, axis=1) if hpb > 1 else outs[0]
        o_ref[0] = out.astype(o_ref.dtype)


def _fwd_flat_t_kernel(*refs, sm_scale: float, kv_len: int, block_q: int,
                       out_transposed: bool = False, static_max: bool = False,
                       need_q_mask: bool, block_k: int,
                       num_kv_blocks: int, need_mask: bool, has_rope: bool,
                       has_qk_norm: bool, dh: int, hpb: int,
                       pipeline_chunks: int = 1):
    """Transposed-PV flat forward (inference).

    Layout rationale (measured, runs/chip_r4): both matmuls of the regular
    flat kernel are HALF-RATE on the MXU — QK^T contracts over d=64 (half
    the 128-deep systolic contraction) and PV emits only dh+1=65 output
    lanes (half the 128-wide output tile).  Here the score tile is computed
    TRANSPOSED (st = k q^T, [bk, bq] — same trick the combined backward
    kernel uses) so PV becomes

        acc_t[d, q] += sum_k vt[d, k] * p_t[k, q]      # N = block_q lanes

    a full-width NN matmul (~2x PV rate).  V arrives pre-transposed as
    [B, H*D, S] — the caller's to_v matmul emits that layout for free
    (einsum output ordering), so no HBM transpose pass exists anywhere.
    Softmax stats live as [1, bq] lane rows (broadcast along sublanes is
    free); the final store rotates [dh, bq] -> [bq, dh] with an eye matmul
    (~1.4% of the kernel's FLOPs, exact).
    """
    refs = list(refs)
    q_ref, k_ref, vt_ref = refs[:3]
    refs = refs[3:]
    if has_rope:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[:4]
        refs = refs[4:]
    if has_qk_norm:
        qs_ref, qb_ref, ks_ref, kb_ref = refs[:4]
        refs = refs[4:]
    mb_ref = None
    if static_max:
        mb_ref = refs[0]             # [1, 1] fp32: provable logit bound
        refs = refs[1:]
    o_ref = refs[0]
    refs = refs[1:]
    qc_ref, kc_ref = refs[:2]
    if static_max:
        m_refs = ()
        acc_refs = refs[2:2 + hpb]
    else:
        m_refs = refs[2:2 + hpb]
        acc_refs = refs[2 + hpb:2 + 2 * hpb]

    iq = pl.program_id(2)
    ik = pl.program_id(3)

    def prep(x, is_q):
        if has_qk_norm:
            sc, bi = (qs_ref, qb_ref) if is_q else (ks_ref, kb_ref)
            x = _layernorm_tile(x, sc, bi).astype(x.dtype)
        if has_rope:
            cos, sin = (cq_ref, sq_ref) if is_q else (ck_ref, sk_ref)
            x = _rope_tile(x, cos[...], sin[...])
        return x

    @pl.when(ik == 0)
    def _init():
        for mr in m_refs:
            mr[...] = jnp.full_like(mr, NEG_INF)
        for ar in acc_refs:
            ar[...] = jnp.zeros_like(ar)
        qt = q_ref[0]                            # [bq, hpb*dh]
        if need_q_mask:
            # boundary-block q rows past the sequence are UNDEFINED loads
            # (NaN in interpret mode) — select them to zero BEFORE the
            # LN/rope prep, else the _store eye matmul mixes 0*NaN into
            # EVERY valid row of the block (ADVICE r4 high: non-dividing
            # s returned NaN across the whole boundary block)
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, qt.shape, 0)
            qt = jnp.where(rows < kv_len, qt, jnp.zeros_like(qt))
        halves = [prep(qt[:, h * dh:(h + 1) * dh], True) for h in range(hpb)]
        qq = jnp.concatenate(halves, axis=1) if hpb > 1 else halves[0]
        qc_ref[...] = (qq.astype(jnp.float32)
                       * (sm_scale * LOG2E)).astype(qc_ref.dtype)

    @pl.when(iq == 0)
    def _cache_k():
        kt = k_ref[0]                            # [bk, hpb*dh]
        halves = [prep(kt[:, h * dh:(h + 1) * dh], False) for h in range(hpb)]
        kk = jnp.concatenate(halves, axis=1) if hpb > 1 else halves[0]
        if need_mask:
            rows = ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, kk.shape, 0)
            kk = jnp.where(rows < kv_len, kk, jnp.zeros_like(kk))
        kc_ref[pl.ds(ik * block_k, block_k), :] = kk.astype(kc_ref.dtype)

    vt = vt_ref[0]                               # [hpb*dh, bk]
    if need_mask:
        cols = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, vt.shape, 1)
        vt = jnp.where(cols < kv_len, vt, jnp.zeros_like(vt))
        crow = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, vt.shape[1]), 1)
        valid = (crow < kv_len).astype(vt.dtype)     # [1, bk] ones row
    else:
        valid = jnp.ones((1, vt.shape[1]), vt.dtype)

    kblk = kc_ref[pl.ds(ik * block_k, block_k), :]
    qall = qc_ref[...]

    if static_max and pipeline_chunks > 1:
        # SOFTWARE-PIPELINED schedule (static-max only): split the q lanes
        # into `pipeline_chunks` independent (head, chunk) units and emit
        #   st[i+1] (MXU) ; p[i] = exp2 (VPU) ; pv[i] (MXU) ; ...
        # so each exp2 pass sits BETWEEN two matmuls it does not depend on
        # — Mosaic issues per-unit in order, so program order is the only
        # overlap control we have.  The plain staged form (all sts, all
        # exps, all pvs) leaves the MXU idle for the whole ~12-15 ms/call
        # exp2 pass; here only the first chunk's exp2 is exposed.
        nc = pipeline_chunks
        bqc = qall.shape[0] // nc
        mm = mb_ref[0, 0]
        vts = [jnp.concatenate([vt[h * dh:(h + 1) * dh], valid], axis=0)
               for h in range(hpb)]
        units = [(h, c) for h in range(hpb) for c in range(nc)]

        def issue_st(u):
            h, c = u
            sl = slice(h * dh, (h + 1) * dh)
            return jax.lax.dot_general(
                kblk[:, sl], qall[c * bqc:(c + 1) * bqc, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [bk, bqc]

        st_buf = {units[0]: issue_st(units[0])}
        for i, u in enumerate(units):
            if i + 1 < len(units):
                st_buf[units[i + 1]] = issue_st(units[i + 1])
            h, c = u
            p = jnp.exp2(st_buf.pop(u) - mm).astype(vt.dtype)
            pv = jax.lax.dot_general(
                vts[h], p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [dh+1, bqc]
            cs = pl.ds(c * bqc, bqc)
            acc_refs[h][:, cs] = acc_refs[h][:, cs] + pv
        _fwd_flat_t_store(acc_refs, qc_ref, o_ref, dh, hpb, out_transposed,
                          num_kv_blocks, ik)
        return

    # STAGED over the head pair: issue BOTH score matmuls first, then both
    # softmax passes, then both PV matmuls — the per-head st(MXU) ->
    # exp2(VPU) -> pv(MXU) chain is serial, but head 1's matmuls are
    # independent of head 0's VPU work, so interleaving lets the MXU run
    # under the ~35%-of-kernel exp2 pass instead of idling behind it
    sts = []
    for h in range(hpb):
        sl = slice(h * dh, (h + 1) * dh)
        sts.append(jax.lax.dot_general(
            kblk[:, sl], qall[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))  # [bk, bq]
    pts, alphas = [], []
    if static_max:
        # STATIC-MAX softmax (fused-QK-LN inference path): the caller
        # passes a PROVABLE upper bound M on |logit| in log2 units —
        # per-row LN output 2-norm <= ||gain||_2 + ||bias||_2 (the
        # standardized vector has unit RMS), rope is a rotation (norm-
        # preserving), so st <= sm_scale*log2(e)*Bq*Bk.  Softmax is
        # shift-invariant and p = exp2(st - M) >= 2^(-2M) stays far above
        # bf16's underflow, so out = acc/l is the EXACT softmax up to the
        # same bf16-p rounding the running-max variant has.  This deletes
        # the per-tile max reduce (a full VMEM read pass), the m state,
        # and the acc rescale — the kernel's largest non-MXU cost.
        mm = mb_ref[0, 0]
        for h in range(hpb):
            pts.append(jnp.exp2(sts[h] - mm).astype(vt.dtype))
    else:
        for h in range(hpb):
            m_ref = m_refs[h]
            m_prev = m_ref[:1, :]                # [1, bq] (log2 units)
            m_curr = jnp.max(sts[h], axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alphas.append(jnp.exp2(m_prev - m_next))
            # emit bf16 straight from the exp2 pass: p only feeds the bf16
            # PV matmul, so the cast here is semantics-identical but fuses
            # into the exp2's store (no separate re-read of the fp32 tile)
            pts.append(jnp.exp2(sts[h] - m_next).astype(vt.dtype))
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    for h in range(hpb):
        sl = slice(h * dh, (h + 1) * dh)
        acc_ref = acc_refs[h]
        # ones-row rides the matmul: acc row dh accumulates l = sum_k p
        vt_ext = jnp.concatenate([vt[sl], valid], axis=0)    # [dh+1, bk]
        pv = jax.lax.dot_general(
            vt_ext, pts[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [dh+1, bq]
        if static_max:
            acc_ref[...] = acc_ref[...] + pv
        else:
            acc_ref[...] = acc_ref[...] * alphas[h] + pv

    _fwd_flat_t_store(acc_refs, qc_ref, o_ref, dh, hpb, out_transposed,
                      num_kv_blocks, ik)


def _fwd_flat_t_impl(q, k, vt, heads: int, rope, sm_scale: float,
                     kv_len: int, block_q: int, block_k: int,
                     interpret: bool, qk_norm=None,
                     out_transposed: bool = False,
                     static_max: Optional[bool] = None,
                     pipeline_chunks: Optional[int] = None):
    """q/k: [B, S, H*D] flat; vt: [B, H*D, S] (pre-transposed V).
    Returns [B, S, H*D], or [B, H*D, S] when `out_transposed` (the
    accumulator's natural orientation: skips the in-kernel eye-matmul
    rotate; the caller's to_out contracts H*D so the transpose folds
    into that dot).  Inference-only (no VJP)."""
    b, s, hd = q.shape
    d = hd // heads
    hpb = max(1, LANES // d)                     # heads per 128-lane block
    assert heads % hpb == 0 and (hpb * d) % LANES == 0, (heads, d)
    assert vt.shape == (b, hd, s), vt.shape
    nq = pl.cdiv(s, block_q)
    nk = pl.cdiv(s, block_k)
    has_rope = rope is not None
    if static_max is None:
        static_max = qk_norm is not None

    mb = None
    if static_max:
        # provable logit bound (log2 units, matching the in-kernel fold):
        # LN output row y = z*g + b with ||z||_2 <= sqrt(d) (unit-RMS
        # standardized vector), so ||y||_2 <= max|g|*sqrt(d) + ||b||_2;
        # rope is a rotation (norm-preserving); |st| <= Bq*Bk*scale*log2e.
        assert qk_norm is not None, "static_max needs the fused QK-LN bound"
        gq, bq_, gk, bk_ = (a.astype(jnp.float32) for a in qk_norm)
        bound = lambda g, b_: (jnp.max(jnp.abs(g)) * (d ** 0.5)
                               + jnp.sqrt(jnp.sum(b_ * b_)))
        mb = (bound(gq, bq_) * bound(gk, bk_)
              * sm_scale * LOG2E).reshape(1, 1)

    if pipeline_chunks is None:
        # chip sweep (runs/chip_r5/flat_t_chunks*.log): the pipelined
        # (head, q-chunk) schedule never beats the plain one at the model
        # shape (nc=2: 43.9 ms vs nc=1: 43.1 at bk=1536; equal at bk=3072)
        # — Mosaic already overlaps the exp2 VPU pass with the next score
        # matmul.  Keep the schedule available for sweeps via env.
        pipeline_chunks = int(os.environ.get("BYA_FLAT_T_CHUNKS", "1"))
    # lane-slice alignment: each chunk's q-lane width must be a multiple of
    # 128 (and divide block_q); fall back to the unchunked schedule otherwise
    while pipeline_chunks > 1 and (block_q % pipeline_chunks
                                   or (block_q // pipeline_chunks) % 128):
        pipeline_chunks -= 1

    kernel = functools.partial(
        _fwd_flat_t_kernel, sm_scale=sm_scale, kv_len=kv_len,
        block_q=block_q, need_q_mask=kv_len < nq * block_q,
        out_transposed=out_transposed, static_max=static_max,
        block_k=block_k, num_kv_blocks=nk, need_mask=kv_len < nk * block_k,
        has_rope=has_rope, has_qk_norm=qk_norm is not None, dh=d, hpb=hpb,
        pipeline_chunks=pipeline_chunks)

    dpair = hpb * d
    qi = lambda b_, hp, iq, ik: (b_, iq, hp)
    ki = lambda b_, hp, iq, ik: (b_, ik, hp)
    vi = lambda b_, hp, iq, ik: (b_, hp, ik)
    rq = lambda b_, hp, iq, ik: (iq, 0)
    rk = lambda b_, hp, iq, ik: (ik, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, dpair), qi),
        pl.BlockSpec((1, block_k, dpair), ki),
        pl.BlockSpec((1, dpair, block_k), vi),
    ]
    inputs = [q, k, vt]
    if has_rope:
        # pad the tables to the GRID extent (not just S): a non-dividing
        # boundary block reads table rows past S, and undefined loads there
        # poison the whole block once the eye-matmul store (or the running
        # max) mixes columns — same hazard class as the ADVICE r4 q-row fix
        cos, sin = _pad_rope(rope, max(nq * block_q, nk * block_k))
        in_specs += [pl.BlockSpec((block_q, d), rq),
                     pl.BlockSpec((block_q, d), rq),
                     pl.BlockSpec((block_k, d), rk),
                     pl.BlockSpec((block_k, d), rk)]
        inputs += [cos, sin, cos, sin]
    if qk_norm is not None:
        aff_spec = pl.BlockSpec((1, d), lambda *idx: (0, 0))
        for a in qk_norm:   # (q_scale, q_bias, k_scale, k_bias), each [d]
            inputs.append(a.astype(jnp.float32).reshape(1, d))
            in_specs.append(aff_spec)
    if static_max:
        inputs.append(mb)
        in_specs.append(pl.BlockSpec((1, 1), lambda *idx: (0, 0)))

    scratch = [
        pltpu.VMEM((block_q, dpair), q.dtype),           # qc (LN+rope+scale)
        pltpu.VMEM((nk * block_k, dpair), k.dtype),      # kc (whole-seq K)
    ]
    if not static_max:
        scratch += [pltpu.VMEM((8, block_q), jnp.float32)] * hpb   # m rows
    scratch += [pltpu.VMEM((d + 1, block_q), jnp.float32)] * hpb   # acc|l

    if out_transposed:
        out_shape = jax.ShapeDtypeStruct((b, hd, s), q.dtype)
        out_spec = pl.BlockSpec((1, dpair, block_q),
                                lambda b_, hp, iq, ik: (b_, hp, iq))
    else:
        out_shape = jax.ShapeDtypeStruct((b, s, hd), q.dtype)
        out_spec = pl.BlockSpec((1, block_q, dpair), qi)
    # score tiles dominate VMEM: 2 heads x fp32 [bk, bq] (+ bf16 p) — give
    # large-block sweeps headroom (v5e has 128 MB; the in-model default
    # blocks stay within the 48 MB baseline)
    vmem = max(VMEM_LIMIT,
               min(100 * 1024 * 1024, 16 * hpb * block_q * block_k))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, heads // hpb, nq, nk),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(*inputs)


# --------------------------------------------------------------------------
# Pallas backward kernels (dkv and dq)
# --------------------------------------------------------------------------

def _dkv_kernel(*refs, sm_scale: float, kv_len: int, block_k: int,
                num_q_blocks: int, need_mask: bool, has_rope: bool,
                bshd: bool):
    if has_rope:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
         cq_ref, sq_ref, ck_ref, sk_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    iq = pl.program_id(3)
    ik = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = _tile(q_ref, bshd)
    k = _tile(k_ref, bshd)
    v = _tile(v_ref, bshd)
    do = _tile(do_ref, bshd)
    o = _tile(o_ref, bshd)
    lse = lse_ref[0, 0][:, :1]                     # [bq, 1]
    if has_rope:
        q = _rope_tile(q, cq_ref[...], sq_ref[...])
        k = _rope_tile(k, ck_ref[...], sk_ref[...])

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if need_mask:
        cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)                           # [bq, bk]

    # dv += p^T @ do  (contract over q rows)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # ds = p * (do @ v^T - delta), delta = rowsum(o * do)
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                    axis=-1, keepdims=True)        # [bq, 1]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * sm_scale               # [bq, bk]
    # dk_rot += ds^T @ q_rot
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == num_q_blocks - 1)
    def _store():
        dk = dk_acc[...]
        if has_rope:   # adjoint of the rotation: R^T = rope(cos, -sin)
            dk = _rope_tile(dk, ck_ref[...], -sk_ref[...])
        if bshd:
            dk_ref[0, :, 0, :] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, 0, :] = dv_acc[...].astype(dv_ref.dtype)
        else:
            dk_ref[0, 0] = dk.astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(*refs, sm_scale: float, kv_len: int, block_k: int,
               num_kv_blocks: int, need_mask: bool, has_rope: bool,
               bshd: bool):
    if has_rope:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
         cq_ref, sq_ref, ck_ref, sk_ref, dq_ref, dq_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, dq_acc) = refs
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = _tile(q_ref, bshd)
    k = _tile(k_ref, bshd)
    v = _tile(v_ref, bshd)
    do = _tile(do_ref, bshd)
    o = _tile(o_ref, bshd)
    lse = lse_ref[0, 0][:, :1]
    if has_rope:
        q = _rope_tile(q, cq_ref[...], sq_ref[...])
        k = _rope_tile(k, ck_ref[...], sk_ref[...])

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if need_mask:
        cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta) * sm_scale)
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == num_kv_blocks - 1)
    def _store():
        dq = dq_acc[...]
        if has_rope:
            dq = _rope_tile(dq, cq_ref[...], -sq_ref[...])
        if bshd:
            dq_ref[0, :, 0, :] = dq.astype(dq_ref.dtype)
        else:
            dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# --------------------------------------------------------------------------
# combined flat-layout backward: ONE kernel for dq/dk/dv
# --------------------------------------------------------------------------
#
# The two-kernel backward recomputes the score tile twice (7 matmuls per
# tile pair vs the minimal 5) and re-streams q/do/o from HBM nk times (dkv
# kernel) and k/v nq times (dq kernel).  This kernel keeps the WHOLE
# sequence resident in VMEM per (batch, head-pair) — flat [S_pad, 128]
# blocks have zero layout padding, so q+k+v+do for the 18,432-token joint
# shape cost 4 x 4.7 MB — and computes the score tile once, in TRANSPOSED
# layout st = k @ q^T so the per-q-row lse/delta stats broadcast along
# LANES ([1, bq] rows, no lane-padded column stats).  delta = rowsum(o*do)
# is precomputed in XLA, so o never enters the kernel.  dq accumulates in a
# full-sequence fp32 scratch across the outer ik sweep; dk/dv accumulate in
# [block_k, 128] scratch completed within each inner iq sweep.  Outputs
# store q.dtype directly: bf16 flat grads are 113 MB vs the 453 MB
# lane-padded fp32 [B,H,S,64->128] buffers the HBM dump blamed for the
# 18-layer single-chip training OOM (ROADMAP r3).

def _bwd_flat_kernel(*refs, sm_scale: float, kv_len: int, block_q: int,
                     block_k: int, num_q_blocks: int, num_kv_blocks: int,
                     need_mask: bool, has_rope: bool, dh: int, hpb: int,
                     bhsd: bool = False):
    refs = list(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref = refs[:6]
    refs = refs[6:]
    if has_rope:
        cos_ref, sin_ref = refs[:2]
        refs = refs[2:]
    dq_ref, dk_ref, dv_ref = refs[:3]
    scratch = refs[3:]
    qs = scratch[0]
    scratch = scratch[1:]
    if has_rope:
        kr = scratch[0]
        scratch = scratch[1:]
    dq_acc, dk_acc, dv_acc = scratch

    ik = pl.program_id(2)
    iq = pl.program_id(3)

    # VPU-trim scale folding: q is cached pre-multiplied by
    # sm_scale*log2(e), the lse row-stat arrives pre-multiplied by log2(e)
    # (see _bwd_flat_impl), so p^T = exp2(st - lse2) with NO per-tile
    # [bk, bq] multiplies (exp lowers to exp2+mul anyway).  The folds are
    # unwound at the cheap [rows, d] stores: dk *= 1/log2(e),
    # dq *= sm_scale.
    qscale = sm_scale * LOG2E

    def halves(x, fn):
        hs = [fn(x[:, h * dh:(h + 1) * dh], h) for h in range(hpb)]
        return jnp.concatenate(hs, axis=1) if hpb > 1 else hs[0]

    slq = pl.ds(iq * block_q, block_q)
    slk = pl.ds(ik * block_k, block_k)

    if bhsd:
        # whole-sequence input windows (dpair = dh keeps them small)
        rd = lambda ref, sl: ref[0, 0, sl, :]

        @pl.when((ik == 0) & (iq == 0))
        def _cache():
            # rotate+scale q / rotate k ONCE per (b, head-pair) — the
            # two-kernel path re-rotates every (ik, iq) tile pair.  The
            # qscale fold rides the fp32 rope tables (full precision).
            full = slice(None)
            if has_rope:
                qs[...] = halves(rd(q_ref, full), lambda x, _: _rope_tile(
                    x, cos_ref[...] * qscale, sin_ref[...] * qscale))
                kr[...] = halves(rd(k_ref, full), lambda x, _: _rope_tile(
                    x, cos_ref[...], sin_ref[...]))
            else:
                qs[...] = (rd(q_ref, full).astype(jnp.float32)
                           * qscale).astype(qs.dtype)

        kt = kr[slk, :] if has_rope else rd(k_ref, slk)  # [bk, hpb*dh]
        vt = rd(v_ref, slk)
        dot_ = rd(do_ref, slq)
    else:
        # flat (hpb=2, dpair=128): PER-BLOCK input windows — four
        # double-buffered whole-seq windows cost ~38 MB x2 and pushed the
        # kernel's scoped-VMEM stack to 120-126 MB (depth-14 blocker,
        # runs/chip_r5/depth14_flat2.log).  The q/k caches fill
        # incrementally instead: ik==0 sweeps every iq once (iq is the
        # inner grid dim), iq==0 visits every ik once.
        @pl.when(ik == 0)
        def _cache_q():
            qb = q_ref[0]                                # [bq, dpair]
            if has_rope:
                qb = halves(qb, lambda x, _: _rope_tile(
                    x, cos_ref[slq, :] * qscale, sin_ref[slq, :] * qscale))
                qs[slq, :] = qb
            else:
                qs[slq, :] = (qb.astype(jnp.float32)
                              * qscale).astype(qs.dtype)

        if has_rope:
            @pl.when(iq == 0)
            def _cache_k():
                kr[slk, :] = halves(k_ref[0], lambda x, _: _rope_tile(
                    x, cos_ref[slk, :], sin_ref[slk, :]))

        kt = kr[slk, :] if has_rope else k_ref[0]        # [bk, hpb*dh]
        vt = v_ref[0]
        dot_ = do_ref[0]
    qt = qs[slq, :]                                      # [bq, hpb*dh] scaled

    if need_mask:
        # kv-validity as a [bk, 1] penalty COLUMN broadcast-added to the
        # score tile: ONE VPU pass (vs iota+cmp+select = 3), and no
        # lax.cond — Mosaic's false branch copies the 4 MB tile (measured
        # +50 ms at the joint shape)
        pen = jnp.where(
            ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0) < kv_len,
            jnp.float32(0), jnp.float32(NEG_INF))

    dq_cs, dk_cs, dv_cs = [], [], []
    for h in range(hpb):
        sl = slice(h * dh, (h + 1) * dh)
        st = jax.lax.dot_general(kt[:, sl], qt[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if need_mask:
            st = st + pen
        pt = jnp.exp2(st - lse_ref[0, 0, h:h + 1, slq])  # [bk, bq] = p^T
        dpt = jax.lax.dot_general(vt[:, sl], dot_[:, sl],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dst = (pt * (dpt - dl_ref[0, 0, h:h + 1, slq])).astype(qt.dtype)
        ptc = pt.astype(dot_.dtype)
        dv_cs.append(jax.lax.dot_general(ptc, dot_[:, sl],
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32))
        dk_cs.append(jax.lax.dot_general(dst, qt[:, sl],
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32))
        dq_cs.append(jax.lax.dot_general(dst, kt[:, sl],
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32))
    cat = lambda xs: jnp.concatenate(xs, axis=1) if hpb > 1 else xs[0]
    dq_c, dk_c, dv_c = cat(dq_cs), cat(dk_cs), cat(dv_cs)

    @pl.when(ik == 0)
    def _dq_init():
        dq_acc[slq, :] = dq_c

    @pl.when(ik > 0)
    def _dq_accum():
        dq_acc[slq, :] += dq_c

    @pl.when(iq == 0)
    def _dkv_init():
        dk_acc[...] = dk_c
        dv_acc[...] = dv_c

    @pl.when(iq > 0)
    def _dkv_accum():
        dk_acc[...] += dk_c
        dv_acc[...] += dv_c

    @pl.when(ik == num_kv_blocks - 1)      # last visit of this q slice
    def _store_dq():
        g = dq_acc[slq, :] * sm_scale       # unwind the dst' fold
        if has_rope:                        # adjoint rotation R^T
            g = halves(g, lambda x, _: _rope_tile(
                x, cos_ref[slq, :], -sin_ref[slq, :]))
        if bhsd:
            dq_ref[0, 0, slq, :] = g.astype(dq_ref.dtype)
        else:
            dq_ref[0] = g.astype(dq_ref.dtype)   # per-iq output block

    @pl.when(iq == num_q_blocks - 1)       # kv slice complete
    def _store_dkv():
        g = dk_acc[...] * (1.0 / LOG2E)     # unwind the q-cache log2e fold
        if has_rope:
            g = halves(g, lambda x, _: _rope_tile(
                x, cos_ref[slk, :], -sin_ref[slk, :]))
        if bhsd:
            dk_ref[0, 0] = g.astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)
        else:
            dk_ref[0] = g.astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_flat_impl(q, k, v, do, lse_c, delta_c, heads: int, rope,
                   sm_scale: float, kv_len: int, block_q: int, block_k: int,
                   interpret: bool, bhsd: bool = False):
    """Combined-kernel backward on flat [B, S, H*D] tensors — or, with
    `bhsd`, on [B, H, S, D] tensors (one head per grid cell, hpb = 1; the
    production training layout, since Mosaic can't block the head dim of
    [B,S,H,D]).

    lse_c / delta_c: [B, H//hpb, hpb, S_pad] fp32, compact minor-S layout
    (the fwd's [B,H,S,128] lane-broadcast lse residual costs 453 MB at the
    joint shape; this is 3.5 MB).  Returns (dq, dk, dv) in q.dtype.
    """
    if bhsd:
        b, heads, s, d = q.shape
        hpb = 1
        dpair = d
    else:
        b, s, hd = q.shape
        d = hd // heads
        hpb = max(1, LANES // d)
        assert heads % hpb == 0 and (hpb * d) % LANES == 0, (heads, d)
        dpair = hpb * d
    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        ax = 2 if bhsd else 1
        pad = [(0, 0)] * q.ndim
        pad[ax] = (0, s_pad - s)
        q, k, v, do = (jnp.pad(x, pad) for x in (q, k, v, do))
    assert lse_c.shape == (b, heads // hpb, hpb, s_pad), lse_c.shape
    nq = s_pad // block_q
    nk = s_pad // block_k
    need_mask = kv_len < s_pad
    has_rope = rope is not None

    if bhsd:
        full_spec = pl.BlockSpec((1, 1, s_pad, d),
                                 lambda b_, hp, ik, iq: (b_, hp, 0, 0))
        kv_spec = pl.BlockSpec((1, 1, block_k, d),
                               lambda b_, hp, ik, iq: (b_, hp, ik, 0))
        out_shape = (b, heads, s_pad, d)
        in_specs_qkvdo = [full_spec] * 4
        dq_spec = full_spec
    else:
        # per-block IO windows (the whole-seq windows double-buffer to
        # ~38 MB x2 and blew the 128 MB scoped-VMEM stack at dpair=128 —
        # runs/chip_r5/depth14_flat2.log); q/do stream per iq, k/v per ik
        q_spec = pl.BlockSpec((1, block_q, dpair),
                              lambda b_, hp, ik, iq: (b_, iq, hp))
        kv_spec = pl.BlockSpec((1, block_k, dpair),
                               lambda b_, hp, ik, iq: (b_, ik, hp))
        out_shape = (b, s_pad, heads * d)
        in_specs_qkvdo = [q_spec, kv_spec, kv_spec, q_spec]
        dq_spec = q_spec
    row_spec = pl.BlockSpec((1, 1, hpb, s_pad),
                            lambda b_, hp, ik, iq: (b_, hp, 0, 0))

    in_specs = in_specs_qkvdo + [row_spec, row_spec]
    # exp2 fold: lse pre-multiplied by log2(e) so the kernel's p^T needs no
    # per-tile multiply.  Clamp first: the padded-row fill is -NEG_INF
    # (+3.4e38) and *LOG2E would overflow fp32 to +inf — exp2(finite - inf)
    # is still 0, but any future padded-stat arithmetic (inf - inf) would
    # silently NaN (ADVICE r4 low), so keep the fill finite-huge instead.
    inputs = [q, k, v, do,
              jnp.minimum(lse_c, -NEG_INF / LOG2E) * LOG2E, delta_c]
    scratch = [pltpu.VMEM((s_pad, dpair), q.dtype)]            # qs (scaled q)
    if has_rope:
        cos, sin = _pad_rope(rope, s_pad)
        rspec = pl.BlockSpec((s_pad, d), lambda *_: (0, 0))
        in_specs += [rspec, rspec]
        inputs += [cos, sin]
        scratch += [pltpu.VMEM((s_pad, dpair), q.dtype)]       # kr
    scratch += [pltpu.VMEM((s_pad, dpair), jnp.float32),       # dq acc
                pltpu.VMEM((block_k, dpair), jnp.float32),     # dk acc
                pltpu.VMEM((block_k, dpair), jnp.float32)]     # dv acc

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_flat_kernel, sm_scale=sm_scale, kv_len=kv_len,
                          block_q=block_q, block_k=block_k,
                          num_q_blocks=nq, num_kv_blocks=nk,
                          need_mask=need_mask, has_rope=has_rope,
                          dh=d, hpb=hpb, bhsd=bhsd),
        out_shape=[jax.ShapeDtypeStruct(out_shape, q.dtype)] * 3,
        grid=(b, heads // hpb, nk, nq),
        in_specs=in_specs,
        out_specs=[dq_spec, kv_spec, kv_spec],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary", "arbitrary"),
            # flat (hpb=2) scratch is 2x wider than bhsd; a 112M allowance
            # left only 16M for the surrounding fusion's buffers and the
            # depth-14 step OOM'd VMEM by 7M (runs/chip_r5/depth14_flat.log)
            vmem_limit_bytes=(100 if not bhsd else 112) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if s_pad != s:
        if bhsd:
            dq, dk, dv = dq[:, :, :s], dk[:, :, :s], dv[:, :, :s]
        else:
            dq, dk, dv = dq[:, :s], dk[:, :s], dv[:, :s]
    return dq, dk, dv


def _repack_rows(x, heads: int, hpb: int, s_pad: int, fill: float):
    """[B, H, S'] fp32 -> [B, H//hpb, hpb, S_pad] (pad tail rows with
    `fill`), the compact row-stat layout the combined kernel wants."""
    b, h, sl = x.shape
    if sl < s_pad:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, s_pad - sl)],
                    constant_values=fill)
    else:
        x = x[:, :, :s_pad]
    return x.reshape(b, h // hpb, hpb, s_pad)


def _bwd_impl(q, k, v, o, lse, do, rope, sm_scale: float, kv_len: int,
              block_q: int, block_k: int, interpret: bool,
              bshd: bool = False):
    if bshd:
        b, s, h, d = q.shape
    else:
        b, h, s, d = q.shape
    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        q, k, v, o, do = _pad_seq((q, k, v, o, do), s_pad, bshd)
        # lse already padded to s_pad by the forward
    nq = s_pad // block_q
    nk = s_pad // block_k
    need_mask = kv_len < s_pad
    has_rope = rope is not None
    if has_rope:
        cos, sin = _pad_rope(rope, s_pad)
    grad_shape = (b, s_pad, h, d) if bshd else (b, h, s_pad, d)

    q_spec_kv, kv_spec_kv, lse_spec_kv, rq_kv, rk_kv = _specs(
        block_q, block_k, d, bshd, kv_grid_order=True)
    in_specs_kv = [q_spec_kv, kv_spec_kv, kv_spec_kv, q_spec_kv, q_spec_kv,
                   lse_spec_kv]
    inputs_kv = [q, k, v, do, o, lse]
    if has_rope:
        in_specs_kv += [rq_kv, rq_kv, rk_kv, rk_kv]
        inputs_kv += [cos, sin, cos, sin]

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, kv_len=kv_len,
                          block_k=block_k, num_q_blocks=nq,
                          need_mask=need_mask, has_rope=has_rope, bshd=bshd),
        out_shape=[jax.ShapeDtypeStruct(grad_shape, jnp.float32)] * 2,
        grid=(b, h, nk, nq),
        in_specs=in_specs_kv,
        out_specs=[kv_spec_kv, kv_spec_kv],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*inputs_kv)

    q_spec_q, kv_spec_q, lse_spec_q, rq_q, rk_q = _specs(
        block_q, block_k, d, bshd)
    in_specs_q = [q_spec_q, kv_spec_q, kv_spec_q, q_spec_q, q_spec_q, lse_spec_q]
    inputs_q = [q, k, v, do, o, lse]
    if has_rope:
        in_specs_q += [rq_q, rq_q, rk_q, rk_q]
        inputs_q += [cos, sin, cos, sin]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, kv_len=kv_len,
                          block_k=block_k, num_kv_blocks=nk,
                          need_mask=need_mask, has_rope=has_rope, bshd=bshd),
        out_shape=jax.ShapeDtypeStruct(grad_shape, jnp.float32),
        grid=(b, h, nq, nk),
        in_specs=in_specs_q,
        out_specs=q_spec_q,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*inputs_q)

    clip = (lambda x: x[:, :s]) if bshd else (lambda x: x[:, :, :s, :])
    return (clip(dq).astype(q.dtype), clip(dk).astype(k.dtype),
            clip(dv).astype(v.dtype))


# --------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, Pallas backward
# --------------------------------------------------------------------------

def _xla_fwd(q, k, v, sm_scale, kv_len):
    from .attention import sdpa

    return sdpa(q, k, v, scale=sm_scale, kv_len=kv_len)


def _chunked_bwd(q, k, v, o, do, sm_scale: float, kv_len: int, block_q: int = 1024):
    """Flash-style backward by q-block recompute (fp32), scanned over q blocks.

    Reference/debug path (no rope); never materialises more than
    [block_q, S] scores per (B,H) slice.
    """
    b, h, s, d = q.shape
    s_pad = _round_up(s, block_q)
    padq = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
    qf = jnp.pad(q, padq).astype(jnp.float32)
    of = jnp.pad(o, padq).astype(jnp.float32)
    dof = jnp.pad(do, padq).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    kv_mask = (jnp.arange(s) < kv_len) if kv_len < s else None

    nq = s_pad // block_q
    qf = qf.reshape(b, h, nq, block_q, d)
    of = of.reshape(b, h, nq, block_q, d)
    dof = dof.reshape(b, h, nq, block_q, d)

    def per_qblock(qb, ob, dob, kbh, vbh):
        sblk = jnp.einsum("qd,kd->qk", qb, kbh) * sm_scale
        if kv_mask is not None:
            sblk = jnp.where(kv_mask, sblk, NEG_INF)
        p = jax.nn.softmax(sblk, axis=-1)
        dp = jnp.einsum("qd,kd->qk", dob, vbh)
        delta = jnp.sum(ob * dob, axis=-1, keepdims=True)
        ds = p * (dp - delta) * sm_scale
        dq = jnp.einsum("qk,kd->qd", ds, kbh)
        dk = jnp.einsum("qk,qd->kd", ds, qb)
        dv = jnp.einsum("qk,qd->kd", p, dob)
        return dq, dk, dv

    def per_bh(args):
        qbh, obh, dobh, kbh, vbh = args

        def scan_body(carry, xs):
            dk_acc, dv_acc = carry
            qb, ob, dob = xs
            dq, dk, dv = per_qblock(qb, ob, dob, kbh, vbh)
            return (dk_acc + dk, dv_acc + dv), dq

        (dk, dv), dq = jax.lax.scan(
            scan_body,
            (jnp.zeros_like(kbh), jnp.zeros_like(vbh)),
            (qbh, obh, dobh),
        )
        return dq.reshape(s_pad, d), dk, dv

    flat = lambda x: x.reshape((b * h,) + x.shape[2:])
    dq, dk, dv = jax.lax.map(per_bh, (flat(qf), flat(of), flat(dof), flat(kf), flat(vf)))
    dq = dq.reshape(b, h, s_pad, d)[:, :, :s, :]
    dk = dk.reshape(b, h, s, d)
    dv = dv.reshape(b, h, s, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# swept on v5e at the DiT joint shape (S=18432, H=48, D=64), fwd+dkv+dq:
# 1024/1024 = 176 ms vs 512/512 = 201 ms (-12%); 2048/512 ties at 177
BWD_BLOCK_Q = 1024
BWD_BLOCK_K = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, cos, sin, sm_scale, kv_len, block_q, block_k, interpret,
           bshd=False):
    rope = None if cos is None else (cos, sin)
    return _fwd_impl(q, k, v, rope, sm_scale, kv_len, block_q, block_k,
                     interpret, bshd=bshd)


# route the backward through the combined single-pass kernel (A/B flag —
# the two-kernel path stays for comparison sweeps and odd head dims)
COMBINED_BWD = True


def _combined_ok(d: int, h: int, bshd: bool) -> bool:
    if not COMBINED_BWD or d % 8:
        return False
    if bshd:   # flattened [B,S,H*D] route: heads must pack into 128 lanes
        hpb = max(1, LANES // d)
        return (hpb * d) % LANES == 0 and h % hpb == 0
    return True


def _flash_fwd(q, k, v, cos, sin, sm_scale, kv_len, block_q, block_k,
               interpret, bshd=False):
    # smaller blocks when saving residuals: the lse output block + scores
    # tile exceed scoped VMEM at block_q=2048
    bq = min(block_q, 1024)
    bk = min(block_k, 1024)
    rope = None if cos is None else (cos, sin)
    d = q.shape[-1]
    h = q.shape[2] if bshd else q.shape[1]
    o, lse = _fwd_impl(q, k, v, rope, sm_scale, kv_len, bq, bk, interpret,
                       save_residuals=True, bshd=bshd,
                       lse_compact=_combined_ok(d, h, bshd))
    return o, (q, k, v, o, lse, cos, sin)


def _flash_bwd(sm_scale, kv_len, block_q, block_k, interpret, bshd, res, do):
    q, k, v, o, lse, cos, sin = res
    rope = None if cos is None else (cos, sin)
    bq = min(BWD_BLOCK_Q, block_q)
    bk = min(BWD_BLOCK_K, block_k)
    s = q.shape[1] if bshd else q.shape[2]
    s_pad = _round_up(s, max(bq, bk))
    d = q.shape[-1]
    h = q.shape[2] if bshd else q.shape[1]
    if _combined_ok(d, h, bshd):
        # lse arrives COMPACT ([B, H, 1, S] — _flash_fwd saved it that way
        # under the same predicate); delta precomputed in XLA, combined
        # single-pass kernel, bf16 grads
        b = q.shape[0]
        hpb = max(1, LANES // d) if bshd else 1
        lse_c = _repack_rows(lse[:, :, 0, :], h, hpb, s_pad, -NEG_INF)
        if bshd:
            # flatten [B,S,H,D] -> [B,S,H*D] (drops the 64->128 lane pad)
            flat = lambda x: x.reshape(b, s, h * d)
            delta = jnp.einsum("bshd,bshd->bhs", o.astype(jnp.float32),
                               do.astype(jnp.float32))
            delta_c = _repack_rows(delta, h, hpb, s_pad, 0.0)
            dq, dk, dv = _bwd_flat_impl(
                flat(q), flat(k), flat(v), flat(do), lse_c, delta_c, h, rope,
                sm_scale, kv_len, bq, bk, interpret)
            unflat = lambda g: g.reshape(b, s, h, d)
            dq, dk, dv = unflat(dq), unflat(dk), unflat(dv)
        else:
            delta = jnp.einsum("bhsd,bhsd->bhs", o.astype(jnp.float32),
                               do.astype(jnp.float32))
            delta_c = _repack_rows(delta, h, 1, s_pad, 0.0)
            dq, dk, dv = _bwd_flat_impl(
                q, k, v, do, lse_c, delta_c, h, rope,
                sm_scale, kv_len, bq, bk, interpret, bhsd=True)
    else:
        # forward padded lse to the bwd padding granularity
        if lse.shape[2] < s_pad:   # fwd used larger blocks -> lse longer
            lse = jnp.pad(lse,
                          [(0, 0), (0, 0), (0, s_pad - lse.shape[2]), (0, 0)],
                          constant_values=-NEG_INF)
        dq, dk, dv = _bwd_impl(q, k, v, o, lse[:, :, :s_pad], do, rope,
                               sm_scale, kv_len, bq, bk, interpret, bshd=bshd)
    dcos = None if cos is None else jnp.zeros_like(cos)
    dsin = None if sin is None else jnp.zeros_like(sin)
    return dq, dk, dv, dcos, dsin


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_flat(q, k, v, cos, sin, heads, sm_scale, kv_len, block_q,
                block_k, interpret):
    """Differentiable flat-layout flash (optional in-kernel rope; no fused
    LN): forward is the flat kernel (saving the compact LSE residual);
    backward is the combined flat dq/dk/dv kernel.  Keeping q/k/v in
    [B, S, H*D] end to end means the residuals are the projections
    themselves — no [B,H,S,D] transposed copies in the backward's live set
    (the depth-14 single-chip HBM limiter, runs/chip_r5/depth14.log)."""
    rope = None if cos is None else (cos, sin)
    return _fwd_flat_impl(q, k, v, heads, rope, sm_scale, kv_len,
                          block_q, block_k, interpret)


def _flash_flat_fwd(q, k, v, cos, sin, heads, sm_scale, kv_len, block_q,
                    block_k, interpret):
    bq = min(block_q, 1024)    # lse output + eye transpose cost VMEM
    bk = min(block_k, 1024)
    rope = None if cos is None else (cos, sin)
    o, lse = _fwd_flat_impl(q, k, v, heads, rope, sm_scale, kv_len,
                            bq, bk, interpret, save_residuals=True)
    return o, (q, k, v, o, lse, cos, sin)


def _flash_flat_bwd(heads, sm_scale, kv_len, block_q, block_k, interpret,
                    res, do):
    q, k, v, o, lse, cos, sin = res
    b, s, hd = q.shape
    d = hd // heads
    bq = min(block_q, BWD_BLOCK_Q)
    bk = min(block_k, BWD_BLOCK_K)
    s_pad = _round_up(s, max(bq, bk))
    # delta = rowsum(o * do) per head, computed in XLA (o stays out of the
    # backward kernel); [B, S, heads] -> compact [B, H//hpb, hpb, S_pad]
    delta = (o.astype(jnp.float32) * do.astype(jnp.float32)
             ).reshape(b, s, heads, d).sum(-1).transpose(0, 2, 1)
    hpb = max(1, LANES // d)
    delta_c = _repack_rows(delta, heads, hpb, s_pad, 0.0)
    lse_c = jnp.pad(lse, [(0, 0), (0, 0), (0, 0), (0, s_pad - s)],
                    constant_values=-NEG_INF)   # fwd emits the compact layout
    rope = None if cos is None else (cos, sin)
    dq, dk, dv = _bwd_flat_impl(q, k, v, do, lse_c, delta_c, heads, rope,
                                sm_scale, kv_len, bq, bk, interpret)
    # the tables are constants — zero cotangents
    dcos = None if cos is None else jnp.zeros_like(cos)
    dsin = None if sin is None else jnp.zeros_like(sin)
    return (dq, dk, dv, dcos, dsin)


_flash_flat.defvjp(_flash_flat_fwd, _flash_flat_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    rope_start: int = 0,
    block_q: int = 1536,   # swept on v5e (tools/kernel_bench.py): 57-59
    block_k: int = 1536,   # TF/s bf16 @ S=18432, D=64, with/without rope
    interpret: Optional[bool] = None,
    layout: str = "bhsd",
    qk_norm: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, jnp.ndarray]] = None,
    heads: Optional[int] = None,
    v_transposed: bool = False,
    out_transposed: bool = False,
) -> jnp.ndarray:
    """Flash attention (self-attention, non-causal).

    `layout`: "bhsd" ([B, H, S, D]) or "bshd" ([B, S, H, D]).  bshd lets the
    kernel read the qkv projections' natural layout directly — no [B,H,S,D]
    transpose is ever materialised in HBM (the transposed fp32 copies cost
    ~1.3 GB/step at 17,776 tokens).  `kv_len`: number of valid kv positions
    (defaults to S); trailing positions are masked.  `rope=(cos, sin)`
    ([<= S - rope_start, D] tables) applies rotate-half RoPE to q/k inside
    the kernel; positions before `rope_start` (text tokens) and after the
    table (padding) are left unrotated.  On non-TPU backends falls back to
    rotating in XLA + SDPA.

    `qk_norm=(q_scale, q_bias, k_scale, k_bias)` ([D] each) fuses the
    per-head QK LayerNorm (eps 1e-6, fp32 stats) into the kernel BEFORE
    rope — inference-path only (the fused call bypasses the custom_vjp;
    training applies the LN outside).
    """
    if layout == "flat":
        # [B, S, H*D] end to end: no [B,S,H,D] (lane-padded) or [B,H,S,D]
        # (transposed) arrays ever hit HBM; LN/RoPE run in-kernel.
        # Inference-only (no custom_vjp on this path).
        # `v_transposed`: v arrives as [B, H*D, S] (the to_v matmul can emit
        # that layout for free) and the transposed-PV kernel runs both its
        # matmuls at full MXU width — see _fwd_flat_t_kernel.
        assert heads is not None, "layout='flat' requires heads"
        b, s, hd = q.shape
        d = hd // heads
        if scale is None:
            scale = d ** -0.5
        if kv_len is None:
            kv_len = s
        cos = sin = None
        if rope is not None:
            cos_v, sin_v = rope
            tail = s - rope_start - cos_v.shape[0]
            cos = jnp.concatenate(
                [jnp.ones((rope_start, d), jnp.float32),
                 cos_v.astype(jnp.float32),
                 jnp.ones((tail, d), jnp.float32)])
            sin = jnp.concatenate(
                [jnp.zeros((rope_start, d), jnp.float32),
                 sin_v.astype(jnp.float32),
                 jnp.zeros((tail, d), jnp.float32)])
        on_tpu = jax.devices()[0].platform == "tpu"
        if interpret is None and not on_tpu:
            # XLA fallback (CPU test meshes): reshape to bhsd, reuse the
            # fallback path below via a recursive call
            if v_transposed:
                v = jnp.swapaxes(v, 1, 2)
            qb = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
            kb = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
            vb = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
            out = flash_attention(qb, kb, vb, scale=scale, kv_len=kv_len,
                                  rope=rope, rope_start=rope_start,
                                  layout="bhsd", qk_norm=qk_norm)
            out = out.transpose(0, 2, 1, 3).reshape(b, s, hd)
            return jnp.swapaxes(out, 1, 2) if out_transposed else out
        s128 = _round_up(s, 128)
        bq = min(block_q, 1536 if cos is not None else block_q, s128)
        bk = min(block_k, 1536 if cos is not None else block_k, s128)
        if bq % bk:
            bk = bq
        if (v_transposed and cos is not None and bq == 1536
                and block_k >= 1536 and s128 % 3072 == 0):
            # transposed-PV sweep optimum (runs/chip_r5/flat_t_chunks.log):
            # bk=3072 is 42.8 ms / 90.8 TF/s vs 43.1 at 1536 — the flat_t
            # kernel's VMEM footprint (stats as [1,bq] lane rows, no alpha
            # rescale buffers under static-max) leaves room for the wider
            # kv tile that the regular flat kernel's rope cap does not.
            bk = 3072
        rope_t = None if cos is None else (cos, sin)
        if v_transposed:
            return _fwd_flat_t_impl(q, k, v, heads, rope_t, float(scale),
                                    int(kv_len), int(bq), int(bk),
                                    bool(interpret), qk_norm=qk_norm,
                                    out_transposed=out_transposed)
        if qk_norm is None:
            # differentiable flat attention (router STAB spatial; DiT
            # training with rope, LN applied outside): forward is the flat
            # kernel, backward the combined flat dq/dk/dv kernel — q/k/v
            # residuals stay [B, S, H*D] (no bhsd copies in the backward)
            return _flash_flat(q, k, v, cos, sin, heads, float(scale),
                               int(kv_len), int(bq), int(bk),
                               bool(interpret))
        return _fwd_flat_impl(q, k, v, heads, rope_t, float(scale),
                              int(kv_len), int(bq), int(bk),
                              bool(interpret), qk_norm=qk_norm)

    bshd = layout == "bshd"
    if bshd:
        b, s, h, d = q.shape
    else:
        b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = s
    # short sequences: shrink blocks to the lane-rounded length so the pad
    # copy + in-kernel waste drop from (block - s)/s to <128/s (e.g. the
    # router STAB's S=1350 spatial attention: 13.8% -> 4.3%)
    block_q = min(block_q, _round_up(s, LANES))
    block_k = min(block_k, _round_up(s, LANES))

    cos = sin = None
    if rope is not None:
        cos_v, sin_v = rope
        tail = s - rope_start - cos_v.shape[0]   # caller-padded rows: identity
        if tail < 0:
            raise ValueError(f"rope table rows {cos_v.shape[0]} > "
                             f"{s} - rope_start {rope_start}")
        cos = jnp.concatenate(
            [jnp.ones((rope_start, d), jnp.float32), cos_v.astype(jnp.float32),
             jnp.ones((tail, d), jnp.float32)])
        sin = jnp.concatenate(
            [jnp.zeros((rope_start, d), jnp.float32), sin_v.astype(jnp.float32),
             jnp.zeros((tail, d), jnp.float32)])

    on_tpu = jax.devices()[0].platform == "tpu"
    if interpret is None and not on_tpu:
        if bshd:
            q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        if qk_norm is not None:
            qs_, qb_, ks_, kb_ = (a.astype(jnp.float32) for a in qk_norm)

            def _ln(x, sc, bi):
                xf = x.astype(jnp.float32)
                mu = xf.mean(-1, keepdims=True)
                c_ = xf - mu
                var = (c_ * c_).mean(-1, keepdims=True)
                return ((c_ * jax.lax.rsqrt(var + 1e-6)) * sc + bi).astype(x.dtype)

            q = _ln(q, qs_, qb_)
            k = _ln(k, ks_, kb_)
        if cos is not None:
            from .rope import apply_rotary_emb

            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        out = _xla_fwd(q, k, v, scale, kv_len if kv_len < s else None)
        return out.transpose(0, 2, 1, 3) if bshd else out
    if interpret is None:
        interpret = False

    s128 = _round_up(s, 128)
    if cos is not None:
        # the rope cos/sin tiles + double buffering exceed scoped VMEM at
        # block 2048 (21.7M > 16M, measured); 1536/1536 is the sweep optimum
        block_q = min(block_q, 1536)
        block_k = min(block_k, 1536)
    block_q = min(block_q, s128)
    block_k = min(block_k, s128)
    if block_q % block_k:
        # grid is exact only when the padded length divides into both block
        # sizes; for odd lengths (e.g. the router's 1350-token spatial attn
        # -> 1408) fall back to a single kv block
        block_k = block_q

    if qk_norm is not None:
        # fused QK-LN path: plain pallas call, no custom_vjp (inference)
        rope_t = None if cos is None else (cos, sin)
        if bshd and not interpret:
            q, k, v = jax.lax.optimization_barrier((q, k, v))
            q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
            out = _fwd_impl(q, k, v, rope_t, float(scale), int(kv_len),
                            int(block_q), int(block_k), interpret,
                            bshd=False, qk_norm=qk_norm)
            return out.transpose(0, 2, 1, 3)
        return _fwd_impl(q, k, v, rope_t, float(scale), int(kv_len),
                         int(block_q), int(block_k), interpret, bshd=bshd,
                         qk_norm=qk_norm)
    if bshd and not interpret:
        # Mosaic can't block the head dim of [B,S,H,D] (second-to-last block
        # dims must be 8-divisible); transpose to [B,H,S,D] for the kernel.
        # The barrier pins the bf16 materialisation first — otherwise XLA
        # hoists the fp32->bf16 convert past the transpose and the copies
        # land in fp32 (2x HBM, measured 864 MB/step).
        q, k, v = jax.lax.optimization_barrier((q, k, v))
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        out = _flash(q, k, v, cos, sin, float(scale), int(kv_len),
                     int(block_q), int(block_k), interpret, False)
        return out.transpose(0, 2, 1, 3)
    return _flash(q, k, v, cos, sin, float(scale), int(kv_len),
                  int(block_q), int(block_k), interpret, bshd)
