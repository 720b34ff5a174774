"""Attention ops: XLA reference SDPA + dispatch to the Pallas flash kernel.

The DiT's joint text+video self-attention (17,776 tokens x 42 layers, the #1
hot spot per SURVEY.md §3.3) goes through `attention()`, which dispatches to
the Pallas TPU flash kernel (`flash_attention.py`) or the XLA fallback (used
on CPU test meshes and for tiny shapes).

Replaces torch `F.scaled_dot_product_attention` /
`CogVideoXAttnProcessor2_0` (reference `models/transformer.py:200-208`) and
xformers `memory_efficient_attention` (`eva_clip/eva_vit_model.py:203-216`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Reference scaled-dot-product attention, fp32 softmax.

    q: [..., Sq, D], k/v: [..., Skv, D].  `kv_len` masks trailing padded
    kv positions (static int).
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if kv_len is not None and kv_len < k.shape[-2]:
        mask = jnp.arange(k.shape[-2]) < kv_len
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min * 0.7)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p.astype(v.dtype), v)


# XLA fallback switches to the q-block-chunked path when the full score
# tensor would exceed this (bytes).  Keeps full-sequence runs feasible on
# CPU test hosts (48 heads x 17,776^2 fp32 scores = 121 GB with plain SDPA).
CHUNKED_SDPA_BYTES = 2 << 30


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sdpa_chunked_core(q, k, v, scale: float, kv_len: int, block_q: int):
    return _sdpa_chunked_fwd_impl(q, k, v, scale, kv_len, block_q)


def _sdpa_chunked_fwd_impl(q, k, v, scale, kv_len, block_q):
    """[B,H,S,D] fp32-softmax attention, scores materialised only
    [block_q, Skv] per (b, h) slice (lax.map over b*h, scan over q blocks)."""
    b, h, s, d = q.shape
    skv = k.shape[2]
    s_pad = -(-s // block_q) * block_q
    qf = jnp.pad(q, [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]).astype(jnp.float32)
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    nq = s_pad // block_q
    qf = qf.reshape(b * h, nq, block_q, d)
    kv_mask = (jnp.arange(skv) < kv_len) if kv_len < skv else None

    def per_bh(args):
        qbh, kbh, vbh = args

        def body(_, qb):
            sblk = jnp.einsum("qd,kd->qk", qb, kbh) * scale
            if kv_mask is not None:
                sblk = jnp.where(kv_mask, sblk,
                                 jnp.finfo(jnp.float32).min * 0.7)
            p = jax.nn.softmax(sblk, axis=-1)
            return None, jnp.einsum("qk,kd->qd", p, vbh)

        _, ob = jax.lax.scan(body, None, qbh)
        return ob.reshape(s_pad, d)

    flat = lambda x: x.reshape((b * h,) + x.shape[2:])
    o = jax.lax.map(per_bh, (qf, flat(kf), flat(vf)))
    return o.reshape(b, h, s_pad, d)[:, :, :s, :].astype(v.dtype)


def _sdpa_chunked_vjp_fwd(q, k, v, scale, kv_len, block_q):
    o = _sdpa_chunked_fwd_impl(q, k, v, scale, kv_len, block_q)
    return o, (q, k, v, o)


def _sdpa_chunked_vjp_bwd(scale, kv_len, block_q, res, do):
    from .flash_attention import _chunked_bwd

    q, k, v, o = res
    dq, dk, dv = _chunked_bwd(q, k, v, o, do, scale, kv_len,
                              block_q=block_q)
    return dq, dk, dv


_sdpa_chunked_core.defvjp(_sdpa_chunked_vjp_fwd, _sdpa_chunked_vjp_bwd)


def sdpa_chunked(q, k, v, scale=None, kv_len=None, block_q: int = 1024):
    """Memory-bounded SDPA ([B,H,S,D]); exact (per-q-block full-row
    softmax, no online accumulation)."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = k.shape[-2]
    return _sdpa_chunked_core(q, k, v, float(scale), int(kv_len),
                              int(block_q))


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: bool = True,
    kv_len: Optional[int] = None,
    rope=None,
    rope_start: int = 0,
    layout: str = "bhsd",
    qk_norm=None,
    heads=None,
    v_transposed: bool = False,
    out_transposed: bool = False,
) -> jnp.ndarray:
    """Self/cross attention over [B, H, S, D], [B, S, H, D], or flat
    [B, S, H*D] (`layout="flat"`, pass `heads`) tensors.

    Dispatches to the Pallas flash kernel when `use_flash` and the shape is
    worth it (long sequences on TPU); otherwise XLA SDPA.  `rope`/`rope_start`
    fuse the rotary embedding into the kernel (or apply it here on the
    fallback path); `qk_norm` fuses the per-head QK LayerNorm — see
    `flash_attention`.
    """
    seq_axis = 2 if layout == "bhsd" else 1
    if (use_flash and q.shape[seq_axis] >= 1024
            and q.shape[seq_axis] == k.shape[seq_axis]):
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, kv_len=kv_len,
                               rope=rope, rope_start=rope_start, layout=layout,
                               qk_norm=qk_norm, heads=heads,
                               v_transposed=v_transposed,
                               out_transposed=out_transposed)
    if v_transposed:          # SDPA fallback: restore [B, S, H*D]
        v = jnp.swapaxes(v, 1, 2)
    if layout == "flat":
        b, s, hd = q.shape
        d = hd // heads
        split = lambda x: x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        out = attention(split(q), split(k), split(v), scale=scale,
                        use_flash=False, kv_len=kv_len, rope=rope,
                        rope_start=rope_start, layout="bhsd", qk_norm=qk_norm)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, hd)
        return jnp.swapaxes(out, 1, 2) if out_transposed else out
    if layout == "bshd":
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    if qk_norm is not None:
        qs_, qb_, ks_, kb_ = (a.astype(jnp.float32) for a in qk_norm)

        def _ln(x, sc, bi):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            c = xf - mu
            var = (c * c).mean(-1, keepdims=True)
            return ((c * jax.lax.rsqrt(var + 1e-6)) * sc + bi).astype(x.dtype)

        q = _ln(q, qs_, qb_)
        k = _ln(k, ks_, kb_)
    if rope is not None:
        from .rope import apply_rotary_emb

        cos, sin = rope
        end = rope_start + cos.shape[0]   # rows past the table: caller padding
        rot = lambda x: jnp.concatenate(
            [x[..., :rope_start, :],
             apply_rotary_emb(x[..., rope_start:end, :], cos, sin),
             x[..., end:, :]], axis=-2)
        q, k = rot(q), rot(k)
    score_bytes = 4 * q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    if score_bytes > CHUNKED_SDPA_BYTES and q.shape[2] == k.shape[2]:
        out = sdpa_chunked(q, k, v, scale=scale, kv_len=kv_len)
    else:
        out = sdpa(q, k, v, scale=scale, kv_len=kv_len)
    return out.transpose(0, 2, 1, 3) if layout == "bshd" else out
