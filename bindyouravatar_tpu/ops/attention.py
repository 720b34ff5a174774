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
                               qk_norm=qk_norm, heads=heads)
    if layout == "flat":
        b, s, hd = q.shape
        d = hd // heads
        split = lambda x: x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        out = attention(split(q), split(k), split(v), scale=scale,
                        use_flash=False, kv_len=kv_len, rope=rope,
                        rope_start=rope_start, layout="bhsd", qk_norm=qk_norm)
        return out.transpose(0, 2, 1, 3).reshape(b, s, hd)
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
    out = sdpa(q, k, v, scale=scale, kv_len=kv_len)
    return out.transpose(0, 2, 1, 3) if layout == "bshd" else out
