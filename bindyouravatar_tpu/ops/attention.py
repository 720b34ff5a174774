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
) -> jnp.ndarray:
    """Self/cross attention over [B, H, S, D] tensors.

    Dispatches to the Pallas flash kernel when `use_flash` and the shape is
    worth it (long sequences on TPU); otherwise XLA SDPA.
    """
    if use_flash and q.shape[-2] >= 1024 and q.shape[-2] == k.shape[-2]:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, kv_len=kv_len)
    return sdpa(q, k, v, scale=scale, kv_len=kv_len)
