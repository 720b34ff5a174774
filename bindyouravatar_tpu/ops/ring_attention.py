"""Ring attention: sequence-parallel self-attention over the `sp` mesh axis.

Superset capability (SURVEY §5 "long-context / sequence parallelism:
absent" in the reference, which hard-caps 49 frames): shards the joint
sequence across chips and rotates K/V blocks around the ring with
`jax.lax.ppermute` while accumulating the online softmax — communication
rides ICI and overlaps with the per-block attention compute.  Each block's
attention goes through the shared dispatcher (Pallas flash kernel on TPU).

Non-causal (the DiT's 3D full attention), optional kv-length masking for
the padded tail of the LAST shard.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .attention import sdpa

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _block_attn_stats(q, k, v, scale, mask_cols: Optional[jnp.ndarray]):
    """One Q-shard x KV-block attention returning (o_unnorm, m, l) fp32.

    q: [B,H,Sq,D], k/v: [B,H,Sk,D], mask_cols: [Sk] bool (True=valid)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask_cols is not None:
        s = jnp.where(mask_cols[None, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)                  # [B,H,Sq,1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return o, m, l


def ring_attention_sharded(q, k, v, *, axis_name: str, scale: float,
                           valid_len: Optional[int] = None):
    """Body to run under shard_map: q/k/v are the LOCAL sequence shards
    [B,H,S_local,D].  `valid_len` is the global valid sequence length
    (trailing pad on the last shard is masked)."""
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    s_local = k.shape[2]

    def cols_mask(src_idx):
        if valid_len is None:
            return None
        start = src_idx * s_local
        cols = start + jnp.arange(s_local)
        return cols < valid_len

    perm = None

    def step(carry, i):
        o_acc, m_acc, l_acc, kb, vb = carry
        src = (my - i) % n
        o, m, l = _block_attn_stats(q, kb, vb, scale, cols_mask(src))
        m_new = jnp.maximum(m_acc, m)
        alpha = jnp.exp(m_acc - m_new)
        beta = jnp.exp(m - m_new)
        o_acc = o_acc * alpha + o * beta
        l_acc = l_acc * alpha + l * beta
        shift = [(d, (d + 1) % n) for d in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, shift)
        vb = jax.lax.ppermute(vb, axis_name, shift)
        return (o_acc, m_acc * 0 + m_new, l_acc, kb, vb), None

    o0 = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
    m0 = jnp.full(q.shape[:3] + (1,), NEG_INF, jnp.float32)
    l0 = jnp.zeros(q.shape[:3] + (1,), jnp.float32)
    (o, m, l, _, _), _ = jax.lax.scan(step, (o0, m0, l0, k, v),
                                      jnp.arange(n))
    inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (o * inv).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "sp",
                   scale: Optional[float] = None,
                   valid_len: Optional[int] = None):
    """q/k/v: GLOBAL [B,H,S,D]; S must divide by the sp axis size.
    Returns attention output [B,H,S,D], sequence-sharded compute."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, None, axis_name, None)
    fn = functools.partial(ring_attention_sharded, axis_name=axis_name,
                           scale=float(scale), valid_len=valid_len)
    try:
        from jax import shard_map          # jax >= 0.7: check_vma

        wrapped = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                            out_specs=spec, check_vma=False)
    except ImportError:                    # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        wrapped = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                            out_specs=spec, check_rep=False)
    return wrapped(q, k, v)
