"""LocalFacialExtractor: perceiver resampler fusing ArcFace id embeddings
with 5 multi-scale EVA-CLIP hidden states into 32 face tokens per identity.

Semantics mirror reference `models/router.py:31-193`; batched over
(batch x identity) in one fold instead of the reference's per-id calls
(`transformer.py:638-639`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LFEConfig
from .layers import LayerNorm


class PerceiverAttention(nn.Module):
    """LFE inner attention: kv over concat(context, latents); fp32 softmax
    with the reference's split scaling (q*s)@(k*s), s = dh**-0.25."""
    dim: int
    dim_head: int = 64
    heads: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        x = LayerNorm(param_dtype=self.param_dtype, name="norm1")(x)
        latents = LayerNorm(param_dtype=self.param_dtype, name="norm2")(latents)
        b, n2, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n2, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out")(o)


class _MappingMLP(nn.Module):
    """Linear-LN-LeakyReLU x2 -> Linear (reference mapping_{i} / id mapping)."""
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Dense(self.hidden, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc{i}")(x)
            x = LayerNorm(param_dtype=self.param_dtype, name=f"ln{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.out, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc_out")(x)


class _FeedForward(nn.Module):
    """LN -> Linear(no bias) -> GELU -> Linear(no bias) (router.py:10-17)."""
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = LayerNorm(param_dtype=self.param_dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.mult, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class LocalFacialExtractor(nn.Module):
    cfg: LFEConfig = LFEConfig()
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, id_embed: jnp.ndarray, vit_hidden: jnp.ndarray) -> jnp.ndarray:
        """id_embed: [N, 1280]; vit_hidden: [N, 5, 577, 1024] ->
        face tokens [N, num_queries, output_dim]."""
        c = self.cfg
        n = id_embed.shape[0]
        scale = c.dim ** -0.5
        latents0 = self.param(
            "latents", nn.initializers.normal(stddev=scale), (1, c.num_queries, c.dim),
            self.param_dtype)
        proj_out = self.param(
            "proj_out", nn.initializers.normal(stddev=scale), (c.dim, c.output_dim),
            self.param_dtype)

        id_tokens = _MappingMLP(c.dim, c.dim * c.num_id_token, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="id_embedding_mapping")(id_embed)
        id_tokens = id_tokens.reshape(n, c.num_id_token, c.dim)

        latents = jnp.broadcast_to(latents0, (n, c.num_queries, c.dim)).astype(self.dtype)
        latents = jnp.concatenate([latents, id_tokens], axis=1)

        depth_per_scale = c.depth // c.num_scales
        layer_idx = 0
        for i in range(c.num_scales):
            vit_feat = _MappingMLP(c.dim, c.dim, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"mapping_{i}")(vit_hidden[:, i])
            ctx = jnp.concatenate([id_tokens, vit_feat], axis=1)
            for _ in range(depth_per_scale):
                attn = PerceiverAttention(dim=c.dim, dim_head=c.dim_head, heads=c.heads,
                                          dtype=self.dtype, param_dtype=self.param_dtype,
                                          name=f"attn_{layer_idx}")
                ff = _FeedForward(dim=c.dim, mult=c.ff_mult, dtype=self.dtype,
                                  param_dtype=self.param_dtype, name=f"ff_{layer_idx}")
                latents = attn(ctx, latents) + latents
                latents = ff(latents) + latents
                layer_idx += 1

        latents = latents[:, : c.num_queries]
        return latents @ proj_out.astype(self.dtype)
