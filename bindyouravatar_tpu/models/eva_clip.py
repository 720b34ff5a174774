"""EVA02-CLIP-L-14-336 visual tower in flax.

Replaces the reference's vendored torch EVA-CLIP (only the ViT is
load-bearing: `models/eva_clip/eva_vit_model.py:366-548`, used via
`process_face_embeddings` to produce the pooled 768-d feature and the 5
multi-scale hidden states [B,577,1024] tapped at blocks 4,8,12,16,20).

Architecture (EVA02-CLIP-L-14-336.json): 336px / patch 14 -> 576+1 tokens,
width 1024, 24 layers, 16 heads, SwiGLU mlp_ratio 2.6667, sub-LN (separate
q/k/v projections, k without bias, inner attention LN, FFN LN), 2D axial
rotary embedding on half the head dim (interpolated 16->24 grid
frequencies), abs pos embed + cls token.  RoPE here uses our rotate-half
convention (see ops/rope.py note); xformers attention becomes the shared
XLA/Pallas `sdpa` (577 tokens — plain attention is fine, SURVEY §2.9).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import EVACLIPConfig
from ..ops.attention import sdpa
from ..ops.rope import apply_rotary_emb
from .layers import LayerNorm


def _vision_rope_tables(grid: int, dim_half: int, pt_seq_len: int = 16,
                        theta: float = 10000.0):
    """2D axial rope (EVA `VisionRotaryEmbeddingFast` semantics): per axis
    `dim_half/2` frequencies over positions scaled to the pretrain grid."""
    freqs = 1.0 / (theta ** (np.arange(0, dim_half, 2, dtype=np.float64) / dim_half))
    t = np.arange(grid, dtype=np.float64) / grid * pt_seq_len
    ang = np.outer(t, freqs)                                  # [G, dim_half/2]
    hh = np.broadcast_to(ang[:, None, :], (grid, grid, ang.shape[-1]))
    ww = np.broadcast_to(ang[None, :, :], (grid, grid, ang.shape[-1]))
    full = np.concatenate([hh, ww], axis=-1).reshape(grid * grid, dim_half)
    cos = np.concatenate([np.cos(full), np.cos(full)], axis=-1)
    sin = np.concatenate([np.sin(full), np.sin(full)], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


class EVAAttention(nn.Module):
    cfg: EVACLIPConfig

    @nn.compact
    def __call__(self, x, rope):
        c = self.cfg
        b, s, _ = x.shape
        dh = c.width // c.heads
        q = nn.Dense(c.width, use_bias=True, dtype=c.dtype,
                     param_dtype=c.param_dtype, name="q_proj")(x)
        k = nn.Dense(c.width, use_bias=False, dtype=c.dtype,
                     param_dtype=c.param_dtype, name="k_proj")(x)
        v = nn.Dense(c.width, use_bias=True, dtype=c.dtype,
                     param_dtype=c.param_dtype, name="v_proj")(x)
        q = q.reshape(b, s, c.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, c.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, c.heads, dh).transpose(0, 2, 1, 3)
        if c.use_rope:
            cos, sin = rope
            q = jnp.concatenate([q[:, :, :1], apply_rotary_emb(q[:, :, 1:], cos, sin)], 2)
            k = jnp.concatenate([k[:, :, :1], apply_rotary_emb(k[:, :, 1:], cos, sin)], 2)
        o = sdpa(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c.width)
        o = LayerNorm(eps=1e-6, param_dtype=c.param_dtype, name="inner_attn_ln")(o)
        return nn.Dense(c.width, use_bias=True, dtype=c.dtype,
                        param_dtype=c.param_dtype, name="proj")(o)


class EVABlock(nn.Module):
    cfg: EVACLIPConfig

    @nn.compact
    def __call__(self, x, rope):
        c = self.cfg
        h = LayerNorm(eps=1e-6, param_dtype=c.param_dtype, name="norm1")(x)
        x = x + EVAAttention(c, name="attn")(h, rope)
        h = LayerNorm(eps=1e-6, param_dtype=c.param_dtype, name="norm2")(x)
        hidden = int(c.width * c.mlp_ratio)
        w1 = nn.Dense(hidden, dtype=c.dtype, param_dtype=c.param_dtype, name="w1")(h)
        w2 = nn.Dense(hidden, dtype=c.dtype, param_dtype=c.param_dtype, name="w2")(h)
        g = nn.silu(w1) * w2
        g = LayerNorm(eps=1e-6, param_dtype=c.param_dtype, name="ffn_ln")(g)
        x = x + nn.Dense(c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                         name="w3")(g)
        return x


class EVAVisionTower(nn.Module):
    cfg: EVACLIPConfig = EVACLIPConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images [B, 3, H, W] (normalised) ->
        (pooled [B, out_dim], hidden [B, n_taps, S, width])."""
        c = self.cfg
        b = images.shape[0]
        x = images.transpose(0, 2, 3, 1).astype(c.dtype)
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, param_dtype=c.param_dtype, name="patch_embed")(x)
        x = x.reshape(b, -1, c.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width),
                         c.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.width)).astype(c.dtype), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1], c.width), c.param_dtype)
        x = x + pos.astype(c.dtype)

        grid = c.grid
        dh = c.width // c.heads
        rope = _vision_rope_tables(grid, dh // 2, c.pt_hw_seq_len) if c.use_rope else None

        taps = []
        for i in range(c.depth):
            if i in c.hidden_taps:
                taps.append(x)
            x = EVABlock(c, name=f"block_{i}")(x, rope)

        x = LayerNorm(eps=1e-6, param_dtype=c.param_dtype, name="norm")(x)
        pooled = nn.Dense(c.out_dim, dtype=c.dtype, param_dtype=c.param_dtype,
                          name="head")(x[:, 0])
        return pooled, jnp.stack(taps, axis=1)


@dataclasses.dataclass(frozen=True)
class EVACLIPVision:
    cfg: EVACLIPConfig = EVACLIPConfig()

    def init(self, key):
        img = jnp.zeros((1, 3, self.cfg.image_size, self.cfg.image_size))
        return EVAVisionTower(self.cfg).init(key, img)["params"]

    def apply(self, params, images):
        return EVAVisionTower(self.cfg).apply({"params": params}, images)

    @classmethod
    def tiny(cls):
        return cls(EVACLIPConfig(image_size=28, patch_size=14, width=32, depth=6,
                                 heads=4, out_dim=16, hidden_taps=(1, 2, 3, 4, 5),
                                 pt_hw_seq_len=2, dtype=jnp.float32))
