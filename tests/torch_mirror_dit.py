"""Line-accurate torch mirror of the reference DiT forward.

The reference model (`/root/reference/models/transformer.py:143-262,
615-960`) composes diffusers building blocks (CogVideoXLayerNormZero,
Attention + CogVideoXAttnProcessor2_0, FeedForward(gelu-approximate),
CogVideoXPatchEmbed, Timesteps/TimestepEmbedding, AdaLayerNorm,
get_3d_rotary_pos_embed) that are NOT installed in this image.  This module
re-implements exactly the semantics those blocks execute for the
unconditioned CogVideoX-5B path (use_rotary=True), in torch, with the
reference's checkpoint key names — so `import_reference_dit` can consume
`state_dict()` directly and the JAX forward can be compared fp32 against
an independent implementation of the reference math (the `test_bisenet.py`
mirror pattern).

Conventions mirrored deliberately:
  * RoPE in the INTERLEAVED pair layout (cos/sin repeat_interleave(2)),
    applied to q/k video positions after the per-head QK LayerNorm — the
    repo uses rotate-half + an importer channel permutation instead.
  * adaLN-zero: silu(temb) -> Linear -> 6-chunk (shift, scale, gate) for
    hidden and encoder streams; norm_out is AdaLayerNorm chunk_dim=1
    (shift first).
  * FeedForward: Linear -> gelu(tanh) -> Linear, names ff.net.0.proj /
    ff.net.2.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- RoPE
def get_resize_crop_region_for_grid(src, tgt_width, tgt_height):
    h, w = src
    r = h / w
    if r > (tgt_height / tgt_width):
        resize_height = tgt_height
        resize_width = int(round(tgt_height / h * w))
    else:
        resize_width = tgt_width
        resize_height = int(round(tgt_width / w * h))
    crop_top = int(round((tgt_height - resize_height) / 2.0))
    crop_left = int(round((tgt_width - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height,
                                   crop_left + resize_width)


def _rope_1d(dim: int, pos: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """diffusers get_1d_rotary_pos_embed(use_real=True,
    repeat_interleave_real=True): [P, dim] interleaved cos/sin."""
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2]
                             / dim))
    freqs = np.outer(pos.astype(np.float32), inv)
    return (np.repeat(np.cos(freqs), 2, axis=1),
            np.repeat(np.sin(freqs), 2, axis=1))


def get_3d_rotary_pos_embed(embed_dim: int, crops_coords, grid_size,
                            temporal_size: int):
    """diffusers get_3d_rotary_pos_embed (CogVideoX split: t=d/4,
    h=w=3d/8), interleaved-real layout."""
    start, stop = crops_coords
    gh, gw = grid_size
    pos_h = np.linspace(start[0], stop[0], gh, endpoint=False,
                        dtype=np.float32)
    pos_w = np.linspace(start[1], stop[1], gw, endpoint=False,
                        dtype=np.float32)
    pos_t = np.arange(temporal_size, dtype=np.float32)

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3
    cos_t, sin_t = _rope_1d(dim_t, pos_t)
    cos_h, sin_h = _rope_1d(dim_h, pos_h)
    cos_w, sin_w = _rope_1d(dim_w, pos_w)

    def combine(ft, fh, fw):
        t = np.broadcast_to(ft[:, None, None, :],
                            (temporal_size, gh, gw, ft.shape[-1]))
        h = np.broadcast_to(fh[None, :, None, :],
                            (temporal_size, gh, gw, fh.shape[-1]))
        w = np.broadcast_to(fw[None, None, :, :],
                            (temporal_size, gh, gw, fw.shape[-1]))
        return np.concatenate([t, h, w], axis=-1).reshape(-1, embed_dim)

    return (torch.from_numpy(combine(cos_t, cos_h, cos_w)),
            torch.from_numpy(combine(sin_t, sin_h, sin_w)))


def apply_rotary_emb(x: torch.Tensor, freqs) -> torch.Tensor:
    """diffusers apply_rotary_emb (use_real=True, unbind dim -1):
    x [B, H, S, D], freqs = (cos [S, D], sin [S, D]) interleaved."""
    cos, sin = freqs
    cos, sin = cos[None, None], sin[None, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


# ----------------------------------------------------------- modules
class CogVideoXLayerNormZero(nn.Module):
    """diffusers normalization.CogVideoXLayerNormZero (bias=True)."""

    def __init__(self, conditioning_dim, embedding_dim, eps=1e-5):
        super().__init__()
        self.linear = nn.Linear(conditioning_dim, 6 * embedding_dim, bias=True)
        self.norm = nn.LayerNorm(embedding_dim, eps=eps, elementwise_affine=True)

    def forward(self, hidden, encoder, temb):
        shift, scale, gate, e_shift, e_scale, e_gate = self.linear(
            F.silu(temb)).chunk(6, dim=1)
        hidden = self.norm(hidden) * (1 + scale)[:, None, :] + shift[:, None, :]
        encoder = (self.norm(encoder) * (1 + e_scale)[:, None, :]
                   + e_shift[:, None, :])
        return hidden, encoder, gate[:, None, :], e_gate[:, None, :]


class JointAttention(nn.Module):
    """diffusers Attention(qk_norm='layer_norm', eps=1e-6) running
    CogVideoXAttnProcessor2_0: joint [text, video] SDPA with per-head QK
    LayerNorm and RoPE on the video slice."""

    def __init__(self, dim, heads, head_dim, bias=True, out_bias=True):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner, bias=bias)
        self.to_k = nn.Linear(dim, inner, bias=bias)
        self.to_v = nn.Linear(dim, inner, bias=bias)
        self.norm_q = nn.LayerNorm(head_dim, eps=1e-6)
        self.norm_k = nn.LayerNorm(head_dim, eps=1e-6)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim, bias=out_bias),
                                     nn.Dropout(0.0)])

    def forward(self, hidden, encoder, image_rotary_emb):
        text_len = encoder.size(1)
        x = torch.cat([encoder, hidden], dim=1)
        b = x.shape[0]

        def split(t):
            return t.view(b, -1, self.heads, self.head_dim).transpose(1, 2)

        q = self.norm_q(split(self.to_q(x)))
        k = self.norm_k(split(self.to_k(x)))
        v = split(self.to_v(x))
        if image_rotary_emb is not None:
            q[:, :, text_len:] = apply_rotary_emb(q[:, :, text_len:],
                                                  image_rotary_emb)
            k[:, :, text_len:] = apply_rotary_emb(k[:, :, text_len:],
                                                  image_rotary_emb)
        o = F.scaled_dot_product_attention(q, k, v, dropout_p=0.0,
                                           is_causal=False)
        o = o.transpose(1, 2).reshape(b, -1, self.heads * self.head_dim)
        o = self.to_out[1](self.to_out[0](o))
        return o[:, text_len:], o[:, :text_len]


class _GELUProj(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="tanh")


class FeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='gelu-approximate',
    final_dropout=True) — net.0.proj / net.2 naming."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList([_GELUProj(dim, dim * mult), nn.Dropout(0.0),
                                  nn.Linear(dim * mult, dim), nn.Dropout(0.0)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class MirrorCogVideoXBlock(nn.Module):
    """Reference `CogVideoXBlock.forward` (transformer.py:223-262)."""

    def __init__(self, dim, heads, head_dim, time_embed_dim, eps=1e-5,
                 ff_mult=4):
        super().__init__()
        self.norm1 = CogVideoXLayerNormZero(time_embed_dim, dim, eps)
        self.attn1 = JointAttention(dim, heads, head_dim)
        self.norm2 = CogVideoXLayerNormZero(time_embed_dim, dim, eps)
        self.ff = FeedForward(dim, ff_mult)

    def forward(self, hidden, encoder, temb, image_rotary_emb):
        text_len = encoder.size(1)
        nh, ne, gate, e_gate = self.norm1(hidden, encoder, temb)
        attn_h, attn_e = self.attn1(nh, ne, image_rotary_emb)
        hidden = hidden + gate * attn_h
        encoder = encoder + e_gate * attn_e
        nh, ne, gate_ff, e_gate_ff = self.norm2(hidden, encoder, temb)
        ff_out = self.ff(torch.cat([ne, nh], dim=1))
        hidden = hidden + gate_ff * ff_out[:, text_len:]
        encoder = encoder + e_gate_ff * ff_out[:, :text_len]
        return hidden, encoder


class _PatchEmbed(nn.Module):
    """CogVideoXPatchEmbed, rotary path (no positional table)."""

    def __init__(self, patch_size, in_channels, dim, text_dim):
        super().__init__()
        self.p = patch_size
        self.proj = nn.Conv2d(in_channels, dim, kernel_size=patch_size,
                              stride=patch_size, bias=True)
        self.text_proj = nn.Linear(text_dim, dim)

    def forward(self, text_embeds, image_embeds):
        text = self.text_proj(text_embeds)
        b, f, c, h, w = image_embeds.shape
        img = self.proj(image_embeds.reshape(-1, c, h, w))
        img = img.view(b, f, *img.shape[1:])
        img = img.flatten(3).transpose(2, 3)      # [B, F, HW, dim]
        img = img.flatten(1, 2)                   # [B, F*HW, dim]
        return torch.cat([text, img], dim=1)


def _timesteps_proj(timesteps, embedding_dim, flip_sin_to_cos=True,
                    downscale_freq_shift=0.0):
    """diffusers get_timestep_embedding."""
    half = embedding_dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class _TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(F.silu(self.linear_1(sample)))


class _AdaLayerNorm(nn.Module):
    """diffusers AdaLayerNorm(output_dim=2*dim, chunk_dim=1): SHIFT first."""

    def __init__(self, embedding_dim, dim, eps=1e-5):
        super().__init__()
        self.linear = nn.Linear(embedding_dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, eps=eps, elementwise_affine=True)

    def forward(self, x, temb):
        shift, scale = self.linear(F.silu(temb)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None, :]) + shift[:, None, :]


class MirrorDiT(nn.Module):
    """Unconditioned CogVideoX-5B forward (reference transformer.py forward,
    use_rotary=True path, no face/audio injections): patch embed -> blocks
    -> joint norm_final -> AdaLayerNorm out -> proj -> unpatchify."""

    def __init__(self, *, num_layers, heads, head_dim, in_channels,
                 out_channels, time_embed_dim, text_dim, patch_size=2,
                 eps=1e-5, ff_mult=4):
        super().__init__()
        dim = heads * head_dim
        self.inner_dim, self.p, self.out_channels = dim, patch_size, out_channels
        self.patch_embed = _PatchEmbed(patch_size, in_channels, dim, text_dim)
        self.time_embedding = _TimestepEmbedding(dim, time_embed_dim)
        self.transformer_blocks = nn.ModuleList([
            MirrorCogVideoXBlock(dim, heads, head_dim, time_embed_dim, eps,
                                 ff_mult) for _ in range(num_layers)])
        self.norm_final = nn.LayerNorm(dim, eps, elementwise_affine=True)
        self.norm_out = _AdaLayerNorm(time_embed_dim, dim, eps)
        self.proj_out = nn.Linear(dim, patch_size * patch_size * out_channels)

    def forward(self, latents, text_embeds, timestep, image_rotary_emb):
        b, f, c, h, w = latents.shape
        t_emb = _timesteps_proj(timestep, self.inner_dim)
        emb = self.time_embedding(t_emb)

        x = self.patch_embed(text_embeds, latents)
        text_len = text_embeds.size(1)
        encoder, hidden = x[:, :text_len], x[:, text_len:]

        for block in self.transformer_blocks:
            hidden, encoder = block(hidden, encoder, emb, image_rotary_emb)

        hidden = torch.cat([encoder, hidden], dim=1)
        hidden = self.norm_final(hidden)[:, text_len:]
        hidden = self.norm_out(hidden, emb)
        hidden = self.proj_out(hidden)

        p = self.p
        out = hidden.reshape(b, f, h // p, w // p, -1, p, p)
        return out.permute(0, 1, 4, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)
