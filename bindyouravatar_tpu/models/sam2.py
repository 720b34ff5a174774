"""SAM2 (Segment Anything 2) — native flax port of the video segmenter.

The reference's two-stage pipeline derives per-identity tracking masks with
`sam2.build_sam2_video_predictor` (`/root/reference/tools/sam2_tools.py:15,
207`): face-detection point prompts on frame 0, then `propagate_in_video`.
This module is the TPU-native model: Hiera backbone, FPN neck, SAM prompt
encoder, two-way-transformer mask decoder, memory encoder and memory
attention.  The video predictor loop + checkpoint importer live in
`preprocess/sam2_video.py`; `tools/sam2_tools.py` uses them when a
checkpoint is supplied and keeps its coarse fallback otherwise.

Architecture follows the sam2.1 release ("hiera-L" defaults here,
`HieraConfig.tiny()` for tests): patch-embed 7x7/4, 4 stages with window
attention + q-pooling and a few global blocks, FPN to 256-d with high-res
skip levels, SAM-style prompt/mask heads with object-score token, ConvNeXt
fuser memory encoder, and RoPE memory attention.  Ported from the public
architecture description — NOT from the reference repo (which only imports
the `sam2` pip package).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ #
# config

@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)

    @classmethod
    def large(cls) -> "HieraConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "HieraConfig":
        """sam2.1_hiera_tiny geometry."""
        return cls(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                   global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7))

    @classmethod
    def test(cls) -> "HieraConfig":
        """Miniature for unit tests."""
        return cls(embed_dim=16, num_heads=1, stages=(1, 1, 1, 1),
                   global_att_blocks=(2,), window_spec=(4, 2, 2, 2),
                   window_pos_embed_bkg_spatial_size=(7, 7))

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2 ** i for i in range(len(self.stages)))


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = HieraConfig()
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7                 # 1 cond + 6 recent
    image_size: int = 1024
    backbone_stride: int = 16
    num_multimask: int = 3
    memory_attn_layers: int = 4
    memory_attn_heads: int = 1
    memory_attn_kv_dim: int = 256
    max_obj_ptrs: int = 16

    @classmethod
    def tiny_test(cls) -> "SAM2Config":
        return cls(hiera=HieraConfig.test(), d_model=32, mem_dim=16,
                   image_size=128, memory_attn_layers=1,
                   num_multimask=3)


# ------------------------------------------------------------------ #
# shared bits

class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC's last dim (torch LayerNorm2d on NCHW)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (d,))
        b = self.param("bias", nn.initializers.zeros, (d,))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * w + b


class MLP(nn.Module):
    """SAM-style n-layer MLP (relu between, optional sigmoid)."""
    hidden: int
    out: int
    layers: int = 3
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"layers_{i}")(x))
        x = nn.Dense(self.out, name=f"layers_{self.layers - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


def _interp_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize (align_corners=False, torch default)."""
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear")


def _interp_nearest(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    ih, iw = x.shape[1:3]
    ri = (np.arange(h) * ih // h).astype(np.int32)
    ci = (np.arange(w) * iw // w).astype(np.int32)
    return x[:, ri][:, :, ci]


def sine_pos_enc_2d(h: int, w: int, dim: int,
                    temperature: float = 10000.0) -> np.ndarray:
    """[H, W, dim] sine position encoding (DETR-style, as sam2's
    PositionEmbeddingSine with normalize=True)."""
    half = dim // 2
    y = (np.arange(h, dtype=np.float64) + 1)[:, None].repeat(w, 1)
    x = (np.arange(w, dtype=np.float64) + 1)[None, :].repeat(h, 0)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    t = temperature ** (2 * (np.arange(half, dtype=np.float64) // 2) / half)
    px = x[..., None] / t
    py = y[..., None] / t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  axis=-1).reshape(h, w, half)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  axis=-1).reshape(h, w, half)
    return np.concatenate([py, px], axis=-1).astype(np.float32)


# ------------------------------------------------------------------ #
# Hiera backbone

def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return wins, (hp, wp)


def _window_unpartition(wins, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class MultiScaleAttention(nn.Module):
    dim_out: int
    heads: int
    q_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        qkv = nn.Dense(self.dim_out * 3, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:   # 2x2 max pool on q's spatial layout
            q = q.reshape(b, h, w, -1)
            q = jax.lax.reduce_window(
                q, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.heads, -1)
        dh = q.shape[-1]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, h, w, -1)
        return nn.Dense(self.dim_out, name="proj")(o)


class MultiScaleBlock(nn.Module):
    dim_out: int
    heads: int
    window_size: int = 0          # 0 = global attention
    q_stride: bool = False        # 2x2 pooling (first block of stages 2..4)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if x.shape[-1] != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj")(h)
        if self.q_stride:
            shortcut = jax.lax.reduce_window(
                shortcut, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")

        hw = h.shape[1:3]
        if self.window_size > 0:
            h, pad_hw = _window_partition(h, self.window_size)
        h = MultiScaleAttention(self.dim_out, self.heads,
                                q_pool=self.q_stride, name="attn")(h)
        if self.window_size > 0:
            ws = self.window_size // 2 if self.q_stride else self.window_size
            out_hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2) if self.q_stride else hw
            out_pad = (pad_hw[0] // 2, pad_hw[1] // 2) if self.q_stride else pad_hw
            h = _window_unpartition(h, ws, out_pad, out_hw)
        x = shortcut + h
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_layers_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, name="mlp_layers_1")(y)
        return x + y


class Hiera(nn.Module):
    """Returns per-stage feature maps [/4, /8, /16, /32] (NHWC)."""
    cfg: HieraConfig = HieraConfig()

    @nn.compact
    def __call__(self, images):                      # [B, 3, H, W] normalised
        c = self.cfg
        x = images.transpose(0, 2, 3, 1)
        x = nn.Conv(c.embed_dim, (7, 7), strides=4, padding=3,
                    name="patch_embed")(x)
        h, w = x.shape[1:3]

        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1,) + c.window_pos_embed_bkg_spatial_size
                         + (c.embed_dim,))
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, c.window_spec[0], c.window_spec[0], c.embed_dim))
        pe = _interp_bilinear(bkg, (h, w))
        tile = (-h) % c.window_spec[0], (-w) % c.window_spec[0]
        wrep = jnp.tile(win, (1, (h + tile[0]) // c.window_spec[0],
                              (w + tile[1]) // c.window_spec[0], 1))
        x = x + pe + wrep[:, :h, :w]

        stage_ends = np.cumsum(c.stages) - 1
        q_pool_blocks = set((np.cumsum(c.stages)[:-1]).tolist())
        outs = []
        idx = 0
        dim = c.embed_dim
        heads = c.num_heads
        for si, n in enumerate(c.stages):
            for bi in range(n):
                is_pool = idx in q_pool_blocks
                if is_pool:
                    dim *= 2
                    heads *= 2
                ws = c.window_spec[si]
                if idx in c.global_att_blocks:
                    ws = 0
                x = MultiScaleBlock(dim, heads, window_size=ws,
                                    q_stride=is_pool,
                                    name=f"blocks_{idx}")(x)
                if idx in stage_ends:
                    outs.append(x)
                idx += 1
        return tuple(outs)


class FpnNeck(nn.Module):
    """1x1 laterals to d_model + top-down on the chosen levels; returns
    features ordered high-res -> low-res with their sine pos encodings."""
    d_model: int = 256
    top_down_levels: Tuple[int, ...] = (2, 3)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        n = len(feats)
        laterals = [nn.Conv(self.d_model, (1, 1), name=f"convs_{i}")(f)
                    for i, f in enumerate(feats)]
        outs: List[Optional[jnp.ndarray]] = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            x = laterals[i]
            if i in self.top_down_levels and prev is not None:
                x = x + _interp_nearest(prev, x.shape[1:3])
            prev = x
            outs[i] = x
        pos = [jnp.asarray(sine_pos_enc_2d(o.shape[1], o.shape[2],
                                           self.d_model))[None]
               for o in outs]
        return outs, pos


class ImageEncoder(nn.Module):
    """Hiera + FPN; drops the /32 level (sam2 `scalp=1`) and returns
    (embedding /16, high-res skips [/4, /8], pos encodings)."""
    cfg: SAM2Config = SAM2Config()

    @nn.compact
    def __call__(self, images):
        feats = Hiera(self.cfg.hiera, name="trunk")(images)
        outs, pos = FpnNeck(self.cfg.d_model, name="neck")(list(feats))
        outs, pos = outs[:-1], pos[:-1]               # scalp: drop /32
        return {"vision_features": outs[-1],          # /16, d_model
                "backbone_fpn": outs,                 # [/4, /8, /16]
                "vision_pos_enc": pos}


# ------------------------------------------------------------------ #
# prompt encoder (SAM1 heritage)

class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> (sparse [B, N, D], dense [B, h, w, D]).

    Points: labels 1=positive, 0=negative, 2/3=box corners, -1=padding.
    Coordinates are in [0, image_size] pixel space.
    """
    cfg: SAM2Config = SAM2Config()

    def setup(self):
        d = self.cfg.d_model
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2))
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, d))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (d,))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (d,))

    def _pe(self, coords_01):
        """Random-fourier position encoding of [..., 2] coords in [0,1]."""
        x = (2 * coords_01 - 1) @ self.pe_gaussian      # [..., d/2]
        x = 2 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def dense_pe(self, h: int, w: int):
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
        return self._pe(grid)                            # [h, w, d]

    def __call__(self, points, labels):
        """points [B, N, 2] pixels, labels [B, N] int -> sparse [B, N, D]."""
        c = self.cfg
        # SAM shifts prompts to pixel centers before normalising
        # (matching dense_pe's +0.5 grid)
        pe = self._pe((points + 0.5) / c.image_size)
        lab = labels[..., None]
        out = jnp.where(lab == -1, self.not_a_point_embed[None, None], pe)
        for i in range(4):
            out = out + jnp.where(lab == i, self.point_embeddings[i][None, None],
                                  0.0)
        out = jnp.where(lab == -1, self.not_a_point_embed[None, None], out)
        return out

    def dense_no_mask(self, b: int, h: int, w: int):
        return jnp.broadcast_to(self.no_mask_embed[None, None, None],
                                (b, h, w, self.cfg.d_model))


# ------------------------------------------------------------------ #
# two-way transformer mask decoder

class DownsampledAttention(nn.Module):
    """SAM attention with internal dim downsampling."""
    dim: int
    heads: int = 8
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        dh = inner // self.heads
        proj = lambda nm, t: nn.Dense(inner, name=nm)(t)
        qp = proj("q_proj", q).reshape(q.shape[0], -1, self.heads, dh)
        kp = proj("k_proj", k).reshape(k.shape[0], -1, self.heads, dh)
        vp = proj("v_proj", v).reshape(v.shape[0], -1, self.heads, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(vp.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vp)
        o = o.reshape(q.shape[0], -1, inner)
        return nn.Dense(self.dim, name="out_proj")(o)


class TwoWayAttentionBlock(nn.Module):
    dim: int
    heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        d = self.dim
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(d, self.heads, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                d, self.heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            d, self.heads, downsample=2,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        y = nn.Dense(self.mlp_dim, name="mlp_layers_0")(queries)
        y = nn.relu(y)
        queries = queries + nn.Dense(d, name="mlp_layers_1")(y)
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            d, self.heads, downsample=2,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    dim: int
    depth: int = 2
    heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embed, image_pe, point_embed):
        b, h, w, d = image_embed.shape
        keys = image_embed.reshape(b, h * w, d)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, h * w, d),
                                  keys.shape)
        queries = point_embed
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.dim, self.heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), name=f"layers_{i}")(
                    queries, keys, point_embed, key_pe)
        q = queries + point_embed
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.dim, self.heads, downsample=2,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """SAM2 mask decoder: multimask + iou + object-score heads, high-res
    skip fusion in the upscaler."""
    cfg: SAM2Config = SAM2Config()

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt, dense_prompt,
                 high_res_feats):
        c = self.cfg
        d = c.d_model
        n_masks = c.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (d,))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_masks, d))
        obj_token = self.param("obj_score_token",
                               nn.initializers.normal(1.0), (d,))

        b = image_embed.shape[0]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(obj_token[None, None], (b, 1, d)),
             jnp.broadcast_to(iou_token[None, None], (b, 1, d)),
             jnp.broadcast_to(mask_tokens[None], (b, n_masks, d)),
             sparse_prompt], axis=1)

        src = image_embed + dense_prompt
        hs, keys = TwoWayTransformer(d, name="transformer")(
            src, image_pe, tokens)
        obj_out = hs[:, 0]
        iou_out = hs[:, 1]
        mask_out = hs[:, 2:2 + n_masks]

        h, w = image_embed.shape[1:3]
        src = keys.reshape(b, h, w, d)
        f_s0, f_s1 = high_res_feats                    # [/4 x32ch-proj, /8 x64]
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                              name="output_upscaling_0")(src)
        up = LayerNorm2d(name="output_upscaling_ln")(up + f_s1)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                              name="output_upscaling_3")(up)
        up = nn.gelu(up + f_s0, approximate=False)      # [B, 4h, 4w, d/8]

        hyper = jnp.stack(
            [MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                mask_out[:, i]) for i in range(n_masks)], axis=1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
        iou_pred = MLP(d, n_masks, 3, name="iou_prediction_head")(iou_out)
        obj_score = MLP(d, 1, 3, name="pred_obj_score_head")(obj_out)
        # SAM token out (object pointer source)
        return masks, iou_pred, obj_score, mask_out


# ------------------------------------------------------------------ #
# memory subsystem

class CXBlock(nn.Module):
    """ConvNeXt block (memory fuser)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    name="dwconv")(x)
        h = LayerNorm2d(name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + gamma * h


class MemoryEncoder(nn.Module):
    """(pix features /16, predicted mask logits) -> memory features
    [B, h, w, mem_dim] + sine pos enc."""
    cfg: SAM2Config = SAM2Config()

    @nn.compact
    def __call__(self, pix_feat, mask_logits):
        c = self.cfg
        # sam2 downsamples the sigmoid'd mask from FULL image resolution by
        # total stride 16 (4 conv steps); decoder logits arrive at /4, so
        # upsample first to keep the checkpoint's conv-channel progression
        m = jax.nn.sigmoid(mask_logits)[..., None]      # [B, h4, w4, 1]
        full = (pix_feat.shape[1] * 16, pix_feat.shape[2] * 16)
        if m.shape[1:3] != full:
            m = _interp_bilinear(m, full)
        ch = 4
        i = 0
        while m.shape[1] > pix_feat.shape[1]:
            m = nn.Conv(ch, (3, 3), strides=2, padding=1,
                        name=f"mask_downsampler_{i}")(m)
            m = LayerNorm2d(name=f"mask_downsampler_ln_{i}")(m)
            m = nn.gelu(m, approximate=False)
            ch = min(ch * 4, c.d_model)
            i += 1
        m = nn.Conv(c.d_model, (1, 1), name="mask_downsampler_final")(m)

        x = nn.Conv(c.d_model, (1, 1), name="pix_feat_proj")(pix_feat)
        x = x + m
        x = CXBlock(c.d_model, name="fuser_layers_0")(x)
        x = CXBlock(c.d_model, name="fuser_layers_1")(x)
        x = nn.Conv(c.mem_dim, (1, 1), name="out_proj")(x)
        pos = jnp.asarray(sine_pos_enc_2d(x.shape[1], x.shape[2],
                                          c.mem_dim))[None]
        return x, jnp.broadcast_to(pos, x.shape)


def _rope_2d_tables(h: int, w: int, dim: int,
                    theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Axial 2D RoPE cos/sin tables [h*w, dim//2] (half for y, half for x)."""
    quarter = dim // 4
    freqs = 1.0 / theta ** (np.arange(quarter, dtype=np.float64) / quarter)
    ty = np.arange(h, dtype=np.float64)[:, None] * freqs[None]
    tx = np.arange(w, dtype=np.float64)[:, None] * freqs[None]
    ang = np.concatenate(
        [np.broadcast_to(ty[:, None], (h, w, quarter)),
         np.broadcast_to(tx[None, :], (h, w, quarter))], axis=-1)
    ang = ang.reshape(h * w, dim // 2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rope_interleaved(x, cos, sin):
    """x [..., S, D]; rotate pairs (x0,x1),(x2,x3)... by cos/sin [S, D/2]."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    """Memory-attention attention with axial RoPE on spatial tokens.

    `rope_k_rows`: number of leading k rows that are spatial (get RoPE,
    repeating the table per memory frame); trailing rows (object pointers)
    are left unrotated, as are trailing q rows beyond the table.
    """
    dim: int
    heads: int
    kv_in_dim: Optional[int] = None

    @nn.compact
    def __call__(self, q, k, v, hw_q, hw_k, rope_k_rows=None):
        dh = self.dim // self.heads
        b = q.shape[0]
        qp = nn.Dense(self.dim, name="q_proj")(q)
        kp = nn.Dense(self.dim, name="k_proj")(k)
        vp = nn.Dense(self.dim, name="v_proj")(v)
        qp = qp.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)

        cos_q, sin_q = (jnp.asarray(t) for t in
                        _rope_2d_tables(hw_q[0], hw_q[1], dh))
        nq = hw_q[0] * hw_q[1]
        qp = jnp.concatenate(
            [_apply_rope_interleaved(qp[:, :, :nq], cos_q, sin_q),
             qp[:, :, nq:]], axis=2)
        if rope_k_rows is None:
            rope_k_rows = kp.shape[2]
        nk_spatial = hw_k[0] * hw_k[1]
        reps = rope_k_rows // nk_spatial
        cos_k, sin_k = (jnp.asarray(t) for t in
                        _rope_2d_tables(hw_k[0], hw_k[1], dh))
        cos_k = jnp.tile(cos_k, (reps, 1))
        sin_k = jnp.tile(sin_k, (reps, 1))
        kp = jnp.concatenate(
            [_apply_rope_interleaved(kp[:, :, :rope_k_rows], cos_k, sin_k),
             kp[:, :, rope_k_rows:]], axis=2)

        s = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(vp.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vp)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
        return nn.Dense(self.dim, name="out_proj")(o)


class MemoryAttentionLayer(nn.Module):
    cfg: SAM2Config = SAM2Config()

    @nn.compact
    def __call__(self, x, memory, hw_q, hw_k, rope_k_rows):
        c = self.cfg
        h = nn.LayerNorm(name="norm1")(x)
        x = x + RoPEAttention(c.d_model, c.memory_attn_heads,
                              name="self_attn")(h, h, h, hw_q, hw_q)
        h = nn.LayerNorm(name="norm2")(x)
        x = x + RoPEAttention(c.d_model, c.memory_attn_heads,
                              name="cross_attn_image")(
            h, memory, memory, hw_q, hw_k, rope_k_rows=rope_k_rows)
        h = nn.LayerNorm(name="norm3")(x)
        y = nn.Dense(2048, name="linear1")(h)
        y = nn.relu(y)
        return x + nn.Dense(c.d_model, name="linear2")(y)


class MemoryAttention(nn.Module):
    cfg: SAM2Config = SAM2Config()

    @nn.compact
    def __call__(self, curr, memory, hw_q, hw_k, rope_k_rows):
        x = curr
        for i in range(self.cfg.memory_attn_layers):
            x = MemoryAttentionLayer(self.cfg, name=f"layers_{i}")(
                x, memory, hw_q, hw_k, rope_k_rows)
        return nn.LayerNorm(name="norm")(x)
