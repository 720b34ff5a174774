"""3D rotary position embeddings for the CogVideoX-style DiT.

Semantics follow diffusers `get_3d_rotary_pos_embed` /
`get_resize_crop_region_for_grid` as used by the reference pipeline
(`models/pipeline_bindyouravatar.py:585-610`), re-derived for JAX.

Convention note (TPU-native divergence, mathematically equivalent):
the reference applies RoPE in the *interleaved* pair convention
(x pairs = (x0,x1),(x2,x3),...).  We use the *rotate-half* convention
(pairs = (x_i, x_{i+d/2})) because it lowers to concat/slice instead of
stride-2 shuffles on TPU.  Relative-phase structure is identical; when
importing reference checkpoints the converter permutes the output channels
of W_q / W_k (and the QK-norm affine params) so results match bit-wise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_resize_crop_region_for_grid(
    src: Tuple[int, int], tgt_width: int, tgt_height: int
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Aspect-fit center-crop region used to index the RoPE base grid.

    Mirrors diffusers' helper: `src` is (grid_h, grid_w) of the actual
    latent grid, tgt_* the base grid (720x480 -> 45x30 for patch 2).
    """
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
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


def _1d_freqs(dim: int, pos: np.ndarray, theta: float = 10000.0) -> np.ndarray:
    """[len(pos), dim//2] rotary phase angles (float64 for table fidelity)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    return np.outer(pos.astype(np.float64), inv_freq)  # [P, dim//2]


def get_3d_rotary_pos_embed(
    embed_dim: int,
    crops_coords: Tuple[Tuple[int, int], Tuple[int, int]],
    grid_size: Tuple[int, int],
    temporal_size: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables, each [T*H*W, embed_dim], rotate-half layout.

    Channel split: dim_t = d/4 on time, dim_h = dim_w = 3d/8 on space
    (diffusers CogVideoX split).  The first half of the last axis holds the
    angles, the second half repeats them (rotate-half pairing).
    """
    (top, left), (bottom, right) = crops_coords
    grid_h, grid_w = grid_size
    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3

    pos_t = np.arange(temporal_size, dtype=np.float64)
    # linspace with endpoint=False over the crop region (diffusers semantics)
    pos_h = np.linspace(top, bottom, grid_h, endpoint=False, dtype=np.float64)
    pos_w = np.linspace(left, right, grid_w, endpoint=False, dtype=np.float64)

    ft = _1d_freqs(dim_t, pos_t, theta)  # [T, dim_t//2]
    fh = _1d_freqs(dim_h, pos_h, theta)  # [H, dim_h//2]
    fw = _1d_freqs(dim_w, pos_w, theta)  # [W, dim_w//2]

    t = np.broadcast_to(ft[:, None, None, :], (temporal_size, grid_h, grid_w, ft.shape[-1]))
    h = np.broadcast_to(fh[None, :, None, :], (temporal_size, grid_h, grid_w, fh.shape[-1]))
    w = np.broadcast_to(fw[None, None, :, :], (temporal_size, grid_h, grid_w, fw.shape[-1]))
    freqs = np.concatenate([t, h, w], axis=-1).reshape(-1, embed_dim // 2)  # [S, d/2]

    # rotate-half layout: duplicate halves
    cos = np.concatenate([np.cos(freqs), np.cos(freqs)], axis=-1)
    sin = np.concatenate([np.sin(freqs), np.sin(freqs)], axis=-1)
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def apply_rotary_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE. x: [..., S, D]; cos/sin: [S, D]."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _sincos_cache(key):  # pragma: no cover - trivial
    raise NotImplementedError


def get_1d_sincos_pos_embed_np(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[P, embed_dim] classic transformer sincos table (sin || cos halves)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000.0 ** omega
    out = np.einsum("p,d->pd", pos.astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int,
    spatial_size: Tuple[int, int],
    temporal_size: int,
    spatial_interpolation_scale: float = 1.875,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """[T, H*W, embed_dim] learnable-free 3D sincos table (CogVideoX-2B path).

    3/4 of channels encode space (2D grid), 1/4 encodes time.
    """
    h, w = spatial_size
    dim_s = embed_dim // 4 * 3
    dim_t = embed_dim // 4

    gh = np.arange(h, dtype=np.float64) / spatial_interpolation_scale
    gw = np.arange(w, dtype=np.float64) / spatial_interpolation_scale
    grid = np.meshgrid(gw, gh)  # order: w first, then h (diffusers)
    grid = np.stack(grid, axis=0).reshape([2, 1, h, w])
    emb_h = get_1d_sincos_pos_embed_np(dim_s // 2, grid[1].reshape(-1))
    emb_w = get_1d_sincos_pos_embed_np(dim_s // 2, grid[0].reshape(-1))
    pos_embed_spatial = np.concatenate([emb_h, emb_w], axis=1)  # [H*W, dim_s]

    gt = np.arange(temporal_size, dtype=np.float64) / temporal_interpolation_scale
    pos_embed_temporal = get_1d_sincos_pos_embed_np(dim_t, gt)  # [T, dim_t]

    spatial = np.broadcast_to(pos_embed_spatial[None], (temporal_size, h * w, dim_s))
    temporal = np.broadcast_to(pos_embed_temporal[:, None], (temporal_size, h * w, dim_t))
    return np.concatenate([temporal, spatial], axis=-1)  # [T, H*W, D]


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers `Timesteps` semantics).

    timesteps: [B] float/int -> [B, dim] float32.
    """
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)
