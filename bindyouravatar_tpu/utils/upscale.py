"""Tiled super-resolution upscaling (reference `util/utils.py:598-722`).

The reference drives a spandrel-loaded SR model over an image with
overlapping tiles, feathering each tile's edges and normalising by the
accumulated mask (`tiled_scale_multidim`).  Its loop narrows VARIABLE-size
boundary tiles — fine for CUDA eager mode, hostile to XLA (every boundary
shape is a recompile).

TPU-first redesign (deliberate divergences, each noted inline):

- **Static full-size tiles**: boundary tile ORIGINS are clamped so every
  tile is exactly `tile` pixels (edge tiles overlap their neighbours more,
  instead of shrinking).  One tile shape -> one compiled model call.
- **Batched model invocation**: all tiles are gathered into one [N, C, ty,
  tx] batch and the model runs once (or in `lax.map` chunks for memory) —
  MXU-friendly large batches instead of the reference's one-tile-at-a-time
  loop.
- **Same blend math**: per-tile linear feather mask over `overlap *
  upscale` output pixels, accumulate `sum(tile * mask) / sum(mask)` — the
  reference's out/out_div normalisation, so interior results are identical
  and boundary handling differs only by the clamped origins.

A pointwise upscaler (e.g. nearest-neighbour) reproduces the direct
(untiled) result EXACTLY through this path — the equality test in
`tests/test_upscale.py` uses that property.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_tiled_scale_steps(width: int, height: int, tile_x: int, tile_y: int,
                          overlap: int) -> int:
    """Tile count (reference `util/utils.py:598-599`; same formula)."""
    return (math.ceil(height / (tile_y - overlap))
            * math.ceil(width / (tile_x - overlap)))


def _origins(size: int, tile: int, overlap: int) -> np.ndarray:
    """Clamped full-tile origins covering [0, size) with `overlap` overlap."""
    if size <= tile:
        return np.array([0], np.int32)
    step = tile - overlap
    pos = np.arange(0, size, step)
    pos = pos[pos < size]                     # reference iterates range(0, size, step)
    return np.minimum(pos, size - tile).astype(np.int32)


def _feather_mask(shape: Tuple[int, int], feather: int) -> jnp.ndarray:
    """Linear edge feather, multiplicative per axis (reference's in-place
    `mask.narrow(...) *= (t+1)/feather` loop, vectorised)."""
    m = jnp.ones(shape, jnp.float32)
    for ax, n in enumerate(shape):
        ramp = jnp.ones((n,), jnp.float32)
        t = jnp.arange(feather, dtype=jnp.float32)
        ramp = ramp.at[:feather].mul((t + 1.0) / feather)
        ramp = ramp.at[n - 1 - jnp.arange(feather)].mul((t + 1.0) / feather)
        m = m * jnp.expand_dims(ramp, axis=tuple(i for i in range(2)
                                                 if i != ax))
    return m


def tiled_scale(samples: jnp.ndarray,
                function: Callable[[jnp.ndarray], jnp.ndarray],
                tile_x: int = 64, tile_y: int = 64, overlap: int = 8,
                upscale_amount: float = 4, out_channels: int = 3,
                batch_tiles: int = 0) -> jnp.ndarray:
    """Upscale [B, C, H, W] by running `function` over feather-blended
    tiles (reference `tiled_scale`, `util/utils.py:661-676`).

    `function` maps [N, C, tile_y, tile_x] -> [N, out_channels,
    tile_y*u, tile_x*u].  `batch_tiles` > 0 runs the model in chunks of
    that many tiles via `lax.map` (memory bound); 0 = all tiles at once.
    """
    b, c, h, w = samples.shape
    u = upscale_amount
    tile_y, tile_x = min(tile_y, h), min(tile_x, w)   # image smaller than tile
    oy = _origins(h, tile_y, overlap)
    ox = _origins(w, tile_x, overlap)
    uh, uw = round(h * u), round(w * u)
    uty, utx = round(tile_y * u), round(tile_x * u)
    feather = round(overlap * u)
    mask = _feather_mask((uty, utx), feather)[None]       # [1, uty, utx]

    # gather all tiles -> one static-shape batch [B*T, C, ty, tx]
    tiles = jnp.stack([
        jax.lax.dynamic_slice(samples[i], (0, int(y), int(x)),
                              (c, tile_y, tile_x))
        for i in range(b) for y in oy for x in ox])

    if batch_tiles and tiles.shape[0] > batch_tiles:
        n = tiles.shape[0]
        pad = (-n) % batch_tiles
        tp = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0), (0, 0)))
        up = jax.lax.map(function,
                         tp.reshape(-1, batch_tiles, *tiles.shape[1:]))
        up = up.reshape(-1, *up.shape[2:])[:n]
    else:
        up = function(tiles)
    up = up.astype(jnp.float32) * mask[None]              # [B*T, oc, uty, utx]

    out = jnp.zeros((b, out_channels, uh, uw), jnp.float32)
    div = jnp.zeros((1, 1, uh, uw), jnp.float32)
    t = 0
    for i in range(b):
        for y in oy:
            for x in ox:
                pos = (0, round(int(y) * u), round(int(x) * u))
                out = out.at[i].set(jax.lax.dynamic_update_slice(
                    out[i], jax.lax.dynamic_slice(
                        out[i], pos, (out_channels, uty, utx)) + up[t], pos))
                if i == 0:
                    div = div.at[0].set(jax.lax.dynamic_update_slice(
                        div[0], jax.lax.dynamic_slice(
                            div[0], (0,) + pos[1:], (1, uty, utx))
                        + mask, (0,) + pos[1:]))
                t += 1
    return out / div


def upscale(model_fn: Callable[[jnp.ndarray], jnp.ndarray],
            frames: jnp.ndarray, scale: float = 4.0, tile: int = 512,
            overlap: int = 32, batch_tiles: int = 0) -> jnp.ndarray:
    """Reference `upscale()` (`util/utils.py:686-716`): fixed 512/32
    tiling over a [T, C, H, W] frame stack."""
    return tiled_scale(frames, model_fn, tile_x=tile, tile_y=tile,
                       overlap=overlap, upscale_amount=scale,
                       out_channels=frames.shape[1],
                       batch_tiles=batch_tiles)


def upscale_batch_and_concatenate(model_fn, latents: jnp.ndarray,
                                  scale: float = 4.0, **kw) -> jnp.ndarray:
    """Reference `upscale_batch_and_concatenate` (`util/utils.py:719-725`):
    per-sample tiled upscale over a [B, T, C, H, W] batch."""
    return jnp.stack([upscale(model_fn, latents[i], scale=scale, **kw)
                      for i in range(latents.shape[0])])
