"""Patchify / unpatchify for the DiT (CogVideoXPatchEmbed semantics).

The reference patchifies per-frame with a 2x2 Conv2d
(`CogVideoXPatchEmbed`, used at `models/transformer.py:378-393`) and
unpatchifies with a reshape/permute (`transformer.py:955-957`).  On TPU a
2x2/stride-2 conv is exactly a reshape + matmul, which maps straight onto
the MXU — we implement it that way.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def patchify(latents: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, T, C, H, W] -> [B, T*(H/p)*(W/p), C*p*p] token features.

    Channel-last ordering inside each patch matches a Conv2d(k=p, s=p)
    followed by flatten: feature index = c*p*p + dy*p + dx.
    """
    b, t, c, h, w = latents.shape
    p = patch_size
    x = latents.reshape(b, t, c, h // p, p, w // p, p)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)          # [B,T,H/p,W/p,C,p,p]
    return x.reshape(b, t * (h // p) * (w // p), c * p * p)


def unpatchify(
    tokens: jnp.ndarray, grid: Tuple[int, int, int], out_channels: int, patch_size: int
) -> jnp.ndarray:
    """[B, T*Hg*Wg, C*p*p] -> [B, T, C, Hg*p, Wg*p] (reference `:955-957`)."""
    b = tokens.shape[0]
    t, hg, wg = grid
    p = patch_size
    x = tokens.reshape(b, t, hg, wg, out_channels, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)          # [B,T,C,Hg,p,Wg,p]
    return x.reshape(b, t, out_channels, hg * p, wg * p)
