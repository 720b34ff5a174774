"""Mask -> teacher/forced routing-logit conversion.

Port of reference `util/utils.py:871-936` (`process_masks_to_routing_logits`)
and the trainer's inline index-mask construction (`train.py:1167-1193`),
using the canonical (T, H, W) grid.  Host-side numpy: this runs in the data
pipeline / between the two inference stages, not inside jit.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def resize_mask_trilinear(mask: np.ndarray, out_t: int, out_h: int, out_w: int) -> np.ndarray:
    """[T, H, W] float mask -> [out_t, out_h, out_w] via trilinear resize
    (reference `resize_mask`, `util/utils.py:481-514`, F.interpolate)."""
    import jax
    import jax.image

    return np.asarray(jax.image.resize(mask.astype(np.float32),
                                       (out_t, out_h, out_w), method="linear"))


def masks_to_index_mask(mask1: np.ndarray, mask2: np.ndarray,
                        latent_frames: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Two per-frame binary masks [T_px, H, W] -> index mask [T*Hg*Wg]:
    -1 background / 0 id1 / 1 id2 (id2 wins overlaps, reference order)."""
    m1 = resize_mask_trilinear(mask1, latent_frames, grid_h, grid_w) > 0.5
    m2 = resize_mask_trilinear(mask2, latent_frames, grid_h, grid_w) > 0.5
    idx = np.full((latent_frames, grid_h, grid_w), -1, np.int64)
    idx[m1] = 0
    idx[m2] = 1
    return idx.reshape(-1)


def index_mask_to_routing(index_mask: np.ndarray, num_ids: int = 2) -> np.ndarray:
    """index mask [S] -> one-hot routing logits [1, S, num_ids]
    (background rows all-zero)."""
    s = index_mask.shape[0]
    out = np.zeros((1, s, num_ids), np.float32)
    for i in range(num_ids):
        out[0, index_mask == i, i] = 1.0
    return out


def masks_to_routing_logits(mask_dir: str, latent_frames: int = 13,
                            grid_h: int = 30, grid_w: int = 45) -> np.ndarray:
    """Directory layout contract of the SAM2 tool
    (`tracking_mask_results/{1,2}/annotated_frame_%05d.png`, reference
    `tools/sam2_tools.py:149-183`) -> routing logits [1, S, 2]."""
    from PIL import Image

    def load_dir(d):
        files = sorted(f for f in os.listdir(d) if f.endswith(".png"))
        frames = [np.asarray(Image.open(os.path.join(d, f)).convert("L"),
                             dtype=np.float32) / 255.0 for f in files]
        return np.stack(frames)

    m1 = load_dir(os.path.join(mask_dir, "1"))
    m2 = load_dir(os.path.join(mask_dir, "2"))
    idx = masks_to_index_mask(m1, m2, latent_frames, grid_h, grid_w)
    return index_mask_to_routing(idx)


def noisy_teacher_routing(
    index_mask: np.ndarray,
    grid: Tuple[int, int, int],
    rng: np.random.Generator,
    num_ids: int = 2,
    corrupt_frac: float = 0.1,
    noise_std: float = 0.1,
    drop_prob: float = 0.0,
) -> np.ndarray:
    """Build the noisy teacher-forcing mask used during training
    (reference `transformer.py:741-774`): one-hot routing, temporal
    OR-reduce + repeat, 10% random entries, sigma-0.1 gaussian, clamp [0,1],
    full drop with `drop_prob`.  Returns [S, num_ids]."""
    t, h, w = grid
    r = index_mask_to_routing(index_mask, num_ids)[0]          # [S, I]
    r = r.reshape(t, h, w, num_ids).max(axis=0, keepdims=True)
    r = np.broadcast_to(r, (t, h, w, num_ids)).reshape(-1, num_ids).copy()

    total = r.size
    n_rand = int(total * corrupt_frac)
    flat = r.reshape(-1)
    pick = rng.permutation(total)[:n_rand]
    flat[pick] = rng.random(n_rand, dtype=np.float32)
    r = flat.reshape(-1, num_ids)
    r = r + rng.normal(0.0, noise_std, r.shape).astype(np.float32)
    r = np.clip(r, 0.0, 1.0)
    if rng.random() < drop_prob:
        r = np.zeros_like(r)
    return r
