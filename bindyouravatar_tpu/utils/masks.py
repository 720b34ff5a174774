"""Mask -> teacher/forced routing-logit conversion.

Port of reference `util/utils.py:871-936` (`process_masks_to_routing_logits`)
and the trainer's inline index-mask construction (`train.py:1167-1193`),
using the canonical (T, H, W) grid.  Host-side numpy: this runs in the data
pipeline / between the two inference stages, not inside jit.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_native_lib = None
_native_tried = False


def _load_native():
    """Lazy-load (building if needed) the C++ mask kernels (native/mask_ops.cpp)."""
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    so = os.path.join(_NATIVE_DIR, "libbya_mask_ops.so")
    try:
        if not os.path.isfile(so) and os.path.isfile(
                os.path.join(_NATIVE_DIR, "Makefile")):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.bya_resize_trilinear.argtypes = [f32p] + [ctypes.c_int] * 3 + \
            [f32p] + [ctypes.c_int] * 3
        lib.bya_masks_to_teacher.argtypes = [f32p, f32p] + [ctypes.c_int] * 6 + \
            [i64p, f32p]
        _native_lib = lib
    except Exception:
        _native_lib = None
    return _native_lib


def _numpy_trilinear(src: np.ndarray, out_t: int, out_h: int, out_w: int) -> np.ndarray:
    """Plain trilinear (half-pixel centers, NO antialias) — torch
    F.interpolate(trilinear) semantics, matching the native kernel.
    (jax.image.resize 'linear' antialiases on downsample — different op.)"""
    t, h, w = src.shape

    def axis_idx(n_out, n_in):
        f = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        lo = np.clip(np.floor(f).astype(int), 0, n_in - 1)
        hi = np.clip(lo + 1, 0, n_in - 1)
        frac = np.clip(f - np.floor(f), 0.0, 1.0)
        frac = np.where(f < 0, 0.0, frac)
        return lo, hi, frac.astype(np.float32)

    t0, t1, ft = axis_idx(out_t, t)
    y0, y1, fy = axis_idx(out_h, h)
    x0, x1, fx = axis_idx(out_w, w)

    def gather(ti, yi, xi):
        return src[np.ix_(ti, yi, xi)]

    c000 = gather(t0, y0, x0); c001 = gather(t0, y0, x1)
    c010 = gather(t0, y1, x0); c011 = gather(t0, y1, x1)
    c100 = gather(t1, y0, x0); c101 = gather(t1, y0, x1)
    c110 = gather(t1, y1, x0); c111 = gather(t1, y1, x1)
    fx_ = fx[None, None, :]
    fy_ = fy[None, :, None]
    ft_ = ft[:, None, None]
    c00 = c000 * (1 - fx_) + c001 * fx_
    c01 = c010 * (1 - fx_) + c011 * fx_
    c10 = c100 * (1 - fx_) + c101 * fx_
    c11 = c110 * (1 - fx_) + c111 * fx_
    c0 = c00 * (1 - fy_) + c01 * fy_
    c1 = c10 * (1 - fy_) + c11 * fy_
    return (c0 * (1 - ft_) + c1 * ft_).astype(np.float32)


def resize_mask_trilinear(mask: np.ndarray, out_t: int, out_h: int, out_w: int) -> np.ndarray:
    """[T, H, W] float mask -> [out_t, out_h, out_w] via trilinear resize
    (reference `resize_mask`, `util/utils.py:481-514`, F.interpolate).

    Native C++ kernel when available; identical numpy path otherwise."""
    lib = _load_native()
    src = np.ascontiguousarray(mask, np.float32)
    if lib is not None:
        out = np.empty((out_t, out_h, out_w), np.float32)
        lib.bya_resize_trilinear(src, *src.shape, out, out_t, out_h, out_w)
        return out
    return _numpy_trilinear(src, out_t, out_h, out_w)


def masks_to_teacher_native(mask1: np.ndarray, mask2: np.ndarray,
                            latent_frames: int, grid_h: int, grid_w: int):
    """C++ fast path: (index_mask [S], clean OR-reduced teacher [S,2]).
    Returns None when the native library is unavailable."""
    lib = _load_native()
    if lib is None:
        return None
    m1 = np.ascontiguousarray(mask1, np.float32)
    m2 = np.ascontiguousarray(mask2, np.float32)
    s = latent_frames * grid_h * grid_w
    idx = np.empty(s, np.int64)
    teacher = np.empty((s, 2), np.float32)
    lib.bya_masks_to_teacher(m1, m2, *m1.shape, latent_frames, grid_h, grid_w,
                             idx, teacher)
    return idx, teacher


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
