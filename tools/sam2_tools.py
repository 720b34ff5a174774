"""Mask-tracking tool (reference `tools/sam2_tools.py:33-217`).

Contract: given a two-character video, write per-id mask PNGs to
`{out_dir}/{1,2}/annotated_frame_%05d.png` plus `valid_frame.json` — the
directory layout the trainer and two-stage inference consume
(`utils/masks.masks_to_routing_logits`).

Backends:
  * the NATIVE flax SAM-2.1 video predictor (`preprocess/sam2_video.py`)
    when a checkpoint is supplied via --sam2_checkpoint / BYA_SAM2_CKPT
    (same behavior as the reference `tools/sam2_tools.py:93-149`: detect
    faces on frame 0, sort left->right, point-prompt, propagate);
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


def _sam2_checkpoint(args_ckpt=None):
    return args_ckpt or os.environ.get("BYA_SAM2_CKPT")


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


def sam2_masks(frames: np.ndarray, checkpoint: str = None,
               predictor=None) -> np.ndarray:
    """Native SAM-2.1 video propagation from faces detected on frame 0
    (reference flow: FaceAnalysis kps -> point prompts -> propagate).
    `predictor` injects a prebuilt `SAM2VideoPredictor` (tests)."""
    import cv2

    from bindyouravatar_tpu.preprocess.face import FaceDetector

    t, h, w = frames.shape[:3]
    if predictor is None:
        from bindyouravatar_tpu.preprocess.sam2_video import load_sam2_predictor

        predictor = load_sam2_predictor(checkpoint)
    state = predictor.init_state(frames)

    faces = FaceDetector(retinaface_checkpoint=os.environ.get(
        "BYA_RETINAFACE_CKPT"))(frames[0])
    if len(faces) < 2:   # fall back to left/right face-ish prompts
        pts = [np.array([[w * 0.3, h * 0.4]]), np.array([[w * 0.7, h * 0.4]])]
    else:
        pts = [np.asarray([[(f.bbox[0] + f.bbox[2]) / 2 if f.landmarks is None
                            else f.landmarks[2, 0],
                            (f.bbox[1] + f.bbox[3]) / 2 if f.landmarks is None
                            else f.landmarks[2, 1]]])
               for f in faces[:2]]
    for oid, p in enumerate(pts, start=1):
        predictor.add_new_points(state, 0, oid, p.astype(np.float32),
                                 np.array([1]))

    size4 = predictor.cfg.image_size // 4
    masks = np.zeros((2, t, h, w), np.uint8)
    for fi, ids, logits in predictor.propagate_in_video(state):
        for j, _ in enumerate(ids[:2]):
            m = (logits[j] > 0).astype(np.uint8)
            masks[j, fi] = cv2.resize(m, (w, h),
                                      interpolation=cv2.INTER_NEAREST)
    return masks


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
    p.add_argument("--sam2_checkpoint", default=None,
                   help="sam2.1 .pt checkpoint for the native predictor "
                        "(default: $BYA_SAM2_CKPT; fallback masks if unset)")
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bindyouravatar_tpu.training.data import read_video_frames

    import cv2

    cap = cv2.VideoCapture(args.video)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    frames = read_video_frames(args.video, list(range(n)))

    ckpt = _sam2_checkpoint(args.sam2_checkpoint)
    if ckpt:
        masks = sam2_masks(frames, ckpt)
    else:
        masks = fallback_masks(frames)
    write_masks(masks, args.out_dir)
    print(f"wrote {masks.shape[1]} mask frames x {masks.shape[0]} ids to {args.out_dir}")


if __name__ == "__main__":
    main()
