"""Detect and save per-face crops left->right (reference `tools/get_faces_img.py`)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--out_dir", default="faces")
    p.add_argument("--yunet_model", default=None)
    args = p.parse_args()

    import cv2

    from bindyouravatar_tpu.preprocess.face import FaceDetector

    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    det = FaceDetector(yunet_model=args.yunet_model)
    faces = det(img)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, f in enumerate(faces):
        x0, y0, x1, y1 = f.bbox.astype(int)
        crop = img[max(0, y0):y1, max(0, x0):x1]
        out = os.path.join(args.out_dir, f"face_{i}.png")
        cv2.imwrite(out, cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))
        print(out)


if __name__ == "__main__":
    main()
