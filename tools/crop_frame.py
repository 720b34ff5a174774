"""Split an inpainting frame into left/right halves (reference
`tools/crop_frame.py` / `extract_left_and_right_frame.py`)."""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--out_dir", default=".")
    args = p.parse_args()

    import cv2

    img = cv2.imread(args.image)
    h, w = img.shape[:2]
    base = os.path.splitext(os.path.basename(args.image))[0]
    os.makedirs(args.out_dir, exist_ok=True)
    left = os.path.join(args.out_dir, f"{base}_left.png")
    right = os.path.join(args.out_dir, f"{base}_right.png")
    cv2.imwrite(left, img[:, : w // 2])
    cv2.imwrite(right, img[:, w // 2:])
    print(left)
    print(right)


if __name__ == "__main__":
    main()
