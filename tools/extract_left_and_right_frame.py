"""Split an inpainting frame into left/right halves — per-character crops
for two-character conditioning (reference
`tools/extract_left_and_right_frame.py:1-30`).

Keeps the reference's function API (`get_left_and_right_frame` returning RGB
arrays) so scripts written against it keep working; the CLI saves
`<base>_left<ext>` / `<base>_right<ext>` next to the requested save path.
`tools/crop_frame.py` is the argparse sibling covering the same split.
"""

from __future__ import annotations

import argparse
import os


def get_left_and_right_frame(input_image_path, video_length=None,
                             sample_size=None, fps=None,
                             validation_video_mask=None):
    """Return (left, right) RGB uint8 arrays, the two vertical halves of
    the image at ``input_image_path``.

    Extra keyword arguments are accepted-and-ignored for signature
    compatibility with the reference tool.
    """
    if not isinstance(input_image_path, str):
        raise ValueError("input_image_path must be a str path")

    import cv2

    bgr = cv2.imread(input_image_path)
    if bgr is None:
        raise ValueError(f"could not read an image from {input_image_path!r}")
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    w = rgb.shape[1]
    return rgb[:, : w // 2], rgb[:, w // 2:]


def main(argv=None):
    p = argparse.ArgumentParser(
        description="split an inpainting frame into left/right halves")
    p.add_argument("--image", default="assets/inpaintingframe/003.png")
    p.add_argument("--save_path", default=None,
                   help="base output path (default: next to --image)")
    args = p.parse_args(argv)

    from PIL import Image

    left, right = get_left_and_right_frame(args.image)
    save_path = args.save_path or args.image
    base, ext = os.path.splitext(save_path)
    ext = ext or ".png"
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    left_path, right_path = f"{base}_left{ext}", f"{base}_right{ext}"
    Image.fromarray(left).save(left_path)
    Image.fromarray(right).save(right_path)
    print(left_path)
    print(right_path)
    return left_path, right_path


if __name__ == "__main__":
    main()
