"""Generate synthetic demo assets in the reference's `assets/` layout
(faces/, audio_emb/, audio/, inpaintingframe/, config/*.cfg) so the batch
harness runs end-to-end without fixture downloads.

The reference ships real showcase fixtures; this produces schema-identical
synthetic ones (procedural face-like images, random audio embeddings with
the [N,12,768] contract, silence mute fixture, wavs, bg frame).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def face_image(rng, size=512, skin=(205, 170, 140)):
    import cv2

    img = np.full((size, size, 3), 230, np.uint8)
    cx, cy = size // 2, size // 2
    jitter = lambda v, s: int(v + rng.normal(0, s))
    cv2.ellipse(img, (cx, cy), (size // 3, int(size / 2.4)), 0, 0, 360,
                tuple(int(c + rng.integers(-20, 20)) for c in skin), -1)
    for dx in (-size // 8, size // 8):
        cv2.circle(img, (jitter(cx + dx, 3), jitter(cy - size // 10, 3)),
                   size // 20, (40, 30, 30), -1)
    cv2.ellipse(img, (cx, cy + size // 6), (size // 10, size // 20), 0, 0, 180,
                (120, 60, 60), size // 60)
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="assets")
    p.add_argument("--num_samples", type=int, default=2)
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--model_size", default="tiny")
    args = p.parse_args()

    import cv2
    import torch
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    root = args.out_dir
    for d in ("faces", "audio_emb", "audio", "inpaintingframe", "config"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    n_audio = args.num_frames + 4
    blocks, adim = (2, 16) if args.model_size == "tiny" else (12, 768)

    for i in range(args.num_samples):
        for side in (0, 1):
            cv2.imwrite(os.path.join(root, "faces", f"{i:03d}_{side}.png"),
                        face_image(rng))
            emb = rng.normal(0, 1, (n_audio, blocks, adim)).astype(np.float32)
            torch.save(torch.from_numpy(emb),
                       os.path.join(root, "audio_emb", f"{i:03d}_{side}.pt"))
            wav = (rng.normal(0, 0.1, 16000 * 2) * 32767).astype(np.int16)
            wavfile.write(os.path.join(root, "audio", f"{i:03d}_{side}.wav"),
                          16000, wav)
        bg = np.full((480, 720, 3), 200, np.uint8)
        cv2.rectangle(bg, (40, 200), (300, 480), (150, 170, 190), -1)
        cv2.rectangle(bg, (420, 200), (680, 480), (170, 150, 150), -1)
        cv2.imwrite(os.path.join(root, "inpaintingframe", f"{i:03d}.png"), bg)

    torch.save(torch.zeros(n_audio, blocks, adim),
               os.path.join(root, "audio_emb", "ae_mute.pt"))

    frames = 9 if args.model_size == "tiny" else args.num_frames
    hw = ("128", "192") if args.model_size == "tiny" else ("480", "720")
    with open(os.path.join(root, "config", "default.cfg"), "w") as f:
        f.write(f"--model_size {args.model_size}\n"
                f"--num_inference_steps 2\n--num_frames {frames}\n"
                f"--height {hw[0]} --width {hw[1]}\n--seed 42\n"
                f"--mute_audio_path {root}/audio_emb/ae_mute.pt\n")
    # per-sample flag variations exercising the reference's golden-tier input
    # shapes (`/root/reference/assets/config/001..014.cfg`): 1- vs 2-track
    # audio, bg inpainting frame on/off, two-stage on/off, speaker side,
    # guidance, zero2cond, scheduler.
    variations = [
        ("two people having a conversation", 2, False, "left", []),
        ("an elderly man and a young boy on a park bench", 2, True, "left",
         ["--guidance_scale 9"]),
        ("a person speaking to a silent listener", 1, False, "right", []),
        ("a man and an android face each other", 2, True, "right",
         ["--guidance_scale 7"]),
        ("a narrator in front of a mural", 1, True, "left",
         ["--zero2cond_cfg_flag"]),
        ("two friends on a city street", 2, False, "left",
         ["--two_stage_generate"]),
        ("two hosts presenting a show", 2, False, "right",
         ["--scheduler ddim", "--use_dynamic_cfg"]),
    ]
    for i in range(args.num_samples):
        prompt, n_tracks, bg, side, extra = variations[i % len(variations)]
        tracks = " ".join(f"{root}/audio_emb/{i:03d}_{k}.pt"
                          for k in range(n_tracks))
        lines = [f'--prompt "{prompt}"',
                 f"--audio_path {tracks}",
                 f"--speaker_pos {side}"]
        if bg:
            lines.append(f"--inpaintingframe_path "
                         f"{root}/inpaintingframe/{i:03d}.png")
        lines += extra
        with open(os.path.join(root, "config", f"{i:03d}.cfg"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {args.num_samples} samples under {root}/")


if __name__ == "__main__":
    main()
