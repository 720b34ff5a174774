"""Audio embedding extraction (superset: the reference ships none).

The reference consumes precomputed `.pt` tensors [num_pixel_frames, 12, 768]
— 12 wav2vec2-base transformer-block hidden states per 25-fps video frame
(SURVEY §2.4 #16).  This module produces embeddings in exactly that
contract from a wav file using transformers' torch-cpu Wav2Vec2 when a
local checkpoint is available (zero-egress image: no hub download), and
always supports the precomputed path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_precomputed(path: str) -> np.ndarray:
    """Load a reference-format `.pt` audio embedding [N, 12, 768]."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    arr = t.float().numpy() if hasattr(t, "float") else np.asarray(t, np.float32)
    if arr.ndim != 3:
        raise ValueError(f"expected [N,12,768]-like, got {arr.shape}")
    return arr.astype(np.float32)


def read_wav_mono_16k(path: str) -> np.ndarray:
    """Decode a wav to mono float32 @16 kHz (scipy, linear resample)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if data.dtype.kind != "f":
        data = data / np.abs(data).max().clip(1e-6)
    peak = np.abs(data).max()
    if peak > 1.5:            # int-scaled
        data = data / 32768.0
    if sr != 16000:
        n = int(round(len(data) * 16000 / sr))
        data = np.interp(np.linspace(0, len(data) - 1, n),
                         np.arange(len(data)), data).astype(np.float32)
    return data


def extract_wav2vec_embeddings(
    wav_path: str,
    num_pixel_frames: int,
    fps: float = 25.0,
    model_dir: Optional[str] = None,
) -> np.ndarray:
    """wav -> [num_pixel_frames, 12, 768] hidden-state stack.

    Requires a LOCAL wav2vec2-base checkpoint dir (env
    `BYA_WAV2VEC_DIR` or `model_dir`); raises with a clear message
    otherwise (precomputed `.pt` path always works).
    """
    model_dir = model_dir or os.environ.get("BYA_WAV2VEC_DIR")
    if not model_dir or not os.path.isdir(model_dir):
        raise FileNotFoundError(
            "wav2vec2 checkpoint not available locally; pass precomputed "
            "audio embeddings (.pt) or set BYA_WAV2VEC_DIR")
    import torch
    from transformers import Wav2Vec2Model

    model = Wav2Vec2Model.from_pretrained(model_dir)
    model.eval()
    audio = read_wav_mono_16k(wav_path)
    with torch.no_grad():
        out = model(torch.from_numpy(audio)[None],
                    output_hidden_states=True)
    # hidden_states: embed + 12 block outputs; take the 12 blocks
    hs = torch.stack(out.hidden_states[1:], dim=2)[0]     # [T50, 12, 768]
    hs = hs.float().numpy()
    # wav2vec2 frames are ~50/s; resample to the video frame rate
    t50 = hs.shape[0]
    idx = np.linspace(0, t50 - 1, num_pixel_frames)
    lo = np.floor(idx).astype(int)
    hi = np.minimum(lo + 1, t50 - 1)
    frac = (idx - lo)[:, None, None]
    return ((1 - frac) * hs[lo] + frac * hs[hi]).astype(np.float32)


def mix_tracks(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Two-speaker wav mix (reference `tools/synthesize_audio.py`)."""
    n = max(len(a), len(b))
    out = np.zeros(n, np.float32)
    out[: len(a)] += a
    out[: len(b)] += b
    peak = np.abs(out).max()
    if peak > 1.0:
        out = out / peak
    return out
