"""Validation-in-training (reference `log_validation`, `train.py:103-203`):
build an inference pipeline around the LIVE transformer params every
checkpoint interval, generate validation videos, export mp4s and log.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_validation_fn(
    pipe,
    vae_params: Dict[str, Any],
    output_dir: str,
    prompt_embeds: np.ndarray,
    negative_prompt_embeds: Optional[np.ndarray] = None,
    image: Optional[np.ndarray] = None,
    cond: Optional[Dict[str, Any]] = None,
    num_inference_steps: int = 8,
    num_videos: int = 1,
    fps: int = 25,
    seed: int = 0,
) -> Callable[[int, Dict[str, Any]], None]:
    """Returns `validation_fn(step, live_dit_params)` for `TrainDriver.run`."""
    from ..utils.media import export_to_video

    c = pipe.dit.cfg
    pe = jnp.asarray(prompt_embeds)
    ne = (jnp.asarray(negative_prompt_embeds)
          if negative_prompt_embeds is not None else jnp.zeros_like(pe))
    if image is None:
        image = jnp.zeros((pe.shape[0], 1, 3, c.sample_height * 8,
                           c.sample_width * 8))
    else:
        image = jnp.asarray(image)
    cond = cond or {}

    def validation_fn(step: int, dit_params: Dict[str, Any]) -> None:
        params = {"dit": dit_params, "vae": vae_params}
        out_dir = os.path.join(output_dir, f"validation-{step}")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(num_videos):
            key = jax.random.key(seed + i)
            video = pipe.generate(
                params, pe, ne, image, key,
                num_inference_steps=num_inference_steps, **cond)
            path = os.path.join(out_dir, f"video_{i}.mp4")
            export_to_video(np.asarray(video[0]), path, fps=fps)
            print(f"[validation] step {step}: wrote {path}")

    return validation_fn
