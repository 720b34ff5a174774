"""Benchmark: DiT denoise throughput (frames/sec/chip) at 49f x 480x720.

Headline metric per BASELINE.md: the denoise hot path — full 5B geometry
(42 layers, dim 3072, 17,776-token joint attention), CFG batch 2, bf16,
Pallas flash attention — on one TPU chip.  frames/sec/chip =
49 frames / (50 steps x measured step time).

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
ratio is against an estimated A100 reference throughput of 0.17 fps
(≈720 TFLOP/step at ~40% MFU on 312 TF/s bf16; the north-star target is
>=3x A100 on a v5e-8 slice, i.e. per-chip parity ≈ 0.375x).

Sync note: under the axon relay `block_until_ready` does not synchronise —
timing uses scalar fetches and a data-dependency chain.
"""

import json
import time

import jax
import jax.numpy as jnp


A100_REFERENCE_FPS_EST = 0.17
STEPS_PER_CLIP = 50
FRAMES = 49


def zeros_init(dit):
    """Fast device-side init (bench only: values don't affect timing)."""
    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    from bindyouravatar_tpu.config import DiTConfig
    from bindyouravatar_tpu.models.dit import DiT

    cfg = DiTConfig(num_layers=42, is_train_face=False, is_train_audio=False,
                    param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    params = zeros_init(dit)

    b = 2  # CFG batch
    t = cfg.latent_frames
    lat = jnp.zeros((b, t, cfg.in_channels, cfg.sample_height, cfg.sample_width),
                    jnp.bfloat16)
    text = jnp.zeros((b, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.bfloat16)
    ts = jnp.full((b,), 500.0)
    rope = dit.rope(480, 720, t)

    f = jax.jit(lambda p, l: dit.apply(p, l, text, ts, rope)[0])

    out = f(params, lat)
    float(out[0, 0, 0, 0, 0])  # sync (compile + first run)

    n = 3
    t0 = time.perf_counter()
    cur = lat
    for _ in range(n):
        out = f(params, cur)
        cur = lat.at[:, :, :16].set(out.astype(jnp.bfloat16))  # dependency chain
    float(out[0, 0, 0, 0, 0])  # sync
    dt = (time.perf_counter() - t0) / n

    fps = FRAMES / (STEPS_PER_CLIP * dt)
    print(json.dumps({
        "metric": "dit_denoise_frames_per_sec_per_chip_49f_480p",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_EST, 3),
        "step_ms": round(dt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
