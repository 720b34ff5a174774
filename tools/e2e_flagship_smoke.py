"""End-to-end flagship smoke on real hardware: full 42-layer 5B-geometry
DiT denoise (reduced steps) + temporal-chunked VAE decode of 49f x 480x720.

Measures per-step denoise time and decode time; extrapolates sec/clip at 50
steps (BASELINE.md "end-to-end latency" row).  The conditioned flagship
(face+audio, ~17 GB bf16) needs >= 2 chips via parallel/tp.py — this runs
the unconditioned hot path that fits one v5e.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main(steps: int = 4):
    sys.path.insert(0, ".")
    from bench import zeros_init
    from bindyouravatar_tpu.config import DiTConfig, PipelineConfig, VAEConfig
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.models.vae import CausalVAE
    from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline

    cfg = DiTConfig(num_layers=42, is_train_face=False, is_train_audio=False,
                    in_channels=32, param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    vae = CausalVAE(VAEConfig())
    pipe = BindYourAvatarPipeline.create(
        dit, vae, PipelineConfig(num_inference_steps=steps))

    t0 = time.time()
    params = {"dit": zeros_init(dit)}
    vae_shapes = jax.eval_shape(lambda k: vae.init(k), jax.random.key(1))
    params["vae"] = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vae_shapes)
    print(f"[e2e] params ready in {time.time() - t0:.0f}s", flush=True)

    prompt = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.bfloat16)
    image = jnp.zeros((1, 1, 3, 480, 720))

    t0 = time.time()
    lat = pipe.generate(params, prompt, jnp.zeros_like(prompt), image,
                        jax.random.key(0), decode=False)
    _ = float(lat[0, 0, 0, 0, 0])
    t_denoise = time.time() - t0
    print(f"[e2e] {steps}-step denoise (incl. compile): {t_denoise:.0f}s", flush=True)

    # steady-state step time: rerun the jitted loop once compiled
    t0 = time.time()
    lat2 = pipe.generate(params, prompt, jnp.zeros_like(prompt), image,
                         jax.random.key(1), decode=False)
    _ = float(lat2[0, 0, 0, 0, 0])
    t_loop = time.time() - t0
    per_step = t_loop / steps
    del lat2

    # free the DiT params before decode (the reference offloads the
    # transformer to CPU here, pipeline:965) — decode activations at
    # 480p x 49f don't fit alongside 11 GB of weights on one v5e
    for leaf in jax.tree.leaves(params["dit"]):
        leaf.delete()
    params["dit"] = None

    t0 = time.time()
    video = vae.decode(params["vae"], lat, temporal_chunk=2)
    _ = float(video[0, 0, 0, 0, 0])
    t_decode = time.time() - t0
    assert video.shape == (1, 49, 3, 480, 720), video.shape
    print(json.dumps({
        "e2e_flagship_49f_480p": True,
        "per_step_s": round(per_step, 2),
        "decode_s": round(t_decode, 1),
        "projected_sec_per_clip_50steps_1chip": round(50 * per_step + t_decode, 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
