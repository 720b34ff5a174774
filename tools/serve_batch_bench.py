"""Measure the cross-clip request-batching win on the real chip.

The serving batch path (`InferenceServer(batch_max=2)`) amortises the
per-step weight reads — the HBM bound — across clips.  A single CPU core
can't show that (batch-2 FLOPs = 2x batch-1), so the CPU-mesh serving test
only pins mechanics; THIS tool times the denoise loop at batch 1 vs batch 2
on one TPU chip with a reduced-depth flagship-geometry DiT (12 layers bf16
≈ 3.4 GB: batch-2 activations still fit) and reports the per-request
speedup.

    python tools/serve_batch_bench.py [num_layers=12] [steps=4]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import DiTConfig, PipelineConfig, VAEConfig
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.models.vae import CausalVAE
    from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cfg = DiTConfig(num_layers=n_layers, is_train_face=False,
                    is_train_audio=False, in_channels=32,
                    param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    vae = CausalVAE(VAEConfig())
    pipe = BindYourAvatarPipeline.create(
        dit, vae, PipelineConfig(num_inference_steps=steps))

    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def run(b):
        pe = jnp.zeros((2 * b, cfg.max_text_seq_length, cfg.text_embed_dim),
                       jnp.bfloat16)
        img = jnp.zeros((b, cfg.latent_frames, 16, cfg.sample_height,
                         cfg.sample_width))
        lat = pipe.denoise(params, pe, img, jax.random.key(b))
        float(lat[0, 0, 0, 0, 0])          # warm + relay-safe sync
        t0 = time.time()
        lat = pipe.denoise(params, pe, img, jax.random.key(b + 1))
        float(lat[0, 0, 0, 0, 0])
        return (time.time() - t0) / steps

    t1 = run(1)
    t2 = run(2)
    print(json.dumps({
        "num_layers": n_layers,
        "steps": steps,
        "batch1_step_s": round(t1, 3),
        "batch2_step_s": round(t2, 3),
        "per_request_speedup": round(2 * t1 / t2, 2),
        "note": "batch-2 serves 2 clips/step; speedup = 2*t1/t2",
    }))


if __name__ == "__main__":
    main()
