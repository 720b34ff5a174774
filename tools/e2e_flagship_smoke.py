"""End-to-end flagship smoke on real hardware: full 42-layer 5B-geometry
DiT denoise (reduced steps) + temporal-chunked VAE decode of 49f x 480x720.

Measures per-step denoise time and decode time; extrapolates sec/clip at 50
steps (BASELINE.md "end-to-end latency" row).

Two modes:
  * default (`--conditioned`): the CONDITIONED flagship (face + audio paths
    on) through the pipeline's own jitted scan loop, single chip, via the
    bench.py recipe — sequential-CFG microbatch, conditioning prepped once
    then prep params freed, AOT AUTO weight layouts (pipe.aot_compile_loop).
    This is the honest headline number (VERDICT r2 #5).
  * `--bare`: the unconditioned hot path (round-2 number, kernel tracking).
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


def main_conditioned(steps: int = 4):
    """Conditioned flagship e2e on ONE chip: prep conditioning -> free prep
    params -> AOT AUTO-layout pipeline loop (sequential CFG) -> chunked
    decode.  The honest sec/clip (VERDICT r2 #4/#5)."""
    sys.path.insert(0, ".")
    from bindyouravatar_tpu.config import DiTConfig, PipelineConfig, VAEConfig
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.models.vae import CausalVAE
    from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline

    cfg = DiTConfig(num_layers=42, param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    vae = CausalVAE(VAEConfig())
    pipe = BindYourAvatarPipeline.create(
        dit, vae, PipelineConfig(num_inference_steps=steps,
                                 cfg_microbatch=True))

    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    zeros = lambda sub: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sub)
    prep_keys = ("lfe", "audio_statics")

    b, t = 1, cfg.latent_frames
    lfe, a = dit.lfe_cfg, dit.audio_cfg
    n_af = cfg.sample_frames + a.window_size - a.window_stride
    pe = jnp.zeros((2 * b, cfg.max_text_seq_length, cfg.text_embed_dim),
                   jnp.bfloat16)
    img_lat = jnp.zeros((b, t, 16, cfg.sample_height, cfg.sample_width))
    bg_lat = jnp.zeros_like(img_lat)
    id_cond = jnp.zeros((b, cfg.num_ids, lfe.id_embed_dim), jnp.bfloat16)
    vit = jnp.zeros((b, cfg.num_ids, lfe.num_scales, 577, lfe.vit_dim),
                    jnp.bfloat16)
    audio = jnp.zeros((b, cfg.num_ids, n_af, a.blocks, a.audio_dim),
                      jnp.bfloat16)
    af = jnp.broadcast_to(jnp.eye(cfg.num_ids, dtype=jnp.bfloat16)[None],
                          (b, cfg.num_ids, cfg.num_ids))

    # conditioning prep with ONLY the prep params resident, then free them
    t0 = time.time()
    prep_params = {k: zeros(shapes[k]) for k in prep_keys}
    args = pipe.prepare_denoise_inputs(
        prep_params, pe, img_lat, jax.random.key(0), steps,
        bg_latents=bg_lat, id_cond=id_cond, id_vit_hidden=vit,
        audio_embeds=audio, af_matrix=af)
    _ = float(args[3][0, 0, 0, 0])         # face2 sync
    for leaf in jax.tree.leaves(prep_params):
        leaf.delete()
    del prep_params
    print(f"[e2e] conditioning prepped in {time.time() - t0:.0f}s", flush=True)

    step_shapes = {k: v for k, v in shapes.items() if k not in prep_keys}
    t0 = time.time()
    compiled, fmts = pipe.aot_compile_loop(
        steps, pipe.cfg.guidance_scale, step_shapes, args)
    print(f"[e2e] loop compiled in {time.time() - t0:.0f}s", flush=True)
    params = jax.tree.map(
        lambda s, fmt: jax.device_put(jnp.zeros(s.shape, s.dtype), fmt),
        step_shapes, fmts)

    t0 = time.time()
    lat, _ = compiled(params, *args)
    _ = float(lat[0, 0, 0, 0, 0])
    t_first = time.time() - t0
    print(f"[e2e] {steps}-step conditioned denoise: {t_first:.0f}s", flush=True)

    t0 = time.time()
    lat2, _ = compiled(params, *args)
    _ = float(lat2[0, 0, 0, 0, 0])
    per_step = (time.time() - t0) / steps
    del lat2

    if "--profile" in sys.argv:
        # xprof trace of the PIPELINE loop (bench.py's profile covers the
        # bare fwd; this finds anything the scan adds around it)
        out = "/tmp/bya_e2e_prof"
        jax.profiler.start_trace(out)
        lat3, _ = compiled(params, *args)
        _ = float(lat3[0, 0, 0, 0, 0])
        jax.profiler.stop_trace()
        del lat3
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_step import parse_opstats   # tools/ sibling
        rows = parse_opstats(out, 40)
        total = sum(r["total_self_time"] for r in rows)
        for r in rows:
            print(f"{r['total_self_time']:>10.0f} "
                  f"{100 * r['total_self_time'] / total:>6.1f} "
                  f"{round(r.get('measured_memory_bw') or 0):>7} "
                  f"{round(r.get('model_flop_rate') or 0):>9} "
                  f"{str(r.get('operation', '?'))[:90]}", flush=True)

    # free the DiT params before decode (reference offloads, pipeline:965)
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    del params

    vae_shapes = jax.eval_shape(lambda k: vae.init(k), jax.random.key(1))
    vae_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vae_shapes)
    t0 = time.time()
    video = vae.decode(vae_params, lat, temporal_chunk=2)
    _ = float(video[0, 0, 0, 0, 0])
    t_decode = time.time() - t0
    assert video.shape == (1, 49, 3, 480, 720), video.shape
    print(json.dumps({
        "e2e_conditioned_flagship_49f_480p": True,
        "per_step_s": round(per_step, 2),
        "decode_s": round(t_decode, 1),
        "projected_sec_per_clip_50steps_1chip": round(50 * per_step + t_decode, 1),
    }))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(argv[0]) if argv else 4
    if "--bare" in sys.argv:
        main(steps)
    else:
        main_conditioned(steps)
