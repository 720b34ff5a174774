"""Benchmark: conditioned-flagship denoise throughput (frames/sec/chip).

Headline metric per BASELINE.md config #3: the full flagship denoise step —
42-layer dim-3072 DiT (17,776-token joint attention) WITH the face path
(LFE + 21 PerceiverCrossAttention + MultiIPRouter layers) and the audio path
(42 frame-local audio cross-attentions) enabled, CFG batch 2, bf16, Pallas
flash attention — on one TPU chip.  frames/sec/chip =
49 frames / (50 steps x measured step time).  The bare-DiT step time is
reported as a secondary field (`bare_step_ms`) for kernel-level tracking.

Reference hot path: `/root/reference/models/transformer.py:706-936`.

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


def build(conditioned: bool):
    from bindyouravatar_tpu.config import DiTConfig
    from bindyouravatar_tpu.models.dit import DiT

    cfg = DiTConfig(num_layers=42, is_train_face=conditioned,
                    is_train_audio=conditioned, fuse_qk_norm=True,
                    param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    zeros = lambda sub: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sub)
    prep_keys = ("lfe", "audio_statics")

    b = 2  # CFG batch
    t = cfg.latent_frames
    lat = jnp.zeros((b, t, cfg.in_channels, cfg.sample_height, cfg.sample_width),
                    jnp.bfloat16)
    text = jnp.zeros((b, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.bfloat16)
    ts = jnp.full((b,), 500.0)
    rope = dit.rope(480, 720, t)

    # pass everything as jit ARGS — closure constants get baked into the
    # graph and can exhaust HBM / stall the relay's remote compiler
    if not conditioned:
        params = zeros(shapes)
        f = jax.jit(lambda p, l, tx, s, r: dit.apply(p, l, tx, s, r)[0])
        call = lambda p, l: f(p, l, text, ts, rope)
        return call, params, lat

    # single-chip serving mode: the two CFG halves run as sequential b=1
    # forwards (same FLOPs as the batch-2 forward, half the activation HBM
    # — 13.4 GB of weights + batch-2 temps exceed one v5e)
    bh = 1
    lat = lat[:bh]
    text = text[:bh]
    ts = ts[:bh]
    lfe, a = dit.lfe_cfg, dit.audio_cfg
    id_cond = jnp.zeros((bh, cfg.num_ids, lfe.id_embed_dim), jnp.bfloat16)
    vit = jnp.zeros((bh, cfg.num_ids, lfe.num_scales, 577, lfe.vit_dim), jnp.bfloat16)
    n_af = cfg.sample_frames + a.window_size - a.window_stride
    audio = jnp.zeros((bh, cfg.num_ids, n_af, a.blocks, a.audio_dim), jnp.bfloat16)
    af = jnp.broadcast_to(jnp.eye(cfg.num_ids, dtype=jnp.bfloat16)[None],
                          (bh, cfg.num_ids, cfg.num_ids))

    # conditioning context once per clip (as the pipeline does): the LFE and
    # the 1.2B-param audio downsample run outside the 50-step loop, and their
    # params need not stay HBM-resident during the step (16.0 GiB of total
    # params otherwise exceeds one v5e) — materialise them alone, prep, free
    prep_params = {k: zeros(shapes[k]) for k in prep_keys}
    prep = jax.jit(lambda p, ic, v, au: dit.prepare_conditioning(
        p, id_cond=ic, id_vit_hidden=v, audio_embeds=au))
    face_emb, audio_ctx = prep(prep_params, id_cond, vit, audio)
    float(face_emb[0, 0, 0, 0])  # relay sync
    for leaf in jax.tree.leaves(prep_params):
        leaf.delete()
    del prep_params

    def fwd(p, l, tx, s, r, fe, ac, afm):
        out, _ = dit.apply(p, l, tx, s, r, face_emb=fe, audio_ctx=ac,
                           af_matrix=afm)
        return out

    # AOT-compile with AUTO argument layouts: XLA picks the layouts it wants
    # for the scan-stacked weight tensors (minor-dim = contracting dim), and
    # the params are MATERIALISED in that layout — without this, the loop
    # inserts ~4.0 GB of loop-invariant transposed copies of the 13.4 GB of
    # weights (measured) and one chip cannot hold both.
    from jax.experimental.layout import Format, Layout

    step_shapes = {k: v for k, v in shapes.items() if k not in prep_keys}
    arg_structs = (step_shapes,
                   jax.ShapeDtypeStruct(lat.shape, lat.dtype),
                   jax.ShapeDtypeStruct(text.shape, text.dtype),
                   jax.ShapeDtypeStruct(ts.shape, ts.dtype),
                   jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), rope),
                   jax.ShapeDtypeStruct(face_emb.shape, face_emb.dtype),
                   jax.ShapeDtypeStruct(audio_ctx.shape, audio_ctx.dtype),
                   jax.ShapeDtypeStruct(af.shape, af.dtype))
    compiled = (jax.jit(fwd, in_shardings=Format(Layout.AUTO))
                .lower(*arg_structs).compile())
    fmts, _ = compiled.input_formats
    params = jax.tree.map(
        lambda s, fmt: jax.device_put(jnp.zeros(s.shape, s.dtype), fmt),
        step_shapes, fmts[0])
    place = jax.tree.map(jax.device_put,
                         (lat, text, ts, rope, face_emb, audio_ctx, af),
                         fmts[1:])
    lat, text, ts, rope, face_emb, audio_ctx, af = place

    lat_fmt = fmts[1]

    def call(p, l):
        """One denoise step = uncond + cond forwards (sequential CFG)."""
        l = jax.device_put(l[:bh], lat_fmt)
        un = compiled(p, l, text, ts, rope, face_emb, audio_ctx, af)
        txt = compiled(p, l, text, ts, rope, face_emb, audio_ctx, af)
        return un + txt

    return call, params, lat


def time_step(f, params, lat, n=3):
    out = f(params, lat)
    float(out[0, 0, 0, 0, 0])  # sync (compile + first run)
    t0 = time.perf_counter()
    cur = lat
    for _ in range(n):
        out = f(params, cur)
        b = out.shape[0]
        cur = lat.at[:b, :, :16].set(out[:, :, :16].astype(jnp.bfloat16))  # dep chain
    float(out[0, 0, 0, 0, 0])  # sync
    return (time.perf_counter() - t0) / n


def _wait_for_relay():
    """The axon relay can be unreachable for stretches (CLAUDE.md round-3
    learnings); a hung in-process backend init can never be retried (the
    init lock stays held).  Probe in a SUBPROCESS with a short timeout and
    retry with backoff inside a bounded budget, so a transient outage during
    the driver's bench window still yields a measurement.  Only if the
    relay stays down for the whole budget do we exit 3 (clear stderr, no
    bogus JSON).

    Budget via BENCH_RELAY_BUDGET_S (default 2400 s), per-probe timeout via
    BENCH_RELAY_PROBE_S (default 150 s)."""
    import os
    import subprocess
    import sys

    budget = float(os.environ.get("BENCH_RELAY_BUDGET_S", "2400"))
    probe_s = float(os.environ.get("BENCH_RELAY_PROBE_S", "150"))
    deadline = time.monotonic() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_s, capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"bench: relay reachable after {attempt} probes",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"bench: relay unreachable for {budget:.0f}s "
                  f"({attempt} probes) — no measurement taken",
                  file=sys.stderr)
            os._exit(3)
        print(f"bench: relay probe {attempt} failed; retrying "
              f"({remaining:.0f}s left in budget)", file=sys.stderr)
        time.sleep(min(60.0, remaining))


def _backend_watchdog(timeout_s: float = 900.0):
    """Backstop AFTER a successful probe: if the relay dies between the
    probe and this process's own backend init, fail fast instead of
    hanging forever."""
    import os
    import sys
    import threading

    done = threading.Event()
    threading.Thread(target=lambda: (jax.devices(), done.set()),
                     daemon=True).start()
    if not done.wait(timeout_s):
        print(f"bench: TPU backend init exceeded {timeout_s:.0f}s — "
              f"relay unreachable, no measurement taken", file=sys.stderr)
        os._exit(3)


def main():
    import gc

    _wait_for_relay()
    _backend_watchdog()
    f_cond, p_cond, lat = build(conditioned=True)
    dt_cond = time_step(f_cond, p_cond, lat)
    del f_cond, p_cond, lat
    gc.collect()  # free the 13.4 GiB conditioned params before the bare run

    f_bare, p_bare, lat = build(conditioned=False)
    dt_bare = time_step(f_bare, p_bare, lat)

    fps = FRAMES / (STEPS_PER_CLIP * dt_cond)
    print(json.dumps({
        "metric": "flagship_conditioned_denoise_frames_per_sec_per_chip_49f_480p",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_EST, 3),
        "step_ms": round(dt_cond * 1e3, 1),
        "bare_step_ms": round(dt_bare * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
