#!/usr/bin/env python
"""Train-step bench on the real chip (Stage-3 semantics, reduced depth).

Runs the CONDITIONED train step — v-pred loss + six routing losses,
Stage-3 freeze list (adapters/LoRA trainable, base DiT frozen), remat, real
480x720 latent geometry — at a reduced layer count, and reports per-layer
cost.  Single-chip probe uses bf16 params AND bf16 adam moments: the
repo-default fp32-master configuration needs 22.4 GB at 6 layers (measured
OOM vs 15.75 GB HBM) and belongs on the v5e-8 FSDP slice, where params and
optimizer state shard 8-way (`__graft_entry__.dryrun_multichip` exercises
that path; the CPU mesh can't give real step times).

    python tools/train_bench.py [num_layers=6]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import (DiTConfig, SchedulerConfig,
                                           TrainConfig)
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.ops.scheduler import Schedule
    from bindyouravatar_tpu.training.trainer import Trainer

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    optimizer = sys.argv[2] if len(sys.argv) > 2 else "adamw"
    remat_policy = sys.argv[3] if len(sys.argv) > 3 else None
    ff_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # bf16 params + moments: the single-chip-feasible probe (see docstring);
    # at 42 layers pass `adafactor` — factored second moments drop the
    # optimizer state from 2x trainable to ~sqrt sizes
    cfg = DiTConfig(num_layers=n_layers, cross_attn_interval=2,
                    audio_attn_interval=1, remat=True,
                    remat_policy=remat_policy, ff_chunks=ff_chunks,
                    use_flash_attention=True,
                    param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    trainer = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()),
                      cfg=TrainConfig(lr_warmup_steps=1, max_train_steps=8,
                                      grad_accum_steps=1, optimizer=optimizer))

    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    state, frozen = trainer.init_state(params)

    b = 1
    t = cfg.latent_frames
    a = dit.audio_cfg
    lfe = dit.lfe_cfg
    s_tok = cfg.video_seq_len
    n_af = cfg.sample_frames + a.window_size - a.window_stride
    ks = jax.random.split(jax.random.key(1), 10)
    batch = dict(
        video_latents=jax.random.normal(
            ks[0], (b, t, 16, cfg.sample_height, cfg.sample_width)),
        image_latents=jax.random.normal(
            ks[1], (b, t, 16, cfg.sample_height, cfg.sample_width)),
        bg_latents=jax.random.normal(
            ks[9], (b, t, 16, cfg.sample_height, cfg.sample_width)),
        prompt_embeds=jax.random.normal(
            ks[2], (b, cfg.max_text_seq_length, cfg.text_embed_dim)),
        id_cond=jax.random.normal(ks[3], (b, cfg.num_ids, lfe.id_embed_dim)),
        id_vit_hidden=jax.random.normal(
            ks[4], (b, cfg.num_ids, lfe.num_scales, 577, lfe.vit_dim)),
        audio_embeds=jax.random.normal(
            ks[5], (b, cfg.num_ids, n_af, a.blocks, a.audio_dim)),
        af_matrix=jnp.broadcast_to(jnp.eye(cfg.num_ids)[None],
                                   (b, cfg.num_ids, cfg.num_ids)),
        teacher_clean=(jax.random.uniform(ks[6], (b, s_tok, cfg.num_ids))
                       > 0.5).astype(jnp.float32),
        teacher_noisy=jax.random.uniform(ks[7], (b, s_tok, cfg.num_ids)),
        dense_mask=(jax.random.uniform(
            ks[8], (b, t, cfg.sample_height, cfg.sample_width))
            > 0.5).astype(jnp.float32),
    )

    step = trainer.jit_train_step()
    t0 = time.time()
    state, metrics = step(state, frozen, batch, jax.random.key(2))
    loss = float(metrics["loss"])          # sync (relay-safe scalar fetch)
    compile_s = time.time() - t0

    n, t0 = 3, time.time()
    for i in range(n):
        state, metrics = step(state, frozen, batch, jax.random.key(3 + i))
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / n
    print(json.dumps({
        "train_step_s": round(dt, 2),
        "num_layers": n_layers,
        "per_layer_ms": round(dt / n_layers * 1e3, 1),
        "loss": round(loss, 4),
        "compile_s": round(compile_s, 1),
        "conditioned": True,
        "remat": True,
        "remat_policy": remat_policy,
        "optimizer": optimizer,
        "dtypes": "bf16 params+moments (single-chip probe)",
    }))


if __name__ == "__main__":
    main()
