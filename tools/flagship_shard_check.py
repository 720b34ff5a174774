"""Prove the FSDP / TP sharding rules at FLAGSHIP geometry on the virtual mesh.

Executing a 42-layer 17,776-token train step on one CPU core would take
days, so this AOT-compiles the full jitted FSDP train step (dp2 x fsdp4,
real shapes, zero values) and reports the compiled memory analysis — the
SPMD partitioner validates every sharding rule and the per-device HBM
budget the same step would need on a real v5e-8 slice (VERDICT r2 #6b).

`tp` mode AOT-compiles the CONDITIONED serving forward (CFG batch 2) with
Megatron-TP-sharded DiT params over a tp=8 mesh — the `infer.py --tp`
serving configuration at flagship geometry (VERDICT r2 weak #5).

    python tools/flagship_shard_check.py [num_layers=42] [fsdp|tp]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from __graft_entry__ import _force_cpu_devices
    _force_cpu_devices(8)

    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import (DiTConfig, SchedulerConfig,
                                           TrainConfig)
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.ops.scheduler import Schedule
    from bindyouravatar_tpu.parallel.mesh import create_mesh
    from bindyouravatar_tpu.parallel.sharding import shard_bytes
    from bindyouravatar_tpu.training.trainer import Trainer

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    mode = sys.argv[2] if len(sys.argv) > 2 else "fsdp"
    if mode == "tp":
        return tp_check(n_layers)
    cfg = DiTConfig(num_layers=n_layers, remat=True,
                    param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    trainer = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()),
                      cfg=TrainConfig(lr_warmup_steps=1, grad_accum_steps=1))
    mesh = create_mesh(dp=2, fsdp=4)

    t0 = time.time()
    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    state, frozen = trainer.init_state(params, mesh=mesh)
    sb = shard_bytes(params, mesh)
    print(f"[shard] params total {sb['total']/2**30:.2f} GiB, "
          f"sharded {sb['sharded']/2**30:.2f} GiB, "
          f"per-device {sb['per_device']/2**30:.2f} GiB "
          f"(placed in {time.time()-t0:.0f}s)", flush=True)

    b = 8  # one sample per device (batch shards over dp x fsdp)
    t = cfg.latent_frames
    a, lfe = dit.audio_cfg, dit.lfe_cfg
    s_tok = cfg.video_seq_len
    n_af = cfg.sample_frames + a.window_size - a.window_stride
    z = lambda sh, dt=jnp.float32: jnp.zeros(sh, dt)
    batch = trainer.place_batch(dict(
        video_latents=z((b, t, 16, cfg.sample_height, cfg.sample_width)),
        image_latents=z((b, t, 16, cfg.sample_height, cfg.sample_width)),
        bg_latents=z((b, t, 16, cfg.sample_height, cfg.sample_width)),
        prompt_embeds=z((b, cfg.max_text_seq_length, cfg.text_embed_dim)),
        id_cond=z((b, cfg.num_ids, lfe.id_embed_dim)),
        id_vit_hidden=z((b, cfg.num_ids, lfe.num_scales, 577, lfe.vit_dim)),
        audio_embeds=z((b, cfg.num_ids, n_af, a.blocks, a.audio_dim)),
        af_matrix=jnp.broadcast_to(jnp.eye(cfg.num_ids)[None],
                                   (b, cfg.num_ids, cfg.num_ids)),
        teacher_clean=z((b, s_tok, cfg.num_ids)),
        teacher_noisy=z((b, s_tok, cfg.num_ids)),
        dense_mask=z((b, t, cfg.sample_height, cfg.sample_width)),
    ), mesh)

    t0 = time.time()
    step = trainer.jit_train_step()
    lowered = step.lower(state, frozen, batch, jax.random.key(1))
    print(f"[shard] lowered in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        ma = compiled.memory_analysis()
        mem = dict(
            argument_gib=round(ma.argument_size_in_bytes / 2**30, 2),
            output_gib=round(ma.output_size_in_bytes / 2**30, 2),
            temp_gib=round(ma.temp_size_in_bytes / 2**30, 2),
        )
    except Exception as e:   # noqa: BLE001 — per-backend availability
        mem = {"memory_analysis": f"unavailable: {e}"}
    print(json.dumps({
        "flagship_fsdp_compile": "ok",
        "num_layers": n_layers,
        "mesh": "dp2xfsdp4 (8 virtual CPU devices)",
        "params_per_device_gib": round(sb["per_device"] / 2**30, 2),
        "compile_s": round(compile_s, 1),
        **mem,
    }))


def tp_check(n_layers: int):
    """AOT-compile the conditioned CFG-batch-2 serving forward with
    Megatron-TP-sharded params on a tp=8 virtual mesh (`infer.py --tp 8`)."""
    from __graft_entry__ import _force_cpu_devices
    _force_cpu_devices(8)

    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import DiTConfig
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.parallel.mesh import create_mesh
    from bindyouravatar_tpu.parallel.tp import shard_params_tp

    cfg = DiTConfig(num_layers=n_layers, param_dtype=jnp.bfloat16,
                    dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    mesh = create_mesh(dp=1, fsdp=1, tp=8)

    t0 = time.time()
    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = shard_params_tp(params, mesh)
    print(f"[tp] params placed in {time.time()-t0:.0f}s", flush=True)

    b = 2  # CFG batch — the TP slice has the activation headroom
    t = cfg.latent_frames
    lfe, a = dit.lfe_cfg, dit.audio_cfg
    lat = jnp.zeros((b, t, cfg.in_channels, cfg.sample_height,
                     cfg.sample_width), jnp.bfloat16)
    text = jnp.zeros((b, cfg.max_text_seq_length, cfg.text_embed_dim),
                     jnp.bfloat16)
    ts = jnp.full((b,), 500.0)
    rope = dit.rope(480, 720, t)
    n_af = cfg.sample_frames + a.window_size - a.window_stride
    fe_s, ac_s = jax.eval_shape(
        lambda p, ic, v, au: dit.prepare_conditioning(
            p, id_cond=ic, id_vit_hidden=v, audio_embeds=au),
        {k: shapes[k] for k in ("lfe", "audio_statics")},
        jax.ShapeDtypeStruct((b, cfg.num_ids, lfe.id_embed_dim), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, cfg.num_ids, lfe.num_scales, 577,
                              lfe.vit_dim), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, cfg.num_ids, n_af, a.blocks, a.audio_dim),
                             jnp.bfloat16))
    fe = jnp.zeros(fe_s.shape, fe_s.dtype)
    ac = jnp.zeros(ac_s.shape, ac_s.dtype)
    af = jnp.broadcast_to(jnp.eye(cfg.num_ids, dtype=jnp.bfloat16)[None],
                          (b, cfg.num_ids, cfg.num_ids))
    step_params = {k: v for k, v in params.items()
                   if k not in ("lfe", "audio_statics")}

    def fwd(p, l, tx, s, r, fe_, ac_, afm):
        out, _ = dit.apply(p, l, tx, s, r, face_emb=fe_, audio_ctx=ac_,
                           af_matrix=afm)
        return out

    t0 = time.time()
    lowered = jax.jit(fwd).lower(step_params, lat, text, ts, rope, fe, ac, af)
    print(f"[tp] lowered in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    out_sh = compiled.output_shardings
    try:
        ma = compiled.memory_analysis()
        mem = dict(argument_gib=round(ma.argument_size_in_bytes / 2**30, 2),
                   temp_gib=round(ma.temp_size_in_bytes / 2**30, 2))
    except Exception as e:   # noqa: BLE001 — per-backend availability
        mem = {"memory_analysis": f"unavailable: {e}"}
    # compile-only (like the FSDP mode): executing 42 flagship layers on
    # CPU cores is days of work; execution-at-scale is covered by
    # `dryrun_multichip`'s TP serving forward at reduced depth
    print(json.dumps({
        "flagship_tp_compile": "ok",
        "num_layers": n_layers,
        "mesh": "tp8 (8 virtual CPU devices)",
        "cfg_batch": b,
        "compile_s": round(compile_s, 1),
        "output_sharding": str(out_sh),
        **mem,
    }))


if __name__ == "__main__":
    main()
