"""Prove the FSDP sharding rules at FLAGSHIP geometry on the virtual CPU mesh.

Executing a 42-layer 17,776-token train step on one CPU core would take
days, so this AOT-compiles the full jitted FSDP train step (dp2 x fsdp4,
real shapes, zero values) and reports the compiled memory analysis — the
SPMD partitioner validates every sharding rule and the per-device HBM
budget the same step would need on a real v5e-8 slice (VERDICT r2 #6b).

    python tools/flagship_shard_check.py [num_layers=42]
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


if __name__ == "__main__":
    main()
