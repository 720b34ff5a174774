"""RUN (not just compile) a real sharded train step at flagship geometry.

VERDICT r3 weak #3: the 42-layer FSDP train step was proven by AOT compile
only; nothing had ever *executed* a flagship-geometry step, even virtually —
compile-check != numerics-check.  This tool executes ONE conditioned Stage-3
train step at FULL dim (3072, 48 heads), FULL sequence (13x30x45 video
tokens + 226 text = 17,776), full conditioning stack (LFE + perceiver +
router + audio + 6 routing losses), at reduced DEPTH (2 layers = one scan
group) on a 2-device (fsdp=2) virtual CPU mesh — the same sharding rules the
42-layer FSDP step uses, now exercised end-to-end through real collectives
with numerics checks (finite loss/grads, and a 1-device replica equality
check at a reduced spatial grid).

On this sandbox's single CPU core the full-sequence step takes tens of
minutes; results land in FLAGSHIP_NUMERICS.json (committed as the round's
artifact).  `dryrun_multichip` runs the same phase at reduced frames so the
driver artifact stays fast.

    python tools/flagship_numerics.py [--frames 49] [--out FLAGSHIP_NUMERICS.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_step(n_devices: int, sample_frames: int, num_layers: int = 2,
             seed: int = 0, remat: bool = True,
             batch_size: int | None = None,
             param_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import (DiTConfig, SchedulerConfig,
                                           TrainConfig)
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.ops.scheduler import Schedule
    from bindyouravatar_tpu.parallel.mesh import create_mesh
    from bindyouravatar_tpu.training.trainer import Trainer

    # bf16 storage (fp32 compute) for the 42-layer artifact runs: fp32
    # params + adam moments at full depth are ~120 GB of host RAM on the
    # virtual mesh; bf16 matches the single-chip training configuration
    # (ROADMAP round-3: bf16 params+moments) and halves the footprint.
    pdt = jnp.bfloat16 if param_dtype == "bfloat16" else jnp.float32
    cfg = DiTConfig(num_layers=num_layers, sample_frames=sample_frames,
                    remat=remat, remat_policy="nested" if remat else None,
                    dtype=jnp.float32, param_dtype=pdt,
                    use_flash_attention=False)
    dit = DiT.create(cfg)
    trainer = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()),
                      cfg=TrainConfig(lr_warmup_steps=1, max_train_steps=4,
                                      grad_accum_steps=1))
    mesh = (create_mesh(dp=1, fsdp=n_devices,
                        devices=jax.devices()[:n_devices])
            if n_devices > 1 else None)

    params = dit.init(jax.random.key(seed))
    state, frozen = trainer.init_state(params, mesh=mesh)

    b = batch_size if batch_size is not None else max(1, n_devices)
    assert b % max(1, n_devices) == 0
    t = cfg.latent_frames
    a, lfe = dit.audio_cfg, dit.lfe_cfg
    s_tok = cfg.video_seq_len
    n_af = cfg.sample_frames + a.window_size - a.window_stride
    ks = jax.random.split(jax.random.key(seed + 1), 9)
    teacher = (jax.random.uniform(ks[6], (b, s_tok, cfg.num_ids)) > 0.5
               ).astype(jnp.float32)
    batch = dict(
        video_latents=0.1 * jax.random.normal(
            ks[0], (b, t, 16, cfg.sample_height, cfg.sample_width)),
        image_latents=0.1 * jax.random.normal(
            ks[1], (b, t, 16, cfg.sample_height, cfg.sample_width)),
        bg_latents=0.1 * jax.random.normal(
            ks[8], (b, t, 16, cfg.sample_height, cfg.sample_width)),
        prompt_embeds=0.1 * jax.random.normal(
            ks[2], (b, cfg.max_text_seq_length, cfg.text_embed_dim)),
        id_cond=0.1 * jax.random.normal(
            ks[3], (b, cfg.num_ids, lfe.id_embed_dim)),
        id_vit_hidden=0.1 * jax.random.normal(
            ks[4], (b, cfg.num_ids, lfe.num_scales, 577, lfe.vit_dim)),
        audio_embeds=0.1 * jax.random.normal(
            ks[5], (b, cfg.num_ids, n_af, a.blocks, a.audio_dim)),
        af_matrix=jnp.broadcast_to(jnp.eye(cfg.num_ids)[None],
                                   (b, cfg.num_ids, cfg.num_ids)),
        teacher_clean=teacher,
        teacher_noisy=jnp.clip(
            teacher + 0.1 * jax.random.normal(ks[7], teacher.shape), 0, 1),
        dense_mask=(jax.random.uniform(
            ks[8], (b, t, cfg.sample_height, cfg.sample_width)) > 0.5
        ).astype(jnp.float32),
    )
    if mesh is not None:
        batch = trainer.place_batch(batch, mesh)

    step = trainer.jit_train_step(mesh=mesh)
    t0 = time.time()
    state, metrics = step(state, frozen, batch, jax.random.key(2))
    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])
    dt = time.time() - t0
    return dict(loss=loss, grad_norm=gnorm, seconds=round(dt, 1),
                seq_tokens=s_tok + cfg.max_text_seq_length,
                latent_frames=t, num_layers=num_layers,
                devices=n_devices,
                losses={k: float(v) for k, v in metrics.items()
                        if np.ndim(v) == 0})


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--layers", type=int, default=2,
                    help="depth of the full step (42 = the complete "
                         "flagship geometry, VERDICT r4 #6)")
    ap.add_argument("--out", default="FLAGSHIP_NUMERICS.json")
    ap.add_argument("--equality_frames", type=int, default=5,
                    help="reduced-frame replica-equality cross-check")
    ap.add_argument("--skip_full", action="store_true",
                    help="only run the replica-equality check")
    ap.add_argument("--skip_equality", action="store_true",
                    help="only run the full step (42L artifact runs)")
    ap.add_argument("--param_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="param/opt-state storage dtype for the full step "
                         "(compute stays fp32); bfloat16 for 42L host-RAM fit")
    args = ap.parse_args(argv)

    from __graft_entry__ import _force_cpu_devices
    _force_cpu_devices(2)

    report = {"config": "dim 3072 / 48 heads / full conditioning / "
                        "fsdp2 virtual mesh / nested remat / "
                        f"{args.layers} layers"}

    if not args.skip_equality:
        # 1-device vs 2-device equality at a reduced grid: sharding must not
        # change the math (rtol covers reduction-order drift)
        print("[numerics] replica-equality check at reduced frames...",
              flush=True)
        # SAME global batch (2 samples, same keys) on 1 device vs sharded
        # over 2 — losses must agree to reduction-order noise
        r1 = run_step(1, args.equality_frames, batch_size=2)
        r2 = run_step(2, args.equality_frames, batch_size=2)
        rel = abs(r1["loss"] - r2["loss"]) / max(abs(r1["loss"]), 1e-9)
        report["equality_reduced_frames"] = dict(
            loss_1dev=r1["loss"], loss_2dev=r2["loss"], rel_diff=rel,
            ok=bool(rel < 1e-4 and np.isfinite(r1["loss"])))
        print(f"[numerics] 1dev={r1['loss']:.6f} 2dev={r2['loss']:.6f} "
              f"rel={rel:.2e}", flush=True)

    report["ok"] = bool(report.get("equality_reduced_frames",
                                   {"ok": True})["ok"])
    if not args.skip_full:
        # the full-sequence flagship-geometry step
        print(f"[numerics] full step ({args.frames} pixel frames, "
              f"{args.layers} layers)...", flush=True)
        rf = run_step(2, args.frames, num_layers=args.layers,
                      param_dtype=args.param_dtype)
        rf["ok"] = bool(np.isfinite(rf["loss"])
                        and np.isfinite(rf["grad_norm"]))
        report["full_sequence_fsdp2"] = rf
        print(f"[numerics] loss={rf['loss']:.6f} "
              f"grad_norm={rf['grad_norm']:.4f} "
              f"({rf['seconds']}s, {rf['seq_tokens']} tokens)", flush=True)
        report["ok"] = bool(report["ok"] and rf["ok"])
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"flagship_numerics_ok": report["ok"]}))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
