"""Inference CLI (reference `infer.py:33-528`).

Flow (reference call stack §3.1): build models -> face preprocessing ->
audio embedding load -> pipeline stage 1 -> optional two-stage (mask
tracking -> routing forcing -> stage 2) -> video export -> a/v mux.

Pretrained-weight notes: checkpoints load via `--checkpoint_dir` (orbax
tree incl. audio/face/router sub-modules) or `--reference_transformer`
(reference safetensors, converted on the fly).  Without weights the CLI
still runs end-to-end with random init (pipeline smoke / perf runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Bind-Your-Avatar TPU inference")
    # model
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="orbax checkpoint dir (full param tree)")
    p.add_argument("--module_dir", type=str, default=None,
                   help="dir with {audio,face,router}_modules sub-checkpoints")
    p.add_argument("--reference_transformer", type=str, nargs="*", default=None,
                   help="reference sharded safetensors for the base DiT")
    p.add_argument("--reference_audio_modules", type=str, default=None,
                   help="reference audio_modules.pt")
    p.add_argument("--reference_face_modules", type=str, default=None,
                   help="reference face_modules.pt")
    p.add_argument("--reference_router_modules", type=str, default=None,
                   help="reference router_modules.pt")
    # face preprocessing stack weights (reference infer.py:240-270 parity)
    p.add_argument("--retinaface_checkpoint", type=str, default=None,
                   help="facexlib detection_Resnet50_Final.pth")
    p.add_argument("--bisenet_checkpoint", type=str, default=None,
                   help="facexlib parsing_bisenet.pth (background whiteout)")
    p.add_argument("--arcface_checkpoint", type=str, default=None,
                   help="insightface IR-100 torch checkpoint (glintr100)")
    p.add_argument("--num_layers", type=int, default=42)
    p.add_argument("--model_size", choices=["tiny", "5b"], default="5b")
    # inputs (reference flags :456-499)
    p.add_argument("--img_file_path", type=str, nargs="*", default=[],
                   help="exactly 2 face images for the two-character flow")
    p.add_argument("--inpaintingframe_path", type=str, default=None)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--audio_path", type=str, nargs="*", default=[],
                   help="1-2 audio embedding .pt files")
    p.add_argument("--wav_path", type=str, nargs="*", default=[])
    p.add_argument("--speaker_pos", choices=["left", "right"], default="left")
    p.add_argument("--mute_audio_path", type=str, default=None,
                   help="mute fixture .pt (required for single-track audio)")
    p.add_argument("--prompt_embeds", type=str, default=None,
                   help="precomputed T5 embeddings .npy [1,226,4096]")
    p.add_argument("--negative_prompt_embeds", type=str, default=None,
                   help="precomputed negative T5 embeddings .npy (pairs with "
                        "--prompt_embeds; reference encodes a real negative "
                        "prompt, pipeline_bindyouravatar.py:295-374)")
    p.add_argument("--lora_path", type=str, nargs="*", default=None,
                   help="peft LoRA safetensors file(s) fused into the base "
                        "q/k kernels (reference infer.py:199,279)")
    p.add_argument("--lora_alpha", type=float, default=128.0,
                   help="LoRA alpha for fusion (reference r=128, alpha=128)")
    p.add_argument("--t5_dir", type=str, default=None,
                   help="local T5 checkpoint+tokenizer dir (zero-egress "
                        "environments: use --prompt_embeds instead)")
    # generation
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--two_stage_generate", action="store_true")
    p.add_argument("--tracking_mask_dir", type=str, default=None,
                   help="precomputed SAM2 mask dir for stage 2 forcing")
    p.add_argument("--zero2cond_cfg_flag", action="store_true")
    p.add_argument("--use_dynamic_cfg", action="store_true")
    p.add_argument("--scheduler", choices=["dpm", "ddim"], default="dpm")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--draw_routing_logits", action="store_true")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel chips for serving (the conditioned "
                        "flagship weights exceed one 16 GB chip)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel chips (ring attention) for "
                        ">49-frame generation")
    return p.parse_args(argv)


def build_models(args):
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import DiTConfig, PipelineConfig, VAEConfig
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.models.vae import CausalVAE
    from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.model_size == "tiny":
        # a bg inpainting frame occupies a third latent channel block
        # (reference `infer.py:48`: 16 noise + 16 image + 16 bg); the tiny
        # tier's VAE has 4 latent channels per block
        in_ch = 12 if args.inpaintingframe_path else 8
        dit = DiT.tiny(in_channels=in_ch, out_channels=4)
        vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16),
                                  layers_per_block=1, latent_channels=4,
                                  norm_num_groups=4, dtype=jnp.float32))
    else:
        cfg = DiTConfig(num_layers=args.num_layers, dtype=dt, param_dtype=dt)
        dit = DiT.create(cfg)
        vae = CausalVAE(VAEConfig(dtype=dt, param_dtype=jnp.float32))
    pipe_cfg = PipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, use_dynamic_cfg=args.use_dynamic_cfg,
        scheduler_type=args.scheduler, zero2cond_cfg=args.zero2cond_cfg_flag)
    pipe = BindYourAvatarPipeline.create(dit, vae, pipe_cfg)
    return pipe


def load_params(pipe, args):
    import jax

    from bindyouravatar_tpu.training.checkpoint import (import_reference_dit,
                                                        load_submodules,
                                                        restore_checkpoint)

    params = {"dit": pipe.dit.init(jax.random.key(0)),
              "vae": pipe.vae.init(jax.random.key(1))}
    if args.reference_transformer:
        params["dit"] = import_reference_dit(args.reference_transformer, pipe.dit)
    if args.checkpoint_dir:
        params = restore_checkpoint(args.checkpoint_dir, like=params)
    if args.module_dir:
        params["dit"] = load_submodules(params["dit"], args.module_dir)
    if (args.reference_audio_modules or args.reference_face_modules
            or args.reference_router_modules):
        from bindyouravatar_tpu.training.import_submodules import import_all_submodules

        params["dit"] = import_all_submodules(
            params["dit"], audio=args.reference_audio_modules,
            face=args.reference_face_modules,
            router=args.reference_router_modules)
    if args.lora_path:
        from bindyouravatar_tpu.training.checkpoint import fuse_lora_files

        params["dit"] = fuse_lora_files(args.lora_path, pipe.dit,
                                        params["dit"],
                                        lora_alpha=args.lora_alpha)
        print(f"[lora] fused {len(args.lora_path)} LoRA file(s) "
              f"(alpha={args.lora_alpha}) into the base q/k kernels")
    return params


def save_routing_debug(routing, grid, output_dir: str, fps: int):
    """Render per-layer routing masks of the FINAL denoise step plus the
    step-mean to mp4s (reference `draw_routing_logit`,
    `util/utils.py:771-784`, flag `infer.py:391`)."""
    from bindyouravatar_tpu.utils.media import save_routing_video

    if routing is None:
        print("[warn] --draw_routing_logits: the face/router path is off "
              "(no id conditioning) — no routing logits to draw",
              file=sys.stderr)
        return
    r = np.asarray(routing, np.float32)            # [steps, num_ca, B, S, I]
    dbg = os.path.join(output_dir, "routing_logits")
    os.makedirs(dbg, exist_ok=True)
    for layer in range(r.shape[1]):
        save_routing_video(r[-1, layer, 0], grid,
                           os.path.join(dbg, f"final_step_layer{layer:02d}.mp4"),
                           fps=fps)
    save_routing_video(r[:, :, 0].mean(axis=(0, 1)), grid,
                       os.path.join(dbg, "mean_over_steps_layers.mp4"), fps=fps)
    print(f"[routing] wrote {r.shape[1] + 1} mask videos to {dbg}")


def main(argv=None):
    args = get_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.preprocess.audio import load_precomputed
    from bindyouravatar_tpu.preprocess.face import build_default_processor
    from bindyouravatar_tpu.training.data import AUDIO_WINDOW_SLACK, af_matrix_from_speaker
    from bindyouravatar_tpu.utils.masks import masks_to_routing_logits
    from bindyouravatar_tpu.utils.media import export_to_video, merge_audio_video

    t0 = time.time()
    pipe = build_models(args)
    params = load_params(pipe, args)
    if args.tp > 1 and args.sp > 1:
        raise SystemExit("--tp and --sp build conflicting meshes over the "
                         "same chips; use one (combined tp x sp mesh is "
                         "future work, ROADMAP)")
    if args.tp > 1:
        from bindyouravatar_tpu.parallel.mesh import create_mesh
        from bindyouravatar_tpu.parallel.tp import shard_params_tp

        mesh = create_mesh(dp=1, fsdp=1, tp=args.tp,
                           devices=jax.devices()[:args.tp])
        params["dit"] = shard_params_tp(params["dit"], mesh)
        print(f"[tp] DiT params sharded over {args.tp} chips")
    if args.sp > 1:
        import dataclasses as _dc

        from jax.sharding import Mesh

        pipe = _dc.replace(pipe, sp_mesh=Mesh(
            np.asarray(jax.devices()[:args.sp]), ("sp",)))
        print(f"[sp] ring attention over {args.sp} chips")
    dit = pipe.dit
    c = dit.cfg

    # --- face conditioning -------------------------------------------------
    id_cond = id_vit = None
    canvas = None
    if args.img_file_path:
        assert len(args.img_file_path) == 2, "expect exactly 2 face images"
        import cv2

        proc = build_default_processor(
            retinaface_checkpoint=args.retinaface_checkpoint,
            bisenet_checkpoint=args.bisenet_checkpoint,
            arcface_checkpoint=args.arcface_checkpoint)
        imgs = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                for p in args.img_file_path]
        split = proc.process_split(imgs, (args.height, args.width))
        id_cond = jnp.asarray(split["id_cond"])
        id_vit = jnp.asarray(split["id_vit_hidden"])
        canvas = split["canvas"]

    # conditioning image: bg frame if given, else the composite canvas
    if args.inpaintingframe_path:
        import cv2

        bg = cv2.cvtColor(cv2.imread(args.inpaintingframe_path), cv2.COLOR_BGR2RGB)
        bg = cv2.resize(bg, (args.width, args.height))
        image_np = bg
        image_bg_np = bg
    else:
        image_np = canvas if canvas is not None else np.full(
            (args.height, args.width, 3), 255, np.uint8)
        image_bg_np = None

    def to_model_img(arr):
        x = arr.astype(np.float32) / 127.5 - 1.0
        return jnp.asarray(x.transpose(2, 0, 1))[None, None]   # [1,1,3,H,W]

    image = to_model_img(image_np)
    image_bg = to_model_img(image_bg_np) if image_bg_np is not None else None

    # --- audio -------------------------------------------------------------
    audio = mute = None
    af = None
    if args.audio_path:
        need = args.num_frames + AUDIO_WINDOW_SLACK
        tracks = []
        for p in args.audio_path:
            emb = load_precomputed(p)
            pad = np.zeros((need,) + emb.shape[1:], np.float32)
            pad[: min(need, emb.shape[0])] = emb[:need]
            tracks.append(pad)
        audio = jnp.asarray(np.stack(tracks)[None])             # [1,n,A,12,768]
        if len(tracks) == 1:
            if not args.mute_audio_path:
                raise SystemExit("single audio track requires --mute_audio_path")
            m = load_precomputed(args.mute_audio_path)[:need]
            mp = np.zeros((need,) + m.shape[1:], np.float32)
            mp[: m.shape[0]] = m
            mute = jnp.asarray(mp)
        af = jnp.asarray(af_matrix_from_speaker(args.speaker_pos == "left",
                                                c.num_ids)[None])

    # --- text --------------------------------------------------------------
    if args.prompt_embeds:
        pe = jnp.asarray(np.load(args.prompt_embeds))
        if args.negative_prompt_embeds:
            ne = jnp.asarray(np.load(args.negative_prompt_embeds))
            assert ne.shape == pe.shape, (
                f"negative embeds {ne.shape} != prompt embeds {pe.shape}")
        else:
            print("[warn] no --negative_prompt_embeds: using ZERO negative "
                  "embeddings (the reference encodes a real negative prompt "
                  "— CFG quality differs)", file=sys.stderr)
            ne = jnp.zeros_like(pe)
    elif args.t5_dir:
        from bindyouravatar_tpu.models.t5 import encode_prompts
        from bindyouravatar_tpu.training.import_encoders import import_t5_encoder

        wfile = None
        for cand in ("model.safetensors", "pytorch_model.bin"):
            pth = os.path.join(args.t5_dir, cand)
            if os.path.isfile(pth):
                wfile = pth
                break
        if wfile is None:
            raise SystemExit(f"no T5 weights found under {args.t5_dir}")
        t5_params = import_t5_encoder(wfile)
        pe = encode_prompts(t5_params, [args.prompt], args.t5_dir,
                            max_length=c.max_text_seq_length)
        ne = encode_prompts(t5_params, [args.negative_prompt], args.t5_dir,
                            max_length=c.max_text_seq_length)
    else:
        # no local T5 weights: zero embeddings keep the pipeline runnable
        print("[warn] no --prompt_embeds / --t5_dir: using ZERO text "
              "embeddings — output is UNCONDITIONED on the prompt (smoke / "
              "perf runs only)", file=sys.stderr)
        pe = jnp.zeros((1, c.max_text_seq_length, c.text_embed_dim))
        ne = jnp.zeros_like(pe)

    # --- routing forcing (two-stage or precomputed masks) -------------------
    forcing = None
    if args.tracking_mask_dir:
        t_lat, gh, gw = c.latent_grid
        forcing = jnp.asarray(masks_to_routing_logits(
            args.tracking_mask_dir, t_lat, gh, gw))

    cond = dict(id_cond=id_cond, id_vit_hidden=id_vit, audio_embeds=audio,
                mute_embeds=mute, af_matrix=af)

    key = jax.random.key(args.seed)
    if args.draw_routing_logits:
        video, routing = pipe.generate(
            params, pe, ne, image, key, image_bg=image_bg,
            routing_forcing=forcing, return_routing=True, **cond)
        save_routing_debug(routing, c.latent_grid, args.output_dir, args.fps)
    else:
        video = pipe.generate(params, pe, ne, image, key, image_bg=image_bg,
                              routing_forcing=forcing, **cond)
    out_path = os.path.join(args.output_dir, "output.mp4")
    export_to_video(np.asarray(video[0]), out_path, fps=args.fps)

    if args.two_stage_generate and args.tracking_mask_dir is None:
        # stage 2 needs masks from the stage-1 video: run the SAM2 tool as a
        # subprocess (reference `infer.py:372-383`); gated on availability
        import subprocess

        mask_dir = os.path.join(args.output_dir, "tracking_mask_results")
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "tools",
                                          "sam2_tools.py"),
             "--video", out_path, "--out_dir", mask_dir],
            capture_output=True, text=True)
        if r.returncode == 0 and os.path.isdir(os.path.join(mask_dir, "1")):
            t_lat, gh, gw = c.latent_grid
            forcing = jnp.asarray(masks_to_routing_logits(mask_dir, t_lat, gh, gw))
            video = pipe.generate(params, pe, ne, image, key, image_bg=image_bg,
                                  routing_forcing=forcing, **cond)
            export_to_video(np.asarray(video[0]), out_path, fps=args.fps)
        else:
            print(f"[two-stage] mask tool unavailable, keeping stage-1 output "
                  f"({r.stderr.strip().splitlines()[-1] if r.stderr else 'no masks'})")

    if args.wav_path:
        from bindyouravatar_tpu.utils.media import merge_audio_files

        wav = args.wav_path[0]
        if len(args.wav_path) > 1:
            wav = merge_audio_files(args.wav_path,
                                    os.path.join(args.output_dir, "mixed.wav"))
        final = os.path.join(args.output_dir, "output_av.mp4")
        merge_audio_video(out_path, wav, final)
        out_path = final

    meta = {"output": out_path, "seconds": round(time.time() - t0, 1),
            "frames": args.num_frames, "steps": args.num_inference_steps}
    print(json.dumps(meta))
    return out_path


if __name__ == "__main__":
    main()
