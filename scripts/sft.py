"""Stage-3 fine-tune launcher (reference `sft.sh` + `train.py` main).

Wires the full training stack: dataset (reference on-disk layout or
synthetic), VAE, text embeddings (precomputed or T5), mesh, Trainer,
TrainDriver with auto-resume.  Hyperparameter defaults mirror sft.sh
(lr 1e-5, bf16, LoRA r128/a128, loss weights 1/8/0.002/0.0009/10/10,
ckpt every 100 steps).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--index_file", type=str, default=None,
                   help="training index txt (reference layout); omit for synthetic")
    p.add_argument("--output_dir", type=str, default="runs/sft")
    p.add_argument("--model_size", choices=["tiny", "5b"], default="tiny")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=10000)
    p.add_argument("--learning_rate", type=float, default=1e-5,
                   help="on --resume this OVERRIDES the stored LR while "
                        "keeping optimizer state (reference train.py:909-921)")
    p.add_argument("--text_drop_ratio", type=float, default=0.0,
                   help="prob of training with an empty caption "
                        "(reference dataloader.py:995-996, default off)")
    p.add_argument("--optimizer", choices=["adamw", "adafactor", "prodigy"],
                   default="adamw")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="block-wise int8 optimizer state (reference "
                        "train.py:244-279; training/adam8bit.py)")
    p.add_argument("--prodigy_beta3", type=float, default=None)
    p.add_argument("--prodigy_decouple", type=bool, default=True)
    p.add_argument("--prodigy_use_bias_correction", type=bool, default=False)
    p.add_argument("--prodigy_safeguard_warmup", type=bool, default=False)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=128.0)
    p.add_argument("--checkpointing_steps", type=int, default=100)
    p.add_argument("--checkpoints_total_limit", type=int, default=3)
    p.add_argument("--router_loss_weight", type=float, default=1.0)
    p.add_argument("--consistency_loss_weight", type=float, default=8.0)
    p.add_argument("--temporal_diff_loss_weight", type=float, default=0.002)
    p.add_argument("--spatial_diff_loss_weight", type=float, default=0.0009)
    p.add_argument("--spatial_dist_loss_weight", type=float, default=10.0)
    p.add_argument("--id_dist_loss_weight", type=float, default=10.0)
    p.add_argument("--mask_prob", type=float, default=0.2)
    p.add_argument("--index_mask_drop_prob", type=float, default=0.2)
    p.add_argument("--noised_image_dropout", type=float, default=0.05)
    p.add_argument("--no_image_noise", action="store_true",
                   help="disable mask-modulated conditioning-image noising "
                        "(reference process_image, train.py:1057-1079, is ON "
                        "by default)")
    p.add_argument("--no_stochastic_vae", action="store_true",
                   help="use the VAE posterior mode instead of sampling "
                        "(reference samples, train.py:1327-1337)")
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--remat_policy", choices=["none", "save_attn", "nested"],
                   default="none",
                   help="selective remat: save_attn keeps joint-attention "
                        "outputs across the backward (~113 MB bf16/layer "
                        "at flagship geometry)")
    p.add_argument("--fsdp", type=int, default=None,
                   help="fsdp axis size (default: all devices)")
    p.add_argument("--resume", type=str, default="latest")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--module_dir", type=str, default=None,
                   help="pretrained audio/face/router sub-modules")
    p.add_argument("--reference_transformer", type=str, nargs="*", default=None)
    p.add_argument("--num_validation_videos", type=int, default=0,
                   help="generate N validation videos at every checkpoint "
                        "(reference log_validation, train.py:103-203)")
    p.add_argument("--validation_steps", type=int, default=8,
                   help="inference steps per validation video")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import (DiTConfig, SchedulerConfig,
                                           TrainConfig, VAEConfig)
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.models.vae import CausalVAE
    from bindyouravatar_tpu.ops.scheduler import Schedule
    from bindyouravatar_tpu.parallel.mesh import create_mesh
    from bindyouravatar_tpu.training.data import AvatarVideoDataset, SyntheticAvatarDataset
    from bindyouravatar_tpu.training.train_loop import TrainDriver
    from bindyouravatar_tpu.training.trainer import Trainer

    cfg = TrainConfig(
        learning_rate=args.learning_rate, max_train_steps=args.max_train_steps,
        optimizer=args.optimizer, use_8bit_adam=args.use_8bit_adam,
        prodigy_beta3=args.prodigy_beta3,
        prodigy_decouple=args.prodigy_decouple,
        prodigy_use_bias_correction=args.prodigy_use_bias_correction,
        prodigy_safeguard_warmup=args.prodigy_safeguard_warmup,
        lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        router_loss_weight=args.router_loss_weight,
        consistency_loss_weight=args.consistency_loss_weight,
        temporal_diff_loss_weight=args.temporal_diff_loss_weight,
        spatial_diff_loss_weight=args.spatial_diff_loss_weight,
        spatial_dist_loss_weight=args.spatial_dist_loss_weight,
        id_dist_loss_weight=args.id_dist_loss_weight,
        mask_prob=args.mask_prob, index_mask_drop_prob=args.index_mask_drop_prob,
        noised_image_dropout=args.noised_image_dropout,
        image_noise=not args.no_image_noise,
        stochastic_vae=not args.no_stochastic_vae,
        ema_decay=args.ema_decay, seed=args.seed)

    if args.model_size == "tiny":
        dit = DiT.tiny(lora_rank=min(args.lora_rank, 8), in_channels=8, out_channels=4)
        vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16),
                                  layers_per_block=1, latent_channels=4,
                                  norm_num_groups=4, dtype=jnp.float32))
    else:
        dit = DiT.create(DiTConfig(
            lora_rank=args.lora_rank, lora_alpha=args.lora_alpha, remat=True,
            remat_policy=None if args.remat_policy == "none"
            else args.remat_policy))
        vae = CausalVAE(VAEConfig())

    n_dev = len(jax.devices())
    fsdp = args.fsdp or n_dev
    mesh = create_mesh(dp=n_dev // fsdp, fsdp=fsdp) if n_dev > 1 else None

    params = dit.init(jax.random.key(args.seed))
    if args.reference_transformer:
        from bindyouravatar_tpu.training.checkpoint import import_reference_dit

        params = import_reference_dit(args.reference_transformer, dit)
    if args.module_dir:
        from bindyouravatar_tpu.training.checkpoint import load_submodules

        params = load_submodules(params, args.module_dir)

    c = dit.cfg
    if args.index_file:
        dataset = AvatarVideoDataset(args.index_file, num_frames=c.sample_frames,
                                     text_drop_ratio=args.text_drop_ratio)
    else:
        dataset = SyntheticAvatarDataset(
            length=64, num_frames=c.sample_frames,
            height=c.sample_height * 8, width=c.sample_width * 8,
            audio_blocks=dit.audio_cfg.blocks, audio_dim=dit.audio_cfg.audio_dim)

    lfe = dit.lfe_cfg
    rngc = np.random.default_rng(args.seed)

    def extras(sample):
        """Text/face embeddings: precomputed path or deterministic stand-ins
        (real encoders drop in via TrainDriver.text_encode_fn/face_embed_fn)."""
        b = sample["video"].shape[0]
        return dict(
            text_embeds=rngc.normal(0, 1, (b, c.max_text_seq_length,
                                           c.text_embed_dim)).astype(np.float32),
            id_cond=rngc.normal(0, 1, (b, c.num_ids, lfe.id_embed_dim)).astype(np.float32),
            id_vit_hidden=rngc.normal(
                0, 1, (b, c.num_ids, lfe.num_scales, 9, lfe.vit_dim)).astype(np.float32))

    trainer = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()), cfg=cfg)
    vae_params = vae.init(jax.random.key(1))
    driver = TrainDriver(trainer=trainer, vae=vae, vae_params=vae_params,
                         cfg=cfg, output_dir=args.output_dir, mesh=mesh)

    validation_fn = None
    if args.num_validation_videos > 0:
        # every-checkpoint video validation (reference log_validation,
        # train.py:103-203, 1652-1732), generated from the live params
        from bindyouravatar_tpu.config import PipelineConfig
        from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline
        from bindyouravatar_tpu.training.validation import make_validation_fn

        pipe = BindYourAvatarPipeline.create(
            dit, vae, PipelineConfig(height=c.sample_height * 8,
                                     width=c.sample_width * 8,
                                     num_frames=c.sample_frames))
        val_pe = rngc.normal(0, 1, (1, c.max_text_seq_length,
                                    c.text_embed_dim)).astype(np.float32)
        validation_fn = make_validation_fn(
            pipe, vae_params, args.output_dir, val_pe,
            num_inference_steps=args.validation_steps,
            num_videos=args.num_validation_videos, seed=args.seed)

    driver.run(dataset, params, batch_size=args.batch_size,
               make_batch_extras=extras, resume=args.resume,
               validation_fn=validation_fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
