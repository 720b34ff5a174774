"""Validation-in-training + EMA tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bindyouravatar_tpu.config import (PipelineConfig, SchedulerConfig,
                                       TrainConfig, VAEConfig)
from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.models.vae import CausalVAE
from bindyouravatar_tpu.ops.scheduler import Schedule
from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline
from bindyouravatar_tpu.training.trainer import Trainer
from bindyouravatar_tpu.training.validation import make_validation_fn


def test_validation_fn_writes_video(tmp_path):
    dit = DiT.tiny(in_channels=8, out_channels=4)
    vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                              latent_channels=4, norm_num_groups=4,
                              dtype=jnp.float32))
    c = dit.cfg
    pipe = BindYourAvatarPipeline.create(
        dit, vae, PipelineConfig(height=c.sample_height * 8,
                                 width=c.sample_width * 8,
                                 num_frames=c.sample_frames,
                                 num_inference_steps=2))
    vae_params = vae.init(jax.random.key(1))
    pe = np.random.default_rng(0).normal(
        0, 1, (1, c.max_text_seq_length, c.text_embed_dim)).astype(np.float32)
    fn = make_validation_fn(pipe, vae_params, str(tmp_path), pe,
                            num_inference_steps=2)
    dit_params = dit.init(jax.random.key(0))
    fn(7, dit_params)
    assert os.path.isfile(str(tmp_path / "validation-7" / "video_0.mp4"))


def test_ema_updates():
    dit = DiT.tiny(lora_rank=2, in_channels=8, out_channels=4)
    cfg = TrainConfig(ema_decay=0.5, lr_warmup_steps=1, max_train_steps=4,
                      learning_rate=1e-2, index_mask_drop_prob=0.0,
                      grad_accum_steps=1)   # single-sample batch
    tr = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()), cfg=cfg)
    params = dit.init(jax.random.key(0))
    state, frozen = tr.init_state(params)
    assert state.ema_params is not None

    c = dit.cfg
    t = c.latent_frames
    ks = jax.random.split(jax.random.key(1), 4)
    batch = dict(
        video_latents=jax.random.normal(ks[0], (1, t, 4, c.sample_height, c.sample_width)),
        image_latents=jax.random.normal(ks[1], (1, t, 4, c.sample_height, c.sample_width)),
        prompt_embeds=jax.random.normal(ks[2], (1, c.max_text_seq_length, c.text_embed_dim)),
    )
    # two steps: step 0 runs at lr=0 (warmup), step 1 actually updates
    state1, _ = tr.train_step(state, frozen, batch, jax.random.key(3))
    state2, m = tr.train_step(state1, frozen, batch, jax.random.key(4))
    e = jax.tree.leaves(state2.ema_params)
    p = jax.tree.leaves(state2.params)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(e, p)]
    assert any(d > 0 for d in diffs)     # ema lags params
    assert np.isfinite(float(m["loss"]))
