"""Data pipeline + end-to-end training-loop tests (synthetic data)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.config import SchedulerConfig, TrainConfig, VAEConfig
from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.models.vae import CausalVAE
from bindyouravatar_tpu.ops.scheduler import Schedule
from bindyouravatar_tpu.training.data import (PrefetchLoader, ResumableSampler,
                                              SyntheticAvatarDataset,
                                              af_matrix_from_speaker, collate,
                                              load_audio_embedding,
                                              short_resize_and_pad)
from bindyouravatar_tpu.training.train_loop import TrainDriver
from bindyouravatar_tpu.training.trainer import Trainer


def test_resumable_sampler_roundtrip():
    s = ResumableSampler(10, shuffle=True, seed=3)
    it = iter(s)
    first = [next(it) for _ in range(7)]
    state = s.state_dict()

    s2 = ResumableSampler(10, shuffle=True, seed=3)
    s2.load_state_dict(state)
    it2 = iter(s2)
    rest2 = [next(it2) for _ in range(5)]
    rest1 = [next(it) for _ in range(5)]
    assert rest1 == rest2
    # full epoch covers all indices exactly once
    s3 = ResumableSampler(10, shuffle=True, seed=0)
    idxs = [next(iter(s3)) for _ in range(1)]
    it3 = iter(ResumableSampler(10, shuffle=True, seed=0))
    epoch = [next(it3) for _ in range(10)]
    assert sorted(epoch) == list(range(10))


def test_short_resize_and_pad():
    frames = np.full((2, 100, 100, 3), 255, np.uint8)
    out = short_resize_and_pad(frames, 48, 72)
    assert out.shape == (2, 48, 72, 3)
    assert out.max() <= 1.0 and out.min() >= -1.0
    # square input into wide output: letterboxed columns are -1
    assert np.allclose(out[:, :, 0], -1.0)
    assert np.allclose(out[:, :, 36], 1.0)


def test_af_matrix():
    np.testing.assert_array_equal(af_matrix_from_speaker(True), np.eye(2))
    np.testing.assert_array_equal(af_matrix_from_speaker(False), 1 - np.eye(2))


def test_load_audio_embedding_pt_contract(tmp_path):
    import torch

    emb = torch.randn(30, 12, 768)
    p = str(tmp_path / "a.pt")
    torch.save(emb, p)
    out = load_audio_embedding(p, start=0, num_pixel_frames=9)
    assert out.shape == (13, 12, 768)
    # first two rows zero-padded (start-2, start-1 out of range)
    assert np.abs(out[:2]).max() == 0.0
    np.testing.assert_allclose(out[2], emb[0].numpy(), atol=1e-6)


def test_prefetch_loader_and_collate():
    ds = SyntheticAvatarDataset(length=8)
    loader = PrefetchLoader(ds, ResumableSampler(len(ds), shuffle=False), 2)
    batch = next(loader)
    assert batch["video"].shape[0] == 2
    assert batch["audio"].shape == (2, 2, 13, 12, 768)
    assert isinstance(batch["prompt"], list)
    loader.close()


def test_noised_conditioning_image_math():
    """`noised_conditioning_image` == a literal numpy mirror of the
    reference `process_image` (train.py:1057-1079): sigma = exp(N(mean,
    std)) per batch element, noise gated by the first-frame dense mask."""
    from bindyouravatar_tpu.training.train_loop import noised_conditioning_image

    rng = np.random.default_rng(5)
    img = rng.normal(0, 0.5, (2, 1, 3, 8, 10)).astype(np.float32)
    mask = (rng.uniform(size=(2, 8, 10)) > 0.5).astype(np.float32)

    out = noised_conditioning_image(img, mask, np.random.default_rng(77),
                                    mean=-1.0, std=0.5)

    # mirror with the same rng consumption order
    r2 = np.random.default_rng(77)
    sigma = np.exp(r2.normal(-1.0, 0.5, size=(2, 1, 1, 1, 1)))
    noise = r2.standard_normal(img.shape) * sigma
    expect = img + noise * mask[:, None, None]
    np.testing.assert_allclose(out, expect.astype(np.float32), atol=1e-7)

    # mask gates exactly: pixels with mask==0 are untouched
    gated = np.broadcast_to(mask[:, None, None], img.shape) == 0.0
    np.testing.assert_array_equal(out[gated], img[gated])
    assert np.abs(out - img)[~gated].max() > 0.0

    # unmasked variant (reference mean=-3 path) perturbs everything
    out2 = noised_conditioning_image(img, None, np.random.default_rng(1),
                                     mean=-3.0, std=0.5)
    assert np.all(np.abs(out2 - img) > 0.0)


def test_prepare_batch_image_noise_and_stochastic_vae(tmp_path):
    """prepare_batch applies the conditioning-image noising + stochastic
    VAE sampling (reference train.py:1057-1079, 1327-1337); both are
    rng-driven and flag-gated back to deterministic."""
    dit = DiT.tiny(lora_rank=0, in_channels=8, out_channels=4)
    vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16),
                              layers_per_block=1, latent_channels=4,
                              norm_num_groups=4, dtype=jnp.float32))
    vae_params = vae.init(jax.random.key(1))
    c = dit.cfg
    ds = SyntheticAvatarDataset(
        length=2, num_frames=c.sample_frames,
        height=c.sample_height * 8, width=c.sample_width * 8,
        audio_blocks=dit.audio_cfg.blocks, audio_dim=dit.audio_cfg.audio_dim)
    sample = collate([ds[0]])

    def mk(cfg):
        tr = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()),
                     cfg=cfg)
        return TrainDriver(trainer=tr, vae=vae, vae_params=vae_params,
                           cfg=cfg, output_dir=str(tmp_path))

    text = np.zeros((1, c.max_text_seq_length, c.text_embed_dim), np.float32)

    det = mk(TrainConfig(image_noise=False, stochastic_vae=False))
    b1 = det.prepare_batch(sample, np.random.default_rng(0), text_embeds=text)
    b2 = det.prepare_batch(sample, np.random.default_rng(1), text_embeds=text)
    np.testing.assert_array_equal(np.asarray(b1["video_latents"]),
                                  np.asarray(b2["video_latents"]))
    np.testing.assert_array_equal(np.asarray(b1["image_latents"]),
                                  np.asarray(b2["image_latents"]))

    ref = mk(TrainConfig())            # reference behavior: both ON
    r1 = ref.prepare_batch(sample, np.random.default_rng(0), text_embeds=text)
    r2 = ref.prepare_batch(sample, np.random.default_rng(1), text_embeds=text)
    assert np.abs(np.asarray(r1["video_latents"])
                  - np.asarray(r2["video_latents"])).max() > 1e-6
    assert np.abs(np.asarray(r1["image_latents"])
                  - np.asarray(r2["image_latents"])).max() > 1e-6
    # padding rows beyond the first latent frame stay zero
    assert np.abs(np.asarray(r1["image_latents"])[:, 1:]).max() == 0.0


@pytest.mark.slow
def test_train_driver_end_to_end(tmp_path):
    """Synthetic data -> VAE encode -> teacher masks -> sharded-free train
    steps -> checkpoint -> resume continues from the saved step."""
    dit = DiT.tiny(lora_rank=2, in_channels=8, out_channels=4)
    vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                              latent_channels=4, norm_num_groups=4,
                              dtype=jnp.float32))
    vae_params = vae.init(jax.random.key(1))
    cfg = TrainConfig(checkpointing_steps=2, max_train_steps=3,
                      lr_warmup_steps=1, index_mask_drop_prob=0.0)
    trainer = Trainer(dit=dit, schedule=Schedule.create(SchedulerConfig()), cfg=cfg)
    c = dit.cfg

    ds = SyntheticAvatarDataset(
        length=6, num_frames=c.sample_frames,
        height=c.sample_height * 8, width=c.sample_width * 8,
        audio_blocks=dit.audio_cfg.blocks, audio_dim=dit.audio_cfg.audio_dim)

    lfe = dit.lfe_cfg
    rngc = np.random.default_rng(0)

    def extras(sample):
        b = sample["video"].shape[0]
        return dict(
            text_embeds=rngc.normal(0, 1, (b, c.max_text_seq_length,
                                           c.text_embed_dim)).astype(np.float32),
            id_cond=rngc.normal(0, 1, (b, c.num_ids, lfe.id_embed_dim)).astype(np.float32),
            id_vit_hidden=rngc.normal(0, 1, (b, c.num_ids, lfe.num_scales, 9,
                                             lfe.vit_dim)).astype(np.float32))

    driver = TrainDriver(trainer=trainer, vae=vae, vae_params=vae_params,
                         cfg=cfg, output_dir=str(tmp_path / "run"))
    params = dit.init(jax.random.key(0))
    state = driver.run(ds, params, batch_size=1, max_steps=3,
                       make_batch_extras=extras, resume=None)
    assert int(jax.device_get(state.step)) == 3
    assert os.path.isfile(str(tmp_path / "run" / "metrics.jsonl"))
    with open(str(tmp_path / "run" / "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert all(np.isfinite(r["loss"]) for r in rows)
    # sub-module export exists
    assert os.path.isdir(str(tmp_path / "run" / "modules-3" / "router_modules"))

    # resume: new driver continues from step 3
    state2 = driver.run(ds, params, batch_size=1, max_steps=4,
                        make_batch_extras=extras, resume="latest")
    assert int(jax.device_get(state2.step)) == 4
