"""DiT configuration variants: 2B-style sincos path, bg-inpaint channels."""

import jax
import jax.numpy as jnp
import numpy as np

from bindyouravatar_tpu.config import PipelineConfig, VAEConfig
from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.models.vae import CausalVAE
from bindyouravatar_tpu.pipeline.pipeline import BindYourAvatarPipeline


def test_2b_style_sincos_positional_path():
    """use_rotary=False -> static 3D sincos joint pos embedding, no RoPE
    (CogVideoX-2B path, reference `transformer.py:370-393, 938-940`)."""
    dit = DiT.tiny(use_rotary_positional_embeddings=False,
                   is_train_face=False, is_train_audio=False)
    c = dit.cfg
    params = dit.init(jax.random.key(0))
    assert "pos_embedding" in params
    s = c.video_seq_len
    assert params["pos_embedding"].shape == (1, c.max_text_seq_length + s,
                                             c.inner_dim)
    # text part zeros, video part non-zero
    pe = np.asarray(params["pos_embedding"])
    assert np.abs(pe[0, : c.max_text_seq_length]).max() == 0.0
    assert np.abs(pe[0, c.max_text_seq_length:]).max() > 0.0

    lat = jax.random.normal(jax.random.key(1),
                            (1, c.latent_frames, c.in_channels,
                             c.sample_height, c.sample_width))
    text = jax.random.normal(jax.random.key(2),
                             (1, c.max_text_seq_length, c.text_embed_dim))
    out, _ = dit.apply(params, lat, text, jnp.array([100.0]), rope=None)
    assert np.all(np.isfinite(np.asarray(out)))


def test_inpaint_bg_channel_path():
    """in_channels = 3x latent channels: noise + image + bg-inpaint latents
    (reference `infer.py:48`, pipeline `:828-831`)."""
    dit = DiT.tiny(in_channels=12, out_channels=4)
    vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                              latent_channels=4, norm_num_groups=4,
                              dtype=jnp.float32))
    c = dit.cfg
    pipe = BindYourAvatarPipeline.create(
        dit, vae, PipelineConfig(height=c.sample_height * 8,
                                 width=c.sample_width * 8,
                                 num_frames=c.sample_frames,
                                 num_inference_steps=2))
    params = {"dit": dit.init(jax.random.key(0)), "vae": vae.init(jax.random.key(1))}
    prompt = jax.random.normal(jax.random.key(2),
                               (1, c.max_text_seq_length, c.text_embed_dim))
    image = jnp.zeros((1, 1, 3, c.sample_height * 8, c.sample_width * 8))
    bg = jnp.ones_like(image) * 0.5

    v1 = pipe.generate(params, prompt, jnp.zeros_like(prompt), image,
                       jax.random.key(3), image_bg=bg)
    assert np.all(np.isfinite(np.asarray(v1)))
    # without bg: zero inpaint latents (reference use_inpaint=False)
    v2 = pipe.generate(params, prompt, jnp.zeros_like(prompt), image,
                       jax.random.key(3))
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-6
