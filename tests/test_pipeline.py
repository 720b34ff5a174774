"""Tiny end-to-end pipeline tests: full CFG denoise scan + VAE + masks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.config import PipelineConfig, VAEConfig
from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.models.vae import CausalVAE
from bindyouravatar_tpu.pipeline.pipeline import (BindYourAvatarPipeline,
                                                  cfg_double, temporal_or_routing)
from bindyouravatar_tpu.utils.masks import (index_mask_to_routing,
                                            masks_to_index_mask,
                                            noisy_teacher_routing)


@pytest.fixture(scope="module")
def setup():
    # tiny DiT whose in_channels = 2x latent channels (noise + image cond)
    dit = DiT.tiny(in_channels=8, out_channels=4)
    vae = CausalVAE(VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                              latent_channels=4, norm_num_groups=4,
                              dtype=jnp.float32))
    pipe = BindYourAvatarPipeline.create(
        dit, vae, PipelineConfig(height=dit.cfg.sample_height * 8,
                                 width=dit.cfg.sample_width * 8,
                                 num_frames=dit.cfg.sample_frames,
                                 num_inference_steps=4, guidance_scale=6.0))
    params = {"dit": dit.init(jax.random.key(0)),
              "vae": vae.init(jax.random.key(1))}
    return pipe, params


def _cond(dit, b=1):
    c = dit.cfg
    ks = jax.random.split(jax.random.key(7), 6)
    id_cond = jax.random.normal(ks[0], (b, c.num_ids, dit.lfe_cfg.id_embed_dim))
    vit = jax.random.normal(ks[1], (b, c.num_ids, dit.lfe_cfg.num_scales, 9,
                                    dit.lfe_cfg.vit_dim))
    a = dit.audio_cfg
    n_af = c.sample_frames + a.window_size - a.window_stride
    audio = jax.random.normal(ks[2], (b, 2, n_af, a.blocks, a.audio_dim))
    af = jnp.eye(c.num_ids)[None].repeat(b, 0)
    return dict(id_cond=id_cond, id_vit_hidden=vit, audio_embeds=audio,
                af_matrix=af)


def test_generate_end_to_end(setup):
    pipe, params = setup
    dit = pipe.dit
    c = dit.cfg
    b = 1
    prompt = jax.random.normal(jax.random.key(2), (b, c.max_text_seq_length,
                                                   c.text_embed_dim))
    neg = jnp.zeros_like(prompt)
    image = jax.random.uniform(jax.random.key(3),
                               (b, 1, 3, c.sample_height * 8, c.sample_width * 8),
                               minval=-1, maxval=1)
    video = pipe.generate(params, prompt, neg, image, jax.random.key(4),
                          **_cond(dit))
    assert video.shape == (b, c.sample_frames, 3, c.sample_height * 8,
                           c.sample_width * 8)
    assert np.all(np.isfinite(np.asarray(video)))


def test_denoise_seed_determinism_and_guidance(setup):
    pipe, params = setup
    dit = pipe.dit
    c = dit.cfg
    t_lat = c.latent_frames
    prompt = jax.random.normal(jax.random.key(2), (2, c.max_text_seq_length,
                                                   c.text_embed_dim))
    # DiT operates on the latent grid directly: [B, T_lat, C_lat, H_lat, W_lat]
    img_lat = jax.random.normal(jax.random.key(3),
                                (1, t_lat, 4, c.sample_height, c.sample_width))
    cond = _cond(dit)
    l1 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5), **cond)
    l2 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5), **cond)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    l3 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(6), **cond)
    assert np.abs(np.asarray(l1) - np.asarray(l3)).max() > 1e-4
    l4 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5),
                      guidance_scale=1.5, **cond)
    assert np.abs(np.asarray(l1) - np.asarray(l4)).max() > 1e-5


def test_routing_forcing_path(setup):
    pipe, params = setup
    dit = pipe.dit
    c = dit.cfg
    s = c.video_seq_len
    prompt = jax.random.normal(jax.random.key(2), (2, c.max_text_seq_length,
                                                   c.text_embed_dim))
    img_lat = jax.random.normal(jax.random.key(3),
                                (1, c.latent_frames, 4, c.sample_height,
                                 c.sample_width))
    force = (jax.random.uniform(jax.random.key(9), (1, s, c.num_ids)) > 0.5
             ).astype(jnp.float32)
    cond = _cond(dit)
    l1 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5), **cond)
    l2 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5),
                      routing_forcing=force, **cond)
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-5


def test_denoise_return_routing(setup):
    """`return_routing` (the --draw_routing_logits surface) yields per-step
    per-layer routing logits from the cond CFG half without changing the
    latents, and renders through save_routing_video."""
    pipe, params = setup
    dit = pipe.dit
    c = dit.cfg
    prompt = jax.random.normal(jax.random.key(2), (2, c.max_text_seq_length,
                                                   c.text_embed_dim))
    img_lat = jax.random.normal(jax.random.key(3),
                                (1, c.latent_frames, 4, c.sample_height,
                                 c.sample_width))
    cond = _cond(dit)
    lat_plain = pipe.denoise(params["dit"], prompt, img_lat,
                             jax.random.key(5), **cond)
    lat, routing = pipe.denoise(params["dit"], prompt, img_lat,
                                jax.random.key(5), return_routing=True, **cond)
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat_plain))
    steps = pipe.cfg.num_inference_steps
    assert routing.shape == (steps, c.num_ca, 1, c.video_seq_len, c.num_ids)
    r = np.asarray(routing, np.float32)
    assert np.all((r >= 0.0) & (r <= 1.0))        # sigmoid outputs
    assert np.all(np.isfinite(r))

    import tempfile

    from bindyouravatar_tpu.utils.media import save_routing_video

    with tempfile.TemporaryDirectory() as d:
        p = save_routing_video(r[-1, -1, 0], c.latent_grid, d + "/r.mp4")
        import os
        assert os.path.getsize(p) > 0


def test_aot_auto_layout_loop_matches_jit(setup):
    """pipe.aot_compile_loop (the single-chip AUTO-weight-layout recipe used
    by tools/e2e_flagship_smoke.py --conditioned) == the standard jitted
    loop, bit-for-bit, params moved through the returned formats."""
    pipe, params = setup
    dit = pipe.dit
    c = dit.cfg
    prompt = jax.random.normal(jax.random.key(2), (2, c.max_text_seq_length,
                                                   c.text_embed_dim))
    img_lat = jax.random.normal(jax.random.key(3),
                                (1, c.latent_frames, 4, c.sample_height,
                                 c.sample_width))
    cond = _cond(dit)
    steps = pipe.cfg.num_inference_steps
    args = pipe.prepare_denoise_inputs(
        params["dit"], prompt, img_lat, jax.random.key(5), steps, **cond)

    want, _ = pipe._jitted_loop(steps, pipe.cfg.guidance_scale)(
        params["dit"], *args)

    compiled, fmts = pipe.aot_compile_loop(
        steps, pipe.cfg.guidance_scale, params["dit"], args)
    placed = jax.tree.map(lambda x, f: jax.device_put(x, f),
                          params["dit"], fmts)
    got, _ = compiled(placed, *args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cfg_double_and_temporal_or():
    x = jnp.arange(6.0).reshape(1, 3, 2)
    d = cfg_double(x, False)
    np.testing.assert_array_equal(np.asarray(d[0]), np.asarray(d[1]))
    z = cfg_double(x, True)
    assert np.all(np.asarray(z[0]) == 0)

    r = jnp.zeros((1, 2 * 2 * 3, 2)).at[0, 0, 0].set(1.0)  # only frame 0 active
    out = temporal_or_routing(r, (2, 2, 3))
    o = np.asarray(out).reshape(2, 2, 3, 2)
    assert o[0, 0, 0, 0] == 1.0 and o[1, 0, 0, 0] == 1.0  # OR'd across frames


def test_mask_conversion_roundtrip():
    rng = np.random.default_rng(0)
    m1 = np.zeros((8, 16, 24), np.float32)
    m2 = np.zeros((8, 16, 24), np.float32)
    m1[:, :, :8] = 1.0   # id1 left
    m2[:, :, 16:] = 1.0  # id2 right
    idx = masks_to_index_mask(m1, m2, 2, 4, 6)
    assert set(np.unique(idx)) <= {-1, 0, 1}
    routing = index_mask_to_routing(idx)
    assert routing.shape == (1, 2 * 4 * 6, 2)
    grid_idx = idx.reshape(2, 4, 6)
    assert (grid_idx[:, :, 0] == 0).all()   # left cols -> id1
    assert (grid_idx[:, :, 5] == 1).all()   # right cols -> id2

    teacher = noisy_teacher_routing(idx, (2, 4, 6), rng)
    assert teacher.shape == (2 * 4 * 6, 2)
    assert teacher.min() >= 0.0 and teacher.max() <= 1.0


def test_native_mask_kernels_match_python():
    """C++ mask kernels (when built) == numpy path == torch trilinear."""
    import torch
    import torch.nn.functional as F

    from bindyouravatar_tpu.utils import masks as M

    rng = np.random.default_rng(0)
    m = rng.random((9, 64, 96)).astype(np.float32)
    m2 = rng.random((9, 64, 96)).astype(np.float32)

    ref = F.interpolate(torch.from_numpy(m)[None, None], size=(3, 8, 12),
                        mode="trilinear", align_corners=False)[0, 0].numpy()
    out = M.resize_mask_trilinear(m, 3, 8, 12)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    res = M.masks_to_teacher_native(m, m2, 3, 8, 12)
    if res is not None:   # native lib built
        idx, teacher = res
        idx_py = M.masks_to_index_mask(m, m2, 3, 8, 12)
        np.testing.assert_array_equal(idx, idx_py)
        assert teacher.shape == (3 * 8 * 12, 2)
        # teacher is temporally constant (OR-reduced + repeated)
        t3 = teacher.reshape(3, 8 * 12, 2)
        np.testing.assert_array_equal(t3[0], t3[1])


def test_ddim_scheduler_path(setup):
    """scheduler_type='ddim' runs the deterministic DDIM branch."""
    pipe, params = setup
    pipe_ddim = dataclasses.replace(
        pipe, cfg=dataclasses.replace(pipe.cfg, scheduler_type="ddim"))
    dit = pipe.dit
    c = dit.cfg
    prompt = jax.random.normal(jax.random.key(2), (2, c.max_text_seq_length,
                                                   c.text_embed_dim))
    img_lat = jax.random.normal(jax.random.key(3),
                                (1, c.latent_frames, 4, c.sample_height,
                                 c.sample_width))
    l1 = pipe_ddim.denoise(params["dit"], prompt, img_lat, jax.random.key(5))
    l2 = pipe_ddim.denoise(params["dit"], prompt, img_lat, jax.random.key(9))
    # DDIM is ODE-deterministic given the init noise; different keys change
    # only the init latents
    assert np.all(np.isfinite(np.asarray(l1)))
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-5
    l_dpm = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5))
    assert np.abs(np.asarray(l1) - np.asarray(l_dpm)).max() > 1e-5


def test_denoise_loop_compiled_once(setup):
    """Repeat `denoise` calls with identical shapes reuse ONE compiled loop
    (the reference reuses the module across samples,
    `tools/batch_run_samples.py:45-86`; round-1 re-jitted per call)."""
    import time

    pipe, params = setup
    c = pipe.dit.cfg
    prompt = jax.random.normal(jax.random.key(2), (2, c.max_text_seq_length,
                                                   c.text_embed_dim))
    img_lat = jax.random.normal(jax.random.key(3),
                                (1, c.latent_frames, 4, c.sample_height,
                                 c.sample_width))
    assert pipe._jitted_loop(4, 6.0) is pipe._jitted_loop(4, 6.0)

    t0 = time.perf_counter()
    l1 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(5))
    jax.block_until_ready(l1)
    first = time.perf_counter() - t0

    loop = pipe._jitted_loop(4, pipe.cfg.guidance_scale)
    misses0 = loop._cache_size()
    t0 = time.perf_counter()
    l2 = pipe.denoise(params["dit"], prompt, img_lat, jax.random.key(9))
    jax.block_until_ready(l2)
    second = time.perf_counter() - t0
    assert loop._cache_size() == misses0      # no new trace/compile
    assert second < max(1.0, first / 2)


def test_denoise_precomputed_ctx_matches_inline(setup):
    """Hoisting LFE/audio prep out of the step (prepare_conditioning) is
    bit-identical to computing it inside `apply` (reference recomputes
    per forward, transformer.py:635-676)."""
    pipe, params = setup
    dit = pipe.dit
    c = dit.cfg
    cond = _cond(dit)
    b = 1
    lat = jax.random.normal(jax.random.key(1),
                            (b, c.latent_frames, c.in_channels,
                             c.sample_height, c.sample_width))
    text = jax.random.normal(jax.random.key(2),
                             (b, c.max_text_seq_length, c.text_embed_dim))
    ts = jnp.full((b,), 500.0)
    rope = dit.rope(c.sample_height * 8, c.sample_width * 8, c.latent_frames)

    out_inline, r_inline = dit.apply(params["dit"], lat, text, ts, rope, **cond)

    face, actx = dit.prepare_conditioning(
        params["dit"], id_cond=cond["id_cond"],
        id_vit_hidden=cond["id_vit_hidden"], audio_embeds=cond["audio_embeds"])
    out_pre, r_pre = dit.apply(params["dit"], lat, text, ts, rope,
                               face_emb=face, audio_ctx=actx,
                               af_matrix=cond["af_matrix"])
    np.testing.assert_allclose(np.asarray(out_inline), np.asarray(out_pre),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_inline), np.asarray(r_pre),
                               rtol=1e-6, atol=1e-6)
