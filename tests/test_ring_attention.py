"""Ring attention (sequence parallel) vs single-device SDPA."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from bindyouravatar_tpu.ops.attention import sdpa
from bindyouravatar_tpu.ops.ring_attention import ring_attention


def _mesh():
    import numpy as onp

    return Mesh(onp.asarray(jax.devices()).reshape(8), ("sp",))


def test_ring_attention_matches_sdpa():
    mesh = _mesh()
    q = jax.random.normal(jax.random.key(0), (2, 4, 256, 32))
    k = jax.random.normal(jax.random.key(1), (2, 4, 256, 32))
    v = jax.random.normal(jax.random.key(2), (2, 4, 256, 32))
    out = ring_attention(q, k, v, mesh)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_valid_len_mask():
    mesh = _mesh()
    s, valid = 256, 200
    q = jax.random.normal(jax.random.key(0), (1, 2, s, 32))
    k = jax.random.normal(jax.random.key(1), (1, 2, s, 32))
    v = jax.random.normal(jax.random.key(2), (1, 2, s, 32))
    out = ring_attention(q, k, v, mesh, valid_len=valid)
    ref = sdpa(q, k[:, :, :valid], v[:, :, :valid])
    np.testing.assert_allclose(np.asarray(out[:, :, :valid]),
                               np.asarray(ref[:, :, :valid]), atol=2e-5)


def test_dit_sp_ring_matches_dense_at_2x_frames():
    """Sequence-parallel ring attention through DiT.apply at DOUBLE the
    base frame count (the reference hard-caps 49 frames,
    `pipeline_bindyouravatar.py:739-742`; router/rope are grid-polymorphic)."""
    from jax.sharding import Mesh

    from bindyouravatar_tpu.models.dit import DiT

    dit = DiT.tiny(in_channels=8, out_channels=4)
    c = dit.cfg
    params = dit.init(jax.random.key(0))

    t2 = 2 * c.latent_frames
    n_px = (t2 - 1) * 4 + 1
    a = dit.audio_cfg
    lat = jax.random.normal(jax.random.key(1),
                            (1, t2, c.in_channels, c.sample_height, c.sample_width))
    text = jax.random.normal(jax.random.key(2),
                             (1, c.max_text_seq_length, c.text_embed_dim))
    ts = jnp.array([300.0])
    rope = dit.rope(c.sample_height * 8, c.sample_width * 8, t2)
    ks = jax.random.split(jax.random.key(3), 3)
    cond = dict(
        id_cond=jax.random.normal(ks[0], (1, c.num_ids, dit.lfe_cfg.id_embed_dim)),
        id_vit_hidden=jax.random.normal(
            ks[1], (1, c.num_ids, dit.lfe_cfg.num_scales, 9, dit.lfe_cfg.vit_dim)),
        audio_embeds=jax.random.normal(
            ks[2], (1, 2, n_px + a.window_size - a.window_stride, a.blocks,
                    a.audio_dim)),
        num_pixel_frames=n_px)

    dense, r_dense = dit.apply(params, lat, text, ts, rope, **cond)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("sp",))
    sp, r_sp = dit.apply(params, lat, text, ts, rope, sp_mesh=mesh, **cond)

    np.testing.assert_allclose(np.asarray(sp), np.asarray(dense),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_sp), np.asarray(r_dense),
                               atol=2e-4, rtol=1e-3)
