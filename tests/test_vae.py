"""Causal 3D VAE tests: shapes, causality, roundtrip smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.models.vae import CausalVAE


@pytest.fixture(scope="module")
def vae():
    return CausalVAE.tiny()


@pytest.fixture(scope="module")
def params(vae):
    return vae.init(jax.random.key(0))


def test_encode_decode_shapes(vae, params):
    video = jax.random.normal(jax.random.key(1), (1, 9, 3, 32, 48))
    lat = vae.encode(params, video)
    assert lat.shape == (1, 3, vae.cfg.latent_channels, 4, 6)  # 4x t, 8x s
    out = vae.decode(params, lat)
    assert out.shape == (1, 9, 3, 32, 48)
    assert np.all(np.isfinite(np.asarray(out)))


def test_single_frame_image(vae, params):
    """Conditioning images encode as 1-frame videos (reference
    `prepare_latents`, pipeline:405)."""
    img = jax.random.normal(jax.random.key(2), (2, 1, 3, 32, 32))
    lat = vae.encode(params, img)
    assert lat.shape == (2, 1, vae.cfg.latent_channels, 4, 4)
    rec = vae.decode(params, lat)
    assert rec.shape == (2, 1, 3, 32, 32)


def test_causal_conv_temporal_causality():
    """CausalConv3d: frame t output depends only on frames <= t.

    (The full encoder is NOT frame-causal because GroupNorm statistics span
    time — same as the reference's torch GroupNorm on (B,C,T,H,W).)
    """
    from bindyouravatar_tpu.models.vae import CausalConv3d

    conv = CausalConv3d(4, dtype=jnp.float32)
    x1 = jax.random.normal(jax.random.key(3), (1, 6, 8, 8, 3))
    p = conv.init(jax.random.key(0), x1)
    x2 = x1.at[:, 4:].set(0.0)
    y1 = conv.apply(p, x1)
    y2 = conv.apply(p, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                               atol=1e-6)
    assert np.abs(np.asarray(y1[:, 4:]) - np.asarray(y2[:, 4:])).max() > 1e-3


def test_temporal_pool_odd_passthrough():
    from bindyouravatar_tpu.models.vae import _temporal_avg_pool

    x = jnp.arange(9, dtype=jnp.float32).reshape(1, 9, 1, 1, 1)
    y = _temporal_avg_pool(x)[0, :, 0, 0, 0]
    np.testing.assert_allclose(np.asarray(y), [0.0, 1.5, 3.5, 5.5, 7.5])


def test_sampling_uses_key(vae, params):
    video = jax.random.normal(jax.random.key(5), (1, 1, 3, 16, 16))
    a = vae.encode(params, video, key=jax.random.key(1), sample=True)
    b = vae.encode(params, video, key=jax.random.key(2), sample=True)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
    mode = vae.encode(params, video)
    assert np.all(np.isfinite(np.asarray(mode)))


def test_chunked_decode_shape_and_proximity(vae, params):
    """Temporal-chunked decode: exact frame count, values close to the
    full decode away from chunk boundaries."""
    lat = jax.random.normal(jax.random.key(7), (1, 5, vae.cfg.latent_channels, 4, 4))
    full = vae.decode(params, lat)
    chunked = vae.decode(params, lat, temporal_chunk=2)
    assert chunked.shape == full.shape == (1, 17, 3, 32, 32)
    # first chunk decodes identically (causal + same GN stats over the prefix
    # is NOT guaranteed — GN spans time — so compare loosely overall)
    err = np.abs(np.asarray(chunked) - np.asarray(full)).mean()
    scale = np.abs(np.asarray(full)).mean() + 1e-6
    assert err / scale < 0.5, (err, scale)


def test_chunked_encode_shape_and_proximity(vae, params):
    video = jax.random.normal(jax.random.key(8), (1, 17, 3, 32, 32))
    full = vae.encode(params, video)
    chunked = vae.encode(params, video, temporal_chunk=2)
    assert chunked.shape == full.shape == (1, 5, vae.cfg.latent_channels, 4, 4)
    err = np.abs(np.asarray(chunked) - np.asarray(full)).mean()
    scale = np.abs(np.asarray(full)).mean() + 1e-6
    assert err / scale < 0.5, (err, scale)
    # the first chunk (global prefix, same stats window) matches closely
    np.testing.assert_allclose(np.asarray(chunked[:, 0]), np.asarray(full[:, 0]),
                               atol=np.abs(np.asarray(full)).max() * 0.5)


def test_decode_stream_matches_chunked_decode(vae, params):
    """`decode_stream` yields the exact chunked-decode frames with correct
    start offsets; concatenation equals `decode(..., temporal_chunk=k)`."""
    lat = jax.random.normal(jax.random.key(9),
                            (1, 5, vae.cfg.latent_channels, 4, 4))
    chunked = np.asarray(vae.decode(params, lat, temporal_chunk=2))
    pos = 0
    chunks = []
    for start, chunk in vae.decode_stream(params, lat, temporal_chunk=2):
        assert start == pos
        chunks.append(np.asarray(chunk))
        pos += chunk.shape[1]
    assert len(chunks) > 1
    np.testing.assert_array_equal(np.concatenate(chunks, axis=1), chunked)
    # single-shot fallback: one chunk, equal to the full decode
    (s0, c0), = list(vae.decode_stream(params, lat))
    assert s0 == 0
    np.testing.assert_array_equal(np.asarray(c0),
                                  np.asarray(vae.decode(params, lat)))
    # ragged tail (5 latent frames, chunk 3 -> first chunk 4, tail 1)
    chunks3 = list(vae.decode_stream(params, lat, temporal_chunk=3))
    assert [c.shape[1] for _, c in chunks3] == [13, 4]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(c) for _, c in chunks3], axis=1),
        np.asarray(vae.decode(params, lat, temporal_chunk=3)))
