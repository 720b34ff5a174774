"""Cross-implementation parity: JAX CausalVAE vs a torch mirror of the
diffusers AutoencoderKLCogVideoX blocks (tests/torch_mirror_vae.py) —
VERDICT r2 item 1c: the VAE numerics previously had only self-generated
goldens.

Weights move through the REAL `import_vae` converter (torch
[out,in,kt,kh,kw] -> NDHWC), pinning: CausalConv3d replicate-front padding,
GroupNorm/silu resnets, odd-frame temporal avg-pool downsample, SpatialNorm3D
zq modulation with the first-frame interpolation split, and the causal
2t-1 nearest upsample.
"""

import numpy as np
import torch

from torch_mirror_vae import (MCausalConv3d, MirrorVAE, MResnet3D,
                              MSpatialNorm3D)

import jax
import jax.numpy as jnp

from bindyouravatar_tpu.models.vae import CausalVAE
from bindyouravatar_tpu.training.import_encoders import import_vae

torch.manual_seed(0)


def _randomize(m, seed=7):
    g = torch.Generator().manual_seed(seed)
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.15)


def _pair():
    vae = CausalVAE.tiny()
    mirror = MirrorVAE().eval()
    _randomize(mirror)
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = import_vae(sd, vae)
    return vae, mirror, params


def test_encoder_parity_odd_frames():
    """Full tiny encoder, T=5 (odd: exercises the first-frame passthrough
    in both temporal pools): moments fp32 <=2e-4 vs torch."""
    vae, mirror, params = _pair()
    rng = np.random.default_rng(0)
    video = rng.normal(0, 0.6, (1, 5, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        m_t = mirror.encoder(torch.from_numpy(video).permute(0, 2, 1, 3, 4))
    m_j = vae.encode_moments(params, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(m_j),
                               m_t.permute(0, 2, 1, 3, 4).numpy(),
                               atol=2e-4, rtol=1e-3)


def test_encoder_parity_single_frame():
    """T=1 (the conditioning-image encode path, train.py:1057-1079)."""
    vae, mirror, params = _pair()
    rng = np.random.default_rng(1)
    img = rng.normal(0, 0.6, (1, 1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        m_t = mirror.encoder(torch.from_numpy(img).permute(0, 2, 1, 3, 4))
    m_j = vae.encode_moments(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(m_j),
                               m_t.permute(0, 2, 1, 3, 4).numpy(),
                               atol=2e-4, rtol=1e-3)


def test_decoder_parity():
    """Full tiny decoder (SpatialNorm3D zq modulation + causal 2t-1
    upsample): pixels fp32 <=2e-4 vs torch."""
    vae, mirror, params = _pair()
    rng = np.random.default_rng(2)
    # odd T' (the production chain is 13 -> 25 -> 49)
    lat = rng.normal(0, 1.0, (1, 3, 4, 2, 2)).astype(np.float32)
    scaled = jnp.asarray(lat) * vae.cfg.scaling_factor
    out_j = vae.decode(params, scaled)          # divides the scaling back out
    with torch.no_grad():
        out_t = mirror.decoder(torch.from_numpy(lat).permute(0, 2, 1, 3, 4))
    out_t = out_t.permute(0, 2, 1, 3, 4).numpy()
    assert out_j.shape == out_t.shape           # [1, 9, 3, 16, 16]
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4, rtol=1e-3)


def test_decoder_parity_even_frames():
    """Even T' hits diffusers' whole-tensor interpolate (t -> 2t) — the
    repo path now matches it (chunked decode produces even chunks)."""
    vae, mirror, params = _pair()
    rng = np.random.default_rng(4)
    lat = rng.normal(0, 1.0, (1, 2, 4, 2, 2)).astype(np.float32)
    out_j = vae.decode(params, jnp.asarray(lat) * vae.cfg.scaling_factor)
    with torch.no_grad():
        out_t = mirror.decoder(torch.from_numpy(lat).permute(0, 2, 1, 3, 4))
    out_t = out_t.permute(0, 2, 1, 3, 4).numpy()
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4, rtol=1e-3)


def test_causal_conv_block_parity():
    """Isolated CausalConv3d + resnet + spatial-norm blocks (failure
    localization for the full-stack tests above)."""
    rng = np.random.default_rng(3)

    # CausalConv3d: replicate-front temporal pad + zero spatial pad
    conv = MCausalConv3d(3, 5, 3).eval()
    _randomize(conv, 11)
    from bindyouravatar_tpu.models.vae import (CausalConv3d, ResnetBlock3D,
                                               SpatialNorm3D)

    x = rng.normal(0, 1, (1, 4, 3, 6, 6)).astype(np.float32)   # [B,T,C,H,W]
    with torch.no_grad():
        want = conv(torch.from_numpy(x).permute(0, 2, 1, 3, 4))
    jconv = CausalConv3d(5, dtype=jnp.float32)
    w = conv.conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    b = conv.conv.bias.detach().numpy()
    got = jconv.apply({"params": {"conv": {"kernel": w, "bias": b}}},
                      jnp.asarray(x.transpose(0, 1, 3, 4, 2)))   # NDHWC
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want.numpy(), atol=1e-5, rtol=1e-4)

    # SpatialNorm3D: odd-frame zq interpolation split (f T=3, zq T=2 — the
    # shapes the decoder actually produces after the first causal upsample)
    sn = MSpatialNorm3D(8, 4, groups=4).eval()
    _randomize(sn, 12)
    f = rng.normal(0, 1, (1, 8, 3, 4, 4)).astype(np.float32)   # torch layout
    zq = rng.normal(0, 1, (1, 4, 2, 2, 2)).astype(np.float32)
    with torch.no_grad():
        want = sn(torch.from_numpy(f), torch.from_numpy(zq))
    jsn = SpatialNorm3D(8, 4, groups=4, dtype=jnp.float32)
    p = {
        "norm_layer": {"gn": {"scale": sn.norm_layer.weight.detach().numpy(),
                              "bias": sn.norm_layer.bias.detach().numpy()}},
        "conv_y": {"conv": {
            "kernel": sn.conv_y.conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0),
            "bias": sn.conv_y.conv.bias.detach().numpy()}},
        "conv_b": {"conv": {
            "kernel": sn.conv_b.conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0),
            "bias": sn.conv_b.conv.bias.detach().numpy()}},
    }
    got = jsn.apply({"params": p},
                    jnp.asarray(f.transpose(0, 2, 3, 4, 1)),   # NDHWC
                    jnp.asarray(zq.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want.numpy(), atol=1e-5, rtol=1e-4)
