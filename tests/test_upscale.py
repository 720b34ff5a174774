"""Tiled SR upscaler (utils/upscale.py) + RRDBNet (models/rrdbnet.py) —
reference `util/utils.py:598-725` (tiled_scale / load_sd_upscale / upscale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.utils.upscale import (get_tiled_scale_steps,
                                              tiled_scale, upscale,
                                              upscale_batch_and_concatenate)


def _nearest4x(t):
    # pointwise x4 upscaler: tiling+feather-blend must reproduce the
    # direct result EXACTLY (every tile agrees on shared pixels)
    return jnp.repeat(jnp.repeat(t, 4, axis=-2), 4, axis=-1)


def test_tiled_scale_matches_direct_for_pointwise_model():
    x = jax.random.normal(jax.random.key(0), (2, 3, 40, 56))
    out = tiled_scale(x, _nearest4x, tile_x=16, tile_y=16, overlap=4,
                      upscale_amount=4, out_channels=3)
    ref = _nearest4x(x)
    assert out.shape == (2, 3, 160, 224)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tiled_scale_batched_tiles_and_small_image():
    x = jax.random.normal(jax.random.key(1), (1, 3, 24, 100))
    # batch_tiles forces the lax.map chunked path; image smaller than the
    # tile in one dim exercises the clamp
    out = tiled_scale(x, _nearest4x, tile_x=32, tile_y=64, overlap=8,
                      upscale_amount=4, out_channels=3, batch_tiles=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_nearest4x(x)),
                               atol=1e-5, rtol=1e-5)


def test_step_count_formula():
    # reference util/utils.py:598-599
    assert get_tiled_scale_steps(720, 480, 512, 512, 32) == 2
    assert get_tiled_scale_steps(64, 64, 64, 64, 8) == 4


def test_upscale_wrappers():
    frames = jax.random.normal(jax.random.key(2), (2, 3, 20, 20))
    out = upscale(_nearest4x, frames, scale=4, tile=16, overlap=4)
    assert out.shape == (2, 3, 80, 80)
    batch = frames[None]
    ob = upscale_batch_and_concatenate(_nearest4x, batch, scale=4,
                                       tile=16, overlap=4)
    assert ob.shape == (1, 2, 3, 80, 80)
    np.testing.assert_allclose(np.asarray(ob[0]), np.asarray(out),
                               atol=1e-5)


# --------------------------------------------------------------------- #
# RRDBNet
# --------------------------------------------------------------------- #

def _torch_rrdbnet_forward(sd, x, num_block, feat, grow):
    """Minimal torch mirror of RealESRGAN's RRDBNet forward (x4)."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.asarray(x, np.float32))
    conv = lambda name, v: F.conv2d(v, sd[name + ".weight"],
                                    sd[name + ".bias"], padding=1)
    lrelu = lambda v: F.leaky_relu(v, 0.2)

    def rdb(prefix, v):
        x1 = lrelu(conv(prefix + ".conv1", v))
        x2 = lrelu(conv(prefix + ".conv2", torch.cat([v, x1], 1)))
        x3 = lrelu(conv(prefix + ".conv3", torch.cat([v, x1, x2], 1)))
        x4 = lrelu(conv(prefix + ".conv4", torch.cat([v, x1, x2, x3], 1)))
        x5 = conv(prefix + ".conv5", torch.cat([v, x1, x2, x3, x4], 1))
        return x5 * 0.2 + v

    feat_t = conv("conv_first", t)
    body = feat_t
    for i in range(num_block):
        r = body
        for m in (1, 2, 3):
            r = rdb(f"body.{i}.rdb{m}", r)
        body = r * 0.2 + body
    feat_t = feat_t + conv("conv_body", body)
    up = lambda v: F.interpolate(v, scale_factor=2, mode="nearest")
    feat_t = lrelu(conv("conv_up1", up(feat_t)))
    feat_t = lrelu(conv("conv_up2", up(feat_t)))
    out = conv("conv_last", lrelu(conv("conv_hr", feat_t)))
    return out.numpy()


def test_rrdbnet_matches_torch_mirror():
    torch = pytest.importorskip("torch")
    from bindyouravatar_tpu.models.rrdbnet import RRDBNet, import_rrdbnet

    nb, feat, grow = 2, 8, 4
    g = torch.Generator().manual_seed(0)
    sd = {}

    def add_conv(name, cin, cout):
        sd[name + ".weight"] = 0.2 * torch.randn(cout, cin, 3, 3, generator=g)
        sd[name + ".bias"] = 0.1 * torch.randn(cout, generator=g)

    add_conv("conv_first", 3, feat)
    for i in range(nb):
        for m in (1, 2, 3):
            for k in range(1, 6):
                cin = feat + (k - 1) * grow
                cout = grow if k < 5 else feat
                add_conv(f"body.{i}.rdb{m}.conv{k}", cin, cout)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        add_conv(name, feat, feat)
    add_conv("conv_last", feat, 3)

    x = np.random.RandomState(1).randn(1, 3, 12, 14).astype(np.float32)
    ref = _torch_rrdbnet_forward(sd, x, nb, feat, grow)

    model = RRDBNet(feat=feat, num_block=nb, grow=grow)
    params = import_rrdbnet(sd, num_block=nb)
    out = model.apply(params, jnp.asarray(x))
    assert out.shape == (1, 3, 48, 56)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_rrdbnet_params_ema_wrapper():
    torch = pytest.importorskip("torch")
    from bindyouravatar_tpu.models.rrdbnet import import_rrdbnet

    sd = {"conv_first.weight": torch.zeros(4, 3, 3, 3),
          "conv_first.bias": torch.zeros(4)}
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        sd[name + ".weight"] = torch.zeros(4, 4, 3, 3)
        sd[name + ".bias"] = torch.zeros(4)
    sd["conv_last.weight"] = torch.zeros(3, 4, 3, 3)
    sd["conv_last.bias"] = torch.zeros(3)
    p = import_rrdbnet({"params_ema": sd}, num_block=0)
    assert p["params"]["conv_first"]["kernel"].shape == (3, 3, 3, 4)
