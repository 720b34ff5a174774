"""RRDBNet x4 (the RealESRGAN / ESRGAN SR backbone) in flax.

The reference loads arbitrary SR checkpoints through spandrel
(`util/utils.py:679-684 load_sd_upscale` -> `ModelLoader`), and every
checkpoint its pipeline actually ships with is an RRDBNet variant
(RealESRGAN_x4plus et al.).  This is that architecture, TPU-native:
NHWC convs (XLA's preferred TPU layout), bf16-friendly, one static graph.

Structure (matching the torch reference state dict, keys cited in the
importer): conv_first -> `num_block` RRDB blocks (each 3 ResidualDenseBlocks
of 5 growing convs, LeakyReLU 0.2, residual scale 0.2) -> conv_body (+skip)
-> nearest x2 -> conv_up1 -> nearest x2 -> conv_up2 -> conv_hr -> conv_last.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResidualDenseBlock(nn.Module):
    feat: int = 64
    grow: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda t: nn.leaky_relu(t, 0.2)
        conv = lambda c, name: nn.Conv(c, (3, 3), padding=1,
                                       dtype=self.dtype, name=name)
        x1 = lrelu(conv(self.grow, "conv1")(x))
        x2 = lrelu(conv(self.grow, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(conv(self.grow, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(conv(self.grow, "conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.feat, "conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    feat: int = 64
    grow: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.feat, self.grow, self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock(self.feat, self.grow, self.dtype, name="rdb2")(out)
        out = ResidualDenseBlock(self.feat, self.grow, self.dtype, name="rdb3")(out)
        return out * 0.2 + x


def _nearest2x(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class RRDBNet(nn.Module):
    """x4 RRDBNet.  Input/output [N, C, H, W] (reference conv layout) —
    internally NHWC for the TPU conv units."""
    in_ch: int = 3
    out_ch: int = 3
    feat: int = 64
    num_block: int = 23
    grow: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)   # NCHW->NHWC
        conv = lambda c, name: nn.Conv(c, (3, 3), padding=1,
                                       dtype=self.dtype, name=name)
        lrelu = lambda t: nn.leaky_relu(t, 0.2)
        feat = conv(self.feat, "conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.feat, self.grow, self.dtype, name=f"body_{i}")(body)
        feat = feat + conv(self.feat, "conv_body")(body)
        feat = lrelu(conv(self.feat, "conv_up1")(_nearest2x(feat)))
        feat = lrelu(conv(self.feat, "conv_up2")(_nearest2x(feat)))
        out = conv(self.out_ch, "conv_last")(lrelu(conv(self.feat, "conv_hr")(feat)))
        return jnp.transpose(out, (0, 3, 1, 2))                 # NHWC->NCHW

    @property
    def scale(self) -> int:
        return 4


def _conv_w(t) -> np.ndarray:
    # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.asarray(t, np.float32).transpose(2, 3, 1, 0)


def import_rrdbnet(sd_or_path, num_block: int = 23) -> Dict[str, Any]:
    """torch RealESRGAN/ESRGAN state dict -> flax params.

    Accepts both key families: RealESRGAN ("conv_first.weight",
    "body.N.rdbM.convK.weight") and old-ESRGAN ("model.0.weight", ...)
    after spandrel's normalisation; also the "params_ema"/"params"
    wrapper dicts the official checkpoints ship with.
    """
    sd = sd_or_path
    if isinstance(sd, (str,)):
        import torch
        sd = torch.load(sd, map_location="cpu", weights_only=True)
    for wrap in ("params_ema", "params"):
        if wrap in sd:
            sd = sd[wrap]
    get = lambda k: sd[k].numpy() if hasattr(sd[k], "numpy") else sd[k]

    def conv(prefix):
        return {"kernel": _conv_w(get(prefix + ".weight")),
                "bias": np.asarray(get(prefix + ".bias"), np.float32)}

    p: Dict[str, Any] = {
        "conv_first": conv("conv_first"),
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    for i in range(num_block):
        blk = {}
        for m in (1, 2, 3):
            blk[f"rdb{m}"] = {f"conv{k}": conv(f"body.{i}.rdb{m}.conv{k}")
                              for k in (1, 2, 3, 4, 5)}
        p[f"body_{i}"] = blk
    return {"params": p}
