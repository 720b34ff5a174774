"""BiSeNet face-parsing network (19-class CelebAMask-HQ labels) in flax.

The reference parses the aligned 512x512 face with facexlib's BiSeNet
(`init_parsing_model(model_name='bisenet')`, `/root/reference/infer.py:250`,
`train.py:447`) and whites out the background labels before EVA-CLIP
(`/root/reference/models/utils.py:466-484`).  This is the TPU-native port of
that architecture (the zllrunning face-parsing.PyTorch BiSeNet that facexlib
vendors): ResNet-18 context path with two attention-refinement modules and a
global-average shortcut, feature-fusion module, 1x1 classifier head,
bilinear(align_corners) upsample back to the input resolution.

Weights import from the facexlib checkpoint
(`parsing_bisenet.pth`) via `import_bisenet_weights`; without weights the
parser stays out of the pipeline (the pluggable `face_parser` hook in
`preprocess/face.py` defaults to None).

Input contract (matching `models/utils.py:469-473`): RGB in [0,1],
ImageNet-normalised, NCHW [B,3,512,512].  Output: logits [B,19,512,512].
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .arcface import BN

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
NUM_CLASSES = 19


def _upsample_nearest(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on NHWC (index-floor mapping)."""
    h, w = hw
    ih, iw = x.shape[1], x.shape[2]
    if (h, w) == (ih, iw):
        return x
    ri = (np.arange(h) * ih // h).astype(np.int32)
    ci = (np.arange(w) * iw // w).astype(np.int32)
    return x[:, ri][:, :, ci]


def _upsample_bilinear_ac(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) on NHWC."""
    h, w = hw
    ih, iw = x.shape[1], x.shape[2]

    def axis_weights(out_n, in_n):
        if out_n == 1 or in_n == 1:
            return np.zeros(out_n, np.int32), np.zeros(out_n, np.int32), \
                np.zeros(out_n, np.float32)
        pos = np.arange(out_n) * (in_n - 1) / (out_n - 1)
        lo = np.clip(np.floor(pos).astype(np.int32), 0, in_n - 1)
        hi = np.clip(lo + 1, 0, in_n - 1)
        return lo, hi, (pos - lo).astype(np.float32)

    rlo, rhi, rw = axis_weights(h, ih)
    clo, chi, cw = axis_weights(w, iw)
    rw = jnp.asarray(rw, x.dtype)[None, :, None, None]
    cw = jnp.asarray(cw, x.dtype)[None, None, :, None]
    top = x[:, rlo] * (1 - rw) + x[:, rhi] * rw
    return top[:, :, clo] * (1 - cw) + top[:, :, chi] * cw


class ConvBNReLU(nn.Module):
    features: int
    ks: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.ks, self.ks), strides=self.stride,
                    padding=self.ks // 2, use_bias=False, name="conv")(x)
        return nn.relu(BN(name="bn")(x))


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = nn.relu(BN(name="bn1")(h))
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = BN(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        use_bias=False, name="downsample_conv")(x)
            x = BN(name="downsample_bn")(x)
        return nn.relu(x + h)


class ResNet18(nn.Module):
    """Returns (feat8 [.,H/8,W/8,128], feat16 [...,256], feat32 [...,512])."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(BN(name="bn1")(x))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        feats = {}
        for si, ch in enumerate((64, 128, 256, 512)):
            for bi in range(2):
                x = BasicBlock(ch, stride=2 if (bi == 0 and si > 0) else 1,
                               name=f"layer{si + 1}_{bi}")(x)
            feats[si] = x
        return feats[1], feats[2], feats[3]


class ARM(nn.Module):
    """Attention refinement: conv-bn-relu then global-pool sigmoid gate."""
    features: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.features, 3, name="conv")(x)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features, (1, 1), use_bias=False,
                        name="conv_atten")(atten)
        atten = jax.nn.sigmoid(BN(name="bn_atten")(atten))
        return feat * atten


class ContextPath(nn.Module):
    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = ResNet18(name="resnet")(x)
        h8, w8 = feat8.shape[1:3]
        h16, w16 = feat16.shape[1:3]
        h32, w32 = feat32.shape[1:3]

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, name="conv_avg")(avg)
        avg_up = _upsample_nearest(avg, (h32, w32))

        feat32_sum = ARM(128, name="arm32")(feat32) + avg_up
        feat32_up = _upsample_nearest(feat32_sum, (h16, w16))
        feat32_up = ConvBNReLU(128, 3, name="conv_head32")(feat32_up)

        feat16_sum = ARM(128, name="arm16")(feat16) + feat32_up
        feat16_up = _upsample_nearest(feat16_sum, (h8, w8))
        feat16_up = ConvBNReLU(128, 3, name="conv_head16")(feat16_up)

        return feat8, feat16_up, feat32_up


class FFM(nn.Module):
    """Feature fusion: concat, 1x1 conv-bn-relu, SE-style residual gate."""
    features: int = 256

    @nn.compact
    def __call__(self, fsp, fcp):
        feat = ConvBNReLU(self.features, 1, name="convblk")(
            jnp.concatenate([fsp, fcp], axis=-1))
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.relu(nn.Conv(self.features // 4, (1, 1), use_bias=False,
                                name="conv1")(atten))
        atten = jax.nn.sigmoid(nn.Conv(self.features, (1, 1), use_bias=False,
                                       name="conv2")(atten))
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid: int
    n_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid, 3, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       name="conv_out")(x)


class BiSeNet(nn.Module):
    """Forward on NCHW [B,3,H,W] ImageNet-normalised RGB -> logits
    [B,19,H,W] (main head only; the aux heads exist solely for training in
    the original and are not materialised here)."""

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.transpose(0, 2, 3, 1)
        h, w = x.shape[1:3]
        feat_sp, feat_cp8, _ = ContextPath(name="cp")(x)
        fuse = FFM(name="ffm")(feat_sp, feat_cp8)
        out = BiSeNetOutput(256, name="conv_out")(fuse)
        out = _upsample_bilinear_ac(out, (h, w))
        return out.transpose(0, 3, 1, 2)


# --------------------------------------------------------------------- #
# torch checkpoint import (facexlib `parsing_bisenet.pth` state dict)


def _bn(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
            "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}


def _conv(sd, key):
    # torch [O,I,kh,kw] -> flax [kh,kw,I,O]
    w = np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0)
    return {"kernel": w}


def _cbr(sd, prefix):
    return {"conv": _conv(sd, f"{prefix}.conv.weight"),
            "bn": _bn(sd, f"{prefix}.bn")}


def _arm(sd, prefix):
    return {"conv": _cbr(sd, f"{prefix}.conv"),
            "conv_atten": _conv(sd, f"{prefix}.conv_atten.weight"),
            "bn_atten": _bn(sd, f"{prefix}.bn_atten")}


def _head(sd, prefix):
    return {"conv": _cbr(sd, f"{prefix}.conv"),
            "conv_out": _conv(sd, f"{prefix}.conv_out.weight")}


def import_bisenet_weights(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """facexlib/zllrunning BiSeNet torch state dict -> flax params tree."""
    sd = state_dict
    resnet: Dict[str, Any] = {
        "conv1": _conv(sd, "cp.resnet.conv1.weight"),
        "bn1": _bn(sd, "cp.resnet.bn1"),
    }
    for si in range(1, 5):
        for bi in range(2):
            tp = f"cp.resnet.layer{si}.{bi}"
            blk = {"conv1": _conv(sd, f"{tp}.conv1.weight"),
                   "bn1": _bn(sd, f"{tp}.bn1"),
                   "conv2": _conv(sd, f"{tp}.conv2.weight"),
                   "bn2": _bn(sd, f"{tp}.bn2")}
            if f"{tp}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv(sd, f"{tp}.downsample.0.weight")
                blk["downsample_bn"] = _bn(sd, f"{tp}.downsample.1")
            resnet[f"layer{si}_{bi}"] = blk
    params = {
        "cp": {
            "resnet": resnet,
            "arm16": _arm(sd, "cp.arm16"),
            "arm32": _arm(sd, "cp.arm32"),
            "conv_head32": _cbr(sd, "cp.conv_head32"),
            "conv_head16": _cbr(sd, "cp.conv_head16"),
            "conv_avg": _cbr(sd, "cp.conv_avg"),
        },
        "ffm": {"convblk": _cbr(sd, "ffm.convblk"),
                "conv1": _conv(sd, "ffm.conv1.weight"),
                "conv2": _conv(sd, "ffm.conv2.weight")},
        "conv_out": _head(sd, "conv_out"),
    }
    return jax.tree.map(jnp.asarray, params)


class BiSeNetParser:
    """Pluggable `face_parser` backend for `FaceProcessor`:
    RGB [512,512,3] uint8 -> int label map [512,512] (bisenet classes).
    Preprocessing matches the reference exactly: /255, ImageNet norm
    (`models/utils.py:469-473`); argmax over the 19 logits (`:474`)."""

    def __init__(self, params: Dict[str, Any]):
        model = BiSeNet()
        self._fn = jax.jit(
            lambda img: jnp.argmax(model.apply({"params": params}, img), axis=1))

    def __call__(self, face: np.ndarray) -> np.ndarray:
        x = face.astype(np.float32) / 255.0
        x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
            IMAGENET_STD, np.float32)
        x = x.transpose(2, 0, 1)[None]
        return np.asarray(self._fn(x))[0]


def load_bisenet_parser(checkpoint_path: str) -> BiSeNetParser:
    """Build a parser from the facexlib `parsing_bisenet.pth` file."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    return BiSeNetParser(import_bisenet_weights(sd))
