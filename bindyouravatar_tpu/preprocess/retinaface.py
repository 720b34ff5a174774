"""RetinaFace (ResNet-50) face detector in flax.

The reference's alignment stack detects faces and 5-point landmarks with
facexlib's RetinaFace (`FaceRestoreHelper(det_model='retinaface_resnet50')`,
`/root/reference/infer.py:240-248`, used via `get_face_landmarks_5` in
`models/utils.py:448-452`).  This is the TPU-native port of that
architecture (the biubug6 Pytorch_Retinaface ResNet-50 variant facexlib
vendors): torchvision ResNet-50 C3/C4/C5 taps, 3-level FPN, SSH context
modules, and 2-anchor class/bbox/landmark heads; anchor decode and NMS run
host-side in numpy.

Weights import from the facexlib checkpoint
(`detection_Resnet50_Final.pth`) via `import_retinaface_weights`; without
weights the pluggable `FaceDetector` keeps its full-frame fallback.

Input contract (matching the original): BGR float32 minus (104, 117, 123),
NCHW.  The network is fully convolutional; `RetinaFaceDetector` pads images
to a multiple of 32 so conv and anchor grids agree.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .arcface import BN

VARIANCES = (0.1, 0.2)
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
NUM_ANCHORS = 2
MEAN_BGR = (104.0, 117.0, 123.0)


class ConvBN(nn.Module):
    features: int
    ks: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.ks, self.ks), strides=self.stride,
                    padding=self.ks // 2, use_bias=False, name="conv")(x)
        x = BN(name="bn")(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    width: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = self.width * 4
        h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(BN(name="bn1")(h))
        h = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.relu(BN(name="bn2")(h))
        h = nn.Conv(out, (1, 1), use_bias=False, name="conv3")(h)
        h = BN(name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out:
            x = nn.Conv(out, (1, 1), strides=self.stride, use_bias=False,
                        name="downsample_conv")(x)
            x = BN(name="downsample_bn")(x)
        return nn.relu(x + h)


RESNET50_BLOCKS = (3, 4, 6, 3)
RESNET50_WIDTHS = (64, 128, 256, 512)


class ResNet50C345(nn.Module):
    """torchvision ResNet-50 trunk returning (C3 [/8, 512], C4 [/16, 1024],
    C5 [/32, 2048])."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(BN(name="bn1")(x))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = []
        for si, (n, w) in enumerate(zip(RESNET50_BLOCKS, RESNET50_WIDTHS)):
            for bi in range(n):
                x = Bottleneck(w, stride=2 if (bi == 0 and si > 0) else 1,
                               name=f"layer{si + 1}_{bi}")(x)
            if si > 0:
                taps.append(x)
        return tuple(taps)


def _upsample_nearest_to(x, hw):
    h, w = hw
    ih, iw = x.shape[1], x.shape[2]
    ri = (np.arange(h) * ih // h).astype(np.int32)
    ci = (np.arange(w) * iw // w).astype(np.int32)
    return x[:, ri][:, :, ci]


class FPN(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, c3, c4, c5):
        out1 = ConvBN(self.features, 1, name="output1")(c3)
        out2 = ConvBN(self.features, 1, name="output2")(c4)
        out3 = ConvBN(self.features, 1, name="output3")(c5)
        out2 = out2 + _upsample_nearest_to(out3, out2.shape[1:3])
        out2 = ConvBN(self.features, 3, name="merge2")(out2)
        out1 = out1 + _upsample_nearest_to(out2, out1.shape[1:3])
        out1 = ConvBN(self.features, 3, name="merge1")(out1)
        return out1, out2, out3


class SSH(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, x):
        half, quarter = self.features // 2, self.features // 4
        c3 = ConvBN(half, 3, relu=False, name="conv3X3")(x)
        c5_1 = ConvBN(quarter, 3, name="conv5X5_1")(x)
        c5 = ConvBN(quarter, 3, relu=False, name="conv5X5_2")(c5_1)
        c7_1 = ConvBN(quarter, 3, name="conv7X7_2")(c5_1)
        c7 = ConvBN(quarter, 3, relu=False, name="conv7x7_3")(c7_1)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFace(nn.Module):
    """BGR mean-subtracted NCHW [B,3,H,W] (H, W multiples of 32) ->
    (loc [B, A, 4], conf [B, A, 2], landm [B, A, 10]) with A = total anchors
    over the three strides."""

    @nn.compact
    def __call__(self, images):
        x = images.transpose(0, 2, 3, 1)
        b = x.shape[0]
        c3, c4, c5 = ResNet50C345(name="body")(x)
        f1, f2, f3 = FPN(name="fpn")(c3, c4, c5)
        feats = [SSH(name=f"ssh{i + 1}")(f)
                 for i, f in enumerate((f1, f2, f3))]

        locs, confs, landms = [], [], []
        for i, f in enumerate(feats):
            loc = nn.Conv(NUM_ANCHORS * 4, (1, 1),
                          name=f"BboxHead_{i}")(f)
            conf = nn.Conv(NUM_ANCHORS * 2, (1, 1),
                           name=f"ClassHead_{i}")(f)
            lm = nn.Conv(NUM_ANCHORS * 10, (1, 1),
                         name=f"LandmarkHead_{i}")(f)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, 2))
            landms.append(lm.reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        landm = jnp.concatenate(landms, axis=1)
        return loc, conf, landm


# --------------------------------------------------------------------- #
# anchors, decode, NMS (host-side numpy — tiny)

@functools.lru_cache(maxsize=16)
def prior_boxes(h: int, w: int) -> np.ndarray:
    """[A, 4] (cx, cy, sx, sy) normalised anchors (biubug6 PriorBox)."""
    anchors = []
    for sizes, step in zip(MIN_SIZES, STEPS):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i, j in itertools.product(range(fh), range(fw)):
            for ms in sizes:
                anchors.append([(j + 0.5) * step / w, (i + 0.5) * step / h,
                                ms / w, ms / h])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """[A,4] regression deltas -> [A,4] (x0,y0,x1,y1) normalised corners."""
    cxy = priors[:, :2] + loc[:, :2] * VARIANCES[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * VARIANCES[1])
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)


def decode_landmarks(landm: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """[A,10] deltas -> [A,5,2] normalised landmark points."""
    pts = [priors[:, :2] + landm[:, 2 * i:2 * i + 2] * VARIANCES[0] * priors[:, 2:]
           for i in range(5)]
    return np.stack(pts, axis=1)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float = 0.4) -> List[int]:
    x0, y0, x1, y1 = boxes.T
    areas = (x1 - x0) * (y1 - y0)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        xx0 = np.maximum(x0[i], x0[order[1:]])
        yy0 = np.maximum(y0[i], y0[order[1:]])
        xx1 = np.minimum(x1[i], x1[order[1:]])
        yy1 = np.minimum(y1[i], y1[order[1:]])
        inter = np.maximum(0, xx1 - xx0) * np.maximum(0, yy1 - yy0)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-9)
        order = order[1:][iou <= thresh]
    return keep


# --------------------------------------------------------------------- #
# torch checkpoint import (facexlib `detection_Resnet50_Final.pth`)

def _conv_t(sd, key):
    return {"kernel": np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0)}


def _bn_t(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
            "bias": np.asarray(sd[f"{p}.bias"], np.float32),
            "mean": np.asarray(sd[f"{p}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{p}.running_var"], np.float32)}


def _convbn(sd, p):
    """Sequential(conv, bn[, leaky]) — indices .0/.1."""
    return {"conv": _conv_t(sd, f"{p}.0.weight"), "bn": _bn_t(sd, f"{p}.1")}


def import_retinaface_weights(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """biubug6/facexlib RetinaFace-ResNet50 torch state dict -> flax tree."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    body: Dict[str, Any] = {"conv1": _conv_t(sd, "body.conv1.weight"),
                            "bn1": _bn_t(sd, "body.bn1")}
    for si, n in enumerate(RESNET50_BLOCKS):
        for bi in range(n):
            p = f"body.layer{si + 1}.{bi}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = _conv_t(sd, f"{p}.conv{ci}.weight")
                blk[f"bn{ci}"] = _bn_t(sd, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv_t(sd, f"{p}.downsample.0.weight")
                blk["downsample_bn"] = _bn_t(sd, f"{p}.downsample.1")
            body[f"layer{si + 1}_{bi}"] = blk

    fpn = {"output1": _convbn(sd, "fpn.output1"),
           "output2": _convbn(sd, "fpn.output2"),
           "output3": _convbn(sd, "fpn.output3"),
           "merge1": _convbn(sd, "fpn.merge1"),
           "merge2": _convbn(sd, "fpn.merge2")}

    params: Dict[str, Any] = {"body": body, "fpn": fpn}
    for i in (1, 2, 3):
        params[f"ssh{i}"] = {
            name: _convbn(sd, f"ssh{i}.{tname}")
            for name, tname in (("conv3X3", "conv3X3"),
                                ("conv5X5_1", "conv5X5_1"),
                                ("conv5X5_2", "conv5X5_2"),
                                ("conv7X7_2", "conv7X7_2"),
                                ("conv7x7_3", "conv7x7_3"))}
    for i in range(3):
        for ours, theirs in (("BboxHead", "BboxHead"),
                             ("ClassHead", "ClassHead"),
                             ("LandmarkHead", "LandmarkHead")):
            p = f"{theirs}.{i}.conv1x1"
            params[f"{ours}_{i}"] = {
                "kernel": np.asarray(sd[f"{p}.weight"],
                                     np.float32).transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"{p}.bias"], np.float32)}
    return jax.tree.map(jnp.asarray, params)


@dataclasses.dataclass
class RetinaFaceDetector:
    """`FaceDetector`-compatible backend: RGB uint8 [H,W,3] ->
    list of (bbox [4], landmarks [5,2]) sorted left-to-right, like the
    reference's detection contract (`preprocess/face.py`)."""
    params: Dict[str, Any]
    conf_threshold: float = 0.8
    nms_threshold: float = 0.4

    def __post_init__(self):
        model = RetinaFace()
        self._fn = jax.jit(lambda img: model.apply({"params": self.params}, img))

    def __call__(self, image: np.ndarray):
        from .face import DetectedFace

        h, w = image.shape[:2]
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        bgr = image[..., ::-1].astype(np.float32) - np.asarray(MEAN_BGR)
        buf = np.zeros((hp, wp, 3), np.float32)
        buf[:h, :w] = bgr
        loc, conf, landm = (np.asarray(x[0]) for x in
                            self._fn(buf.transpose(2, 0, 1)[None]))
        priors = prior_boxes(hp, wp)
        scores = conf[:, 1]
        sel = scores > self.conf_threshold
        if not sel.any():
            return []
        boxes = decode_boxes(loc[sel], priors[sel])
        pts = decode_landmarks(landm[sel], priors[sel])
        scores = scores[sel]
        scale_b = np.asarray([wp, hp, wp, hp], np.float32)
        boxes = boxes * scale_b
        pts = pts * np.asarray([wp, hp], np.float32)
        keep = nms(boxes, scores, self.nms_threshold)
        out = [DetectedFace(bbox=np.clip(boxes[i], 0, [w, h, w, h]),
                            landmarks=pts[i]) for i in keep]
        return sorted(out, key=lambda d: d.bbox[0])


def load_retinaface_detector(checkpoint_path: str, **kw) -> RetinaFaceDetector:
    """Build a detector from facexlib's `detection_Resnet50_Final.pth`."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    return RetinaFaceDetector(import_retinaface_weights(sd), **kw)
