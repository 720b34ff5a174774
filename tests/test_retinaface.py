"""RetinaFace port: torch-spec parity + importer + decode/NMS contracts.

facexlib is not installed in this image, so the torch module here is a
line-accurate mirror of the biubug6/facexlib RetinaFace-ResNet50
architecture (checkpoint layout `detection_Resnet50_Final.pth`,
`/root/reference/infer.py:240-248`).  It is the executable spec the flax
port and weight importer are tested against.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from bindyouravatar_tpu.preprocess.retinaface import (  # noqa: E402
    RetinaFace, RetinaFaceDetector, decode_boxes, decode_landmarks,
    import_retinaface_weights, nms, prior_boxes)


def _conv_bn(in_c, out_c, ks=3, stride=1, relu=True):
    mods = [tnn.Conv2d(in_c, out_c, ks, stride, ks // 2, bias=False),
            tnn.BatchNorm2d(out_c)]
    if relu:
        mods.append(tnn.LeakyReLU(negative_slope=0.0))
    return tnn.Sequential(*mods)


class TBottleneck(tnn.Module):
    def __init__(self, in_c, width, stride=1):
        super().__init__()
        out = width * 4
        self.conv1 = tnn.Conv2d(in_c, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or in_c != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        s = x if self.downsample is None else self.downsample(x)
        return F.relu(s + h)


class TResNet50Body(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        blocks, widths = (3, 4, 6, 3), (64, 128, 256, 512)
        in_c = 64
        for si, (n, w) in enumerate(zip(blocks, widths)):
            layers = []
            for bi in range(n):
                layers.append(TBottleneck(
                    in_c if bi == 0 else w * 4, w,
                    stride=2 if (bi == 0 and si > 0) else 1))
            setattr(self, f"layer{si + 1}", tnn.Sequential(*layers))
            in_c = w * 4

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


class TFPN(tnn.Module):
    def __init__(self, out=256):
        super().__init__()
        self.output1 = _conv_bn(512, out, 1)
        self.output2 = _conv_bn(1024, out, 1)
        self.output3 = _conv_bn(2048, out, 1)
        self.merge1 = _conv_bn(out, out, 3)
        self.merge2 = _conv_bn(out, out, 3)

    def forward(self, c3, c4, c5):
        o1, o2, o3 = self.output1(c3), self.output2(c4), self.output3(c5)
        o2 = self.merge2(o2 + F.interpolate(o3, size=o2.shape[2:],
                                            mode="nearest"))
        o1 = self.merge1(o1 + F.interpolate(o2, size=o1.shape[2:],
                                            mode="nearest"))
        return o1, o2, o3


class TSSH(tnn.Module):
    def __init__(self, in_c=256, out=256):
        super().__init__()
        self.conv3X3 = _conv_bn(in_c, out // 2, relu=False)
        self.conv5X5_1 = _conv_bn(in_c, out // 4)
        self.conv5X5_2 = _conv_bn(out // 4, out // 4, relu=False)
        self.conv7X7_2 = _conv_bn(out // 4, out // 4)
        self.conv7x7_3 = _conv_bn(out // 4, out // 4, relu=False)

    def forward(self, x):
        c3 = self.conv3X3(x)
        c5_1 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c5_1)
        c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class THead(tnn.Module):
    def __init__(self, out_per_anchor):
        super().__init__()
        self.conv1x1 = tnn.Conv2d(256, 2 * out_per_anchor, 1)
        self.n = out_per_anchor

    def forward(self, x):
        y = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
        return y.view(y.shape[0], -1, self.n)


class TRetinaFace(tnn.Module):
    def __init__(self):
        super().__init__()
        self.body = TResNet50Body()
        self.fpn = TFPN()
        self.ssh1, self.ssh2, self.ssh3 = TSSH(), TSSH(), TSSH()
        self.ClassHead = tnn.ModuleList([THead(2) for _ in range(3)])
        self.BboxHead = tnn.ModuleList([THead(4) for _ in range(3)])
        self.LandmarkHead = tnn.ModuleList([THead(10) for _ in range(3)])

    def forward(self, x):
        feats = self.fpn(*self.body(x))
        feats = [self.ssh1(feats[0]), self.ssh2(feats[1]), self.ssh3(feats[2])]
        loc = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], 1)
        conf = torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], 1)
        lm = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1)
        return loc, F.softmax(conf, dim=-1), lm


def _randomize(module, gen):
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_retinaface_parity_vs_torch_spec():
    gen = torch.Generator().manual_seed(0)
    ref = TRetinaFace().eval()
    _randomize(ref, gen)

    x = torch.randn(1, 3, 96, 128, generator=gen) * 20
    with torch.no_grad():
        want_loc, want_conf, want_lm = (t.numpy() for t in ref(x))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params = import_retinaface_weights(sd)
    loc, conf, lm = RetinaFace().apply({"params": params},
                                       jnp.asarray(x.numpy()))
    a = sum((-(-96 // s)) * (-(-128 // s)) * 2 for s in (8, 16, 32))
    assert loc.shape == (1, a, 4)
    np.testing.assert_allclose(np.asarray(loc), want_loc, atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(conf), want_conf, atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(lm), want_lm, atol=3e-4, rtol=3e-4)


def test_priors_decode_nms_contracts():
    pri = prior_boxes(96, 128)
    a = sum((-(-96 // s)) * (-(-128 // s)) * 2 for s in (8, 16, 32))
    assert pri.shape == (a, 4)
    assert pri[:, 2:].min() > 0

    rng = np.random.default_rng(0)
    loc = rng.normal(0, 0.1, (a, 4)).astype(np.float32)
    boxes = decode_boxes(loc, pri)
    assert (boxes[:, 2:] >= boxes[:, :2]).all()
    lm = decode_landmarks(rng.normal(0, 0.1, (a, 10)).astype(np.float32), pri)
    assert lm.shape == (a, 5, 2)

    # NMS: two heavily-overlapping boxes collapse to the higher score
    b = np.array([[0, 0, 10, 10], [1, 1, 10.5, 10.5], [20, 20, 30, 30]],
                 np.float32)
    keep = nms(b, np.array([0.9, 0.8, 0.7], np.float32), 0.4)
    assert keep == [0, 2]


def test_detector_backend_contract():
    """Random weights: the detector returns a well-formed (possibly empty)
    DetectedFace list and never crashes on arbitrary image sizes."""
    import jax

    model = RetinaFace()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 3, 64, 64)))["params"]
    det = RetinaFaceDetector(params, conf_threshold=0.5)
    img = (np.random.default_rng(0).uniform(0, 255, (100, 130, 3))
           .astype(np.uint8))
    faces = det(img)
    for f in faces:
        assert f.bbox.shape == (4,) and f.landmarks.shape == (5, 2)
        assert 0 <= f.bbox[0] <= f.bbox[2] <= 130
