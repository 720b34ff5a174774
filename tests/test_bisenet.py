"""BiSeNet face-parsing port: torch-spec parity + importer + parser contract.

facexlib is not installed in this image, so the torch module here is a
line-accurate mirror of the facexlib/zllrunning BiSeNet architecture (the
checkpoint layout `init_parsing_model(model_name='bisenet')` loads,
`/root/reference/infer.py:250`).  It serves as the executable spec for the
torch conv/BN/pool/interpolate semantics the flax port and the weight
importer must reproduce: if the port or the key-map drifts, parity fails.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from bindyouravatar_tpu.preprocess.bisenet import (  # noqa: E402
    BiSeNet, BiSeNetParser, import_bisenet_weights)


# ------------------------------------------------------------------ #
# torch mirror (facexlib/parsing/bisenet.py + resnet.py layout)

class TConvBNReLU(tnn.Module):
    def __init__(self, in_chan, out_chan, ks=3, stride=1, padding=1):
        super().__init__()
        self.conv = tnn.Conv2d(in_chan, out_chan, ks, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(out_chan)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TBasicBlock(tnn.Module):
    def __init__(self, in_chan, out_chan, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_chan, out_chan, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_chan)
        self.conv2 = tnn.Conv2d(out_chan, out_chan, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_chan)
        self.downsample = None
        if in_chan != out_chan or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_chan, out_chan, 1, stride, bias=False),
                tnn.BatchNorm2d(out_chan))

    def forward(self, x):
        h = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        s = x if self.downsample is None else self.downsample(x)
        return F.relu(s + h)


def _layer(in_chan, out_chan, stride):
    return tnn.Sequential(TBasicBlock(in_chan, out_chan, stride),
                          TBasicBlock(out_chan, out_chan, 1))


class TResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = _layer(64, 64, 1)
        self.layer2 = _layer(64, 128, 2)
        self.layer3 = _layer(128, 256, 2)
        self.layer4 = _layer(256, 512, 2)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        feat8 = self.layer2(x)
        feat16 = self.layer3(feat8)
        feat32 = self.layer4(feat16)
        return feat8, feat16, feat32


class TARM(tnn.Module):
    def __init__(self, in_chan, out_chan):
        super().__init__()
        self.conv = TConvBNReLU(in_chan, out_chan)
        self.conv_atten = tnn.Conv2d(out_chan, out_chan, 1, bias=False)
        self.bn_atten = tnn.BatchNorm2d(out_chan)

    def forward(self, x):
        feat = self.conv(x)
        atten = F.avg_pool2d(feat, feat.size()[2:])
        atten = torch.sigmoid(self.bn_atten(self.conv_atten(atten)))
        return feat * atten


class TContextPath(tnn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = TResNet18()
        self.arm16 = TARM(256, 128)
        self.arm32 = TARM(512, 128)
        self.conv_head32 = TConvBNReLU(128, 128)
        self.conv_head16 = TConvBNReLU(128, 128)
        self.conv_avg = TConvBNReLU(512, 128, ks=1, padding=0)

    def forward(self, x):
        feat8, feat16, feat32 = self.resnet(x)
        h16, w16 = feat16.shape[2:]
        h32, w32 = feat32.shape[2:]
        avg = F.avg_pool2d(feat32, feat32.size()[2:])
        avg_up = F.interpolate(self.conv_avg(avg), (h32, w32), mode="nearest")
        feat32_sum = self.arm32(feat32) + avg_up
        feat32_up = self.conv_head32(
            F.interpolate(feat32_sum, (h16, w16), mode="nearest"))
        feat16_sum = self.arm16(feat16) + feat32_up
        feat16_up = self.conv_head16(
            F.interpolate(feat16_sum, feat8.shape[2:], mode="nearest"))
        return feat8, feat16_up, feat32_up


class TFFM(tnn.Module):
    def __init__(self, in_chan=256, out_chan=256):
        super().__init__()
        self.convblk = TConvBNReLU(in_chan, out_chan, ks=1, padding=0)
        # zllrunning/facexlib FFM 1x1 attention convs carry NO bias
        self.conv1 = tnn.Conv2d(out_chan, out_chan // 4, 1, bias=False)
        self.conv2 = tnn.Conv2d(out_chan // 4, out_chan, 1, bias=False)

    def forward(self, fsp, fcp):
        feat = self.convblk(torch.cat([fsp, fcp], dim=1))
        atten = F.avg_pool2d(feat, feat.size()[2:])
        atten = torch.sigmoid(self.conv2(F.relu(self.conv1(atten))))
        return feat * atten + feat


class TBiSeNetOutput(tnn.Module):
    def __init__(self, in_chan, mid_chan, n_classes):
        super().__init__()
        self.conv = TConvBNReLU(in_chan, mid_chan)
        self.conv_out = tnn.Conv2d(mid_chan, n_classes, 1, bias=False)

    def forward(self, x):
        return self.conv_out(self.conv(x))


class TBiSeNet(tnn.Module):
    def __init__(self, n_classes=19):
        super().__init__()
        self.cp = TContextPath()
        self.ffm = TFFM()
        self.conv_out = TBiSeNetOutput(256, 256, n_classes)
        self.conv_out16 = TBiSeNetOutput(128, 64, n_classes)
        self.conv_out32 = TBiSeNetOutput(128, 64, n_classes)

    def forward(self, x):
        feat_res8, feat_cp8, _ = self.cp(x)
        out = self.conv_out(self.ffm(feat_res8, feat_cp8))
        return F.interpolate(out, x.shape[2:], mode="bilinear",
                             align_corners=True)


def _randomize_bn_stats(module, gen):
    """Init-state running stats (mean 0, var 1) would mask BN import bugs."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


# ------------------------------------------------------------------ #

def test_bisenet_parity_vs_torch_spec():
    gen = torch.Generator().manual_seed(0)
    ref = TBiSeNet().eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        _randomize_bn_stats(ref, gen)

    x = torch.randn(2, 3, 128, 128, generator=gen)
    with torch.no_grad():
        want = ref(x).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params = import_bisenet_weights(sd)
    got = np.asarray(BiSeNet().apply({"params": params},
                                     jnp.asarray(x.numpy())))
    assert got.shape == want.shape == (2, 19, 128, 128)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_bisenet_parser_contract():
    """BiSeNetParser: uint8 RGB [512,512,3] -> int labels [512,512]."""
    import jax

    model = BiSeNet()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 3, 64, 64)))["params"]
    parser = BiSeNetParser(params)
    face = (np.random.default_rng(0).uniform(0, 255, (512, 512, 3))
            .astype(np.uint8))
    labels = parser(face)
    assert labels.shape == (512, 512)
    assert labels.dtype in (np.int32, np.int64)
    assert labels.min() >= 0 and labels.max() < 19


def test_bisenet_parser_plugs_into_face_processor():
    """End-to-end: parser output drives the whiteout inside FaceProcessor."""
    import jax

    from bindyouravatar_tpu.preprocess.face import parse_whiteout

    model = BiSeNet()
    params = model.init(jax.random.key(1), jnp.zeros((1, 3, 64, 64)))["params"]
    parser = BiSeNetParser(params)
    face = (np.random.default_rng(1).uniform(0, 255, (512, 512, 3))
            .astype(np.uint8))
    clip_in, composite = parse_whiteout(face, parser(face))
    assert clip_in.shape == composite.shape == (512, 512, 3)
    # whiteout regions are exactly white in both outputs
    bg = np.all(clip_in == 255.0, axis=-1)
    assert np.all(composite[bg] == 255.0)
