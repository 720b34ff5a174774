"""ArcFace IR-100 importer vs a torch mirror of insightface's iresnet100."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from bindyouravatar_tpu.preprocess.arcface import (  # noqa: E402
    IR100_CHANNELS, IR100_LAYERS, ArcFaceEmbedder, import_arcface_weights)


class TIBasicBlock(tnn.Module):
    def __init__(self, inp, out, stride):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inp)
        self.conv1 = tnn.Conv2d(inp, out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.prelu = tnn.PReLU(out)
        self.conv2 = tnn.Conv2d(out, out, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        h = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        s = x if self.downsample is None else self.downsample(x)
        return s + h


class TIResNet100(tnn.Module):
    """insightface arcface_torch iresnet100 (stride-2 first block per stage)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.prelu = tnn.PReLU(64)
        inp = 64
        for si, (n, ch) in enumerate(zip(IR100_LAYERS, IR100_CHANNELS)):
            blocks = [TIBasicBlock(inp, ch, 2)]
            blocks += [TIBasicBlock(ch, ch, 1) for _ in range(n - 1)]
            setattr(self, f"layer{si + 1}", tnn.Sequential(*blocks))
            inp = ch
        self.bn2 = tnn.BatchNorm2d(512)
        self.fc = tnn.Linear(512 * 7 * 7, 512)
        self.features = tnn.BatchNorm1d(512)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        x = self.bn2(x).flatten(1)
        return self.features(self.fc(x))


def test_arcface_importer_parity():
    gen = torch.Generator().manual_seed(0)
    ref = TIResNet100().eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in ref.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) + 0.5)

    x = torch.rand(2, 3, 112, 112, generator=gen) * 2 - 1
    with torch.no_grad():
        want = ref(x).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = import_arcface_weights(sd)
    got = np.asarray(ArcFaceEmbedder().apply(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
