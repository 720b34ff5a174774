"""ArcFace identity embedder: IResNet-100 in flax.

The reference runs insightface's `glintr100.onnx` through onnxruntime-gpu
(`infer.py:267-270`) to get the 512-d identity embedding that forms the
first half of `id_cond` (`models/utils.py:393-523`).  Here the IR-100
architecture is native JAX (jit/TPU-capable); weights import from the
insightface torch/onnx checkpoint when present, with a deterministic
random-projection fallback so the pipeline stays runnable without them.

IR-100 (insightface iresnet100): stem conv3x3(64) + PReLU, 4 stages of
improved-residual units [3, 13, 30, 3] with channels [64, 128, 256, 512],
each unit = BN-Conv3x3-BN-PReLU-Conv3x3(stride)-BN + shortcut, head =
BN - Dropout - Flatten - FC(512) - BN1d.  Input 112x112 RGB in [-1,1].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IR100_LAYERS = (3, 13, 30, 3)
IR100_CHANNELS = (64, 128, 256, 512)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],),
                       jnp.float32)
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class BN(nn.Module):
    """Inference-mode batch norm (running stats as params; ArcFace is used
    frozen — training it is out of contract)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (d,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (d,), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class IRBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = BN(name="bn1")(x)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv1")(h)
        h = BN(name="bn2")(h)
        h = PReLU(name="prelu")(h)
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(h)
        h = BN(name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        use_bias=False, name="downsample_conv")(x)
            x = BN(name="downsample_bn")(x)
        return x + h


class IResNet100(nn.Module):
    embed_dim: int = 512

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, 3, 112, 112] in [-1,1] -> [B, 512]."""
        x = images.transpose(0, 2, 3, 1)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = BN(name="bn1")(x)
        x = PReLU(name="prelu1")(x)
        for si, (n, ch) in enumerate(zip(IR100_LAYERS, IR100_CHANNELS)):
            for bi in range(n):
                x = IRBlock(ch, stride=2 if bi == 0 else 1,
                            name=f"layer{si + 1}_{bi}")(x)
        x = BN(name="bn2")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.embed_dim, name="fc")(x)
        x = BN(name="features")(x)
        return x


@dataclasses.dataclass(frozen=True)
class ArcFaceEmbedder:
    """512-d identity embedding; `init` gives random weights (importer for
    real checkpoints in `import_arcface_weights`)."""
    model: IResNet100 = IResNet100()

    def init(self, key: jax.Array) -> Dict[str, Any]:
        return self.model.init(key, jnp.zeros((1, 3, 112, 112)))["params"]

    def apply(self, params, images: jnp.ndarray) -> jnp.ndarray:
        return self.model.apply({"params": params}, images)


def import_arcface_weights(sd_or_path) -> Dict[str, Any]:
    """insightface arcface_torch `iresnet100` state dict -> flax params.

    The reference embeds identities with `glintr100.onnx` through
    onnxruntime (`/root/reference/infer.py:268`); the torch training
    checkpoints of the same IR-100 architecture (insightface arcface_torch)
    use the key layout imported here.  The final fc consumes the NCHW
    flatten (c*49 + y*7 + x); ours flattens NHWC — absorbed as a row
    permutation of the fc kernel (exact).
    """
    sd = sd_or_path
    if isinstance(sd, str):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items()}
    sd = {k.replace("module.", ""): np.asarray(v, np.float32)
          for k, v in sd.items() if "num_batches" not in k}

    def bn(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"],
                "mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]}

    def conv(key):
        return {"kernel": sd[key].transpose(2, 3, 1, 0)}

    params: Dict[str, Any] = {
        "conv1": conv("conv1.weight"),
        "bn1": bn("bn1"),
        "prelu1": {"alpha": sd["prelu.weight"]},
        "bn2": bn("bn2"),
    }
    for si, n in enumerate(IR100_LAYERS):
        for bi in range(n):
            p = f"layer{si + 1}.{bi}"
            blk = {"bn1": bn(f"{p}.bn1"),
                   "conv1": conv(f"{p}.conv1.weight"),
                   "bn2": bn(f"{p}.bn2"),
                   "prelu": {"alpha": sd[f"{p}.prelu.weight"]},
                   "conv2": conv(f"{p}.conv2.weight"),
                   "bn3": bn(f"{p}.bn3")}
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = conv(f"{p}.downsample.0.weight")
                blk["downsample_bn"] = bn(f"{p}.downsample.1")
            params[f"layer{si + 1}_{bi}"] = blk

    # fc: torch flattens NCHW (c, y, x); ours flattens NHWC (y, x, c)
    w = sd["fc.weight"].T                       # [512*7*7 rows (c,y,x), 512]
    c, hw = 512, 7
    rows = w.reshape(c, hw, hw, -1).transpose(1, 2, 0, 3).reshape(c * hw * hw, -1)
    params["fc"] = {"kernel": rows, "bias": sd["fc.bias"]}
    params["features"] = bn("features")
    return jax.tree.map(jnp.asarray, params)


class HashEmbedder:
    """Deterministic fallback identity embedder (no weights available):
    a fixed random projection of 16x16 downsampled pixels.  Stable across
    runs so ids are consistent; NOT identity-discriminative like ArcFace —
    used to keep the pipeline runnable in weightless environments."""

    def __init__(self, dim: int = 512, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(0, 1.0 / 16, (3 * 16 * 16, dim)).astype(np.float32)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        import cv2

        out = []
        for img in images:
            small = cv2.resize(img.transpose(1, 2, 0), (16, 16)).reshape(-1)
            v = small @ self.proj
            out.append(v / (np.linalg.norm(v) + 1e-6))
        return np.stack(out)
