"""Causal 3D VAE (CogVideoX `AutoencoderKLCogVideoX` semantics) in JAX.

The reference consumes this VAE through diffusers for encode (conditioning
image + training videos, `pipeline_bindyouravatar.py:376-458`,
`train.py:1081-1093`) and decode (`decode_latents`, `:460-466`).  Re-derived
here TPU-first: channels-last NDHWC layout (XLA conv-friendly), fp32 group
norms, causal temporal padding by first-frame replication, avg-pool temporal
downsample with odd-first-frame passthrough, nearest temporal/spatial
upsampling with the 2t-1 first-frame special case.

Public tensors follow the reference layout: video [B, T, 3, H, W],
latents [B, T', C_lat, H/8, W/8]; scaling_factor 1.15258426.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig


class CausalConv3d(nn.Module):
    """3D conv, temporally causal: front-pad (kt-1) replicated first frames."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        if kt > 1:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        ph, pw = kh // 2, kw // 2
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding=[(0, 0), (ph, ph), (pw, pw)],
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class GroupNorm(nn.Module):
    groups: int = 32
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        y = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="gn")(x.astype(jnp.float32))
        return y.astype(dt)


class SpatialNorm3D(nn.Module):
    """Decoder norm modulated by the latent zq (CogVideoXSpatialNorm3D)."""
    features: int
    zq_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq):
        # upsample zq (nearest) to x's T/H/W — diffusers splits the first
        # frame only when x's frame count is odd (>1); even counts get a
        # plain nearest interpolate (parity: tests/test_vae_parity.py)
        bt, t, h, w, _ = x.shape
        zt = zq.shape[1]
        if zt != t:
            if t > 1 and t % 2 == 1 and zt > 1:
                first, rest = zq[:, :1], zq[:, 1:]
                idx = (jnp.arange(t - 1) * (zt - 1)) // (t - 1)
                rest = jnp.take(rest, idx, axis=1)
                zq = jnp.concatenate([first, rest], axis=1)
            else:
                idx = (jnp.arange(t) * zt) // t
                zq = jnp.take(zq, idx, axis=1)
        if zq.shape[2] != h:
            fh, fw = h // zq.shape[2], w // zq.shape[3]
            zq = jnp.repeat(jnp.repeat(zq, fh, axis=2), fw, axis=3)
        norm = GroupNorm(self.groups, param_dtype=self.param_dtype, name="norm_layer")(x)
        scale = CausalConv3d(self.features, (1, 1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv_y")(zq)
        shift = CausalConv3d(self.features, (1, 1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv_b")(zq)
        return norm * scale + shift


class ResnetBlock3D(nn.Module):
    out_features: int
    zq_channels: Optional[int] = None   # set => decoder spatial norm
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None):
        in_features = x.shape[-1]

        def norm(name):
            if self.zq_channels is None:
                return lambda h: GroupNorm(self.groups, param_dtype=self.param_dtype,
                                           name=name)(h)
            return lambda h: SpatialNorm3D(in_features if name == "norm1" else self.out_features,
                                           self.zq_channels, self.groups,
                                           dtype=self.dtype, param_dtype=self.param_dtype,
                                           name=name)(h, zq)

        h = norm("norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.out_features, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv1")(h)
        h = norm("norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_features, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv2")(h)
        if in_features != self.out_features:
            x = CausalConv3d(self.out_features, (1, 1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


def _temporal_avg_pool(x):
    """Causal temporal 2x pool with odd-first-frame passthrough."""
    t = x.shape[1]
    if t % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        if rest.shape[1] > 0:
            rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
        return jnp.concatenate([first, rest], axis=1)
    return 0.5 * (x[:, 0::2] + x[:, 1::2])


class Downsample3D(nn.Module):
    """Spatial stride-2 conv (pad right/bottom), optional temporal pool."""
    features: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            x = _temporal_avg_pool(x)
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 1), (0, 1), (0, 0)])
        return nn.Conv(self.features, (1, 3, 3), strides=(1, 2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class Upsample3D(nn.Module):
    """Nearest 2x spatial (and causal 2t-1 temporal) upsample + conv."""
    features: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time and x.shape[1] > 1:
            if x.shape[1] % 2 == 1:
                # causal odd path: frame 0 kept once -> 2t-1 (the 13->25->49
                # production chain)
                first, rest = x[:, :1], x[:, 1:]
                rest = jnp.repeat(rest, 2, axis=1)
                x = jnp.concatenate([first, rest], axis=1)
            else:
                # diffusers CogVideoXUpsample3D interpolates the whole
                # tensor for even t (t -> 2t); parity-pinned in
                # tests/test_vae_parity.py
                x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return nn.Conv(self.features, (1, 3, 3), padding=[(0, 0), (1, 1), (1, 1)],
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class Encoder3D(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        kw = dict(dtype=c.dtype, param_dtype=c.param_dtype)
        import math
        temporal_levels = int(math.log2(c.temporal_compression_ratio))

        h = CausalConv3d(c.block_out_channels[0], **kw, name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock3D(ch, groups=c.norm_num_groups, **kw,
                                  name=f"down_{i}_res_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                h = Downsample3D(ch, compress_time=i < temporal_levels, **kw,
                                 name=f"down_{i}_downsample")(h)
        for j in range(2):
            h = ResnetBlock3D(c.block_out_channels[-1], groups=c.norm_num_groups,
                              **kw, name=f"mid_res_{j}")(h)
        h = GroupNorm(c.norm_num_groups, param_dtype=c.param_dtype, name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(2 * c.latent_channels, **kw, name="conv_out")(h)


class Decoder3D(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        kw = dict(dtype=c.dtype, param_dtype=c.param_dtype)
        import math
        temporal_levels = int(math.log2(c.temporal_compression_ratio))
        rev = tuple(reversed(c.block_out_channels))   # (512, 256, 256, 128)
        zq = z

        h = CausalConv3d(rev[0], **kw, name="conv_in")(z)
        for j in range(2):
            h = ResnetBlock3D(rev[0], zq_channels=c.latent_channels,
                              groups=c.norm_num_groups, **kw,
                              name=f"mid_res_{j}")(h, zq)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock3D(ch, zq_channels=c.latent_channels,
                                  groups=c.norm_num_groups, **kw,
                                  name=f"up_{i}_res_{j}")(h, zq)
            if i < n - 1:
                h = Upsample3D(ch, compress_time=i < temporal_levels, **kw,
                               name=f"up_{i}_upsample")(h)
        h = SpatialNorm3D(rev[-1], c.latent_channels, c.norm_num_groups,
                          **kw, name="norm_out")(h, zq)
        h = nn.silu(h)
        return CausalConv3d(c.out_channels, **kw, name="conv_out")(h)


# jitted encoder/decoder bodies cached per (config, shape): the chunked
# encode/decode paths call the core repeatedly with 2-3 distinct chunk
# shapes — eager dispatch of the deep conv stacks costs minutes over the
# relay (measured: 49f x 480p chunked decode 293 s eager vs seconds jitted)
_VAE_JIT_CACHE: dict = {}


def _jitted_apply(kind: str, cfg, shape, dtype):
    key = (kind, cfg, shape, str(dtype))
    fn = _VAE_JIT_CACHE.get(key)
    if fn is None:
        mod = (Encoder3D if kind == "enc" else Decoder3D)(cfg)
        fn = jax.jit(lambda p, x: mod.apply({"params": p}, x))
        _VAE_JIT_CACHE[key] = fn
    return fn


@dataclasses.dataclass(frozen=True)
class CausalVAE:
    """Public API in reference layout ([B,T,C,H,W]); NDHWC internally."""
    cfg: VAEConfig = VAEConfig()

    def init(self, key: jax.Array) -> dict:
        c = self.cfg
        k1, k2 = jax.random.split(key)
        enc = Encoder3D(c).init(k1, jnp.zeros((1, 1, 8, 8, c.in_channels), c.dtype))
        t_lat = 1
        dec = Decoder3D(c).init(
            k2, jnp.zeros((1, t_lat, 1, 1, c.latent_channels), c.dtype))
        return {"encoder": enc["params"], "decoder": dec["params"]}

    def encode_moments(self, params, video: jnp.ndarray) -> jnp.ndarray:
        """video [B,T,3,H,W] in [-1,1] -> moments [B,T',2C,H/8,W/8]."""
        x = video.transpose(0, 1, 3, 4, 2).astype(self.cfg.dtype)
        m = _jitted_apply("enc", self.cfg, x.shape, x.dtype)(
            params["encoder"], x)
        return m.transpose(0, 1, 4, 2, 3).astype(jnp.float32)

    def encode(self, params, video: jnp.ndarray, key: Optional[jax.Array] = None,
               sample: bool = False,
               temporal_chunk: Optional[int] = None) -> jnp.ndarray:
        """Returns scaled latents [B,T',C,H/8,W/8] (mode unless sample).

        `temporal_chunk`: encode in chunks of that many LATENT frames with
        2 context latent frames (8 pixel frames) of causal left context —
        approximate at chunk joins (GroupNorm stats + pooling-phase
        truncation), memory ~T/chunk-fold lower."""
        r = self.cfg.temporal_compression_ratio
        t_px = video.shape[1]
        t_lat = (t_px - 1) // r + 1
        if temporal_chunk is None or t_lat <= temporal_chunk:
            moments = self.encode_moments(params, video)
            mean, logvar = jnp.split(moments, 2, axis=2)
            if sample:
                logvar = jnp.clip(logvar, -30.0, 20.0)
                mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                    key, mean.shape, mean.dtype)
            return mean * self.cfg.scaling_factor

        ctx = 2  # latent frames of left context
        outs = []
        i = 0
        while i < t_lat:
            k = min(temporal_chunk, t_lat - i)
            lo_lat = max(0, i - ctx)
            # pixels owned by latents [lo_lat, i+k): latent j>0 owns
            # pixels 4j-3..4j; latent 0 owns pixel 0
            px_lo = 0 if lo_lat == 0 else 4 * lo_lat - 3
            px_hi = min(t_px, 4 * (i + k - 1) + 1)
            chunk_key = None if key is None else jax.random.fold_in(key, i)
            lat = self.encode(params, video[:, px_lo:px_hi], chunk_key, sample)
            outs.append(lat[:, -k:])   # keep the owned latent frames
            i += k
        return jnp.concatenate(outs, axis=1)

    def decode(self, params, latents: jnp.ndarray,
               temporal_chunk: Optional[int] = None) -> jnp.ndarray:
        """Scaled latents [B,T',C,h,w] -> video [B,T,3,H,W] in [-1,1].

        `temporal_chunk`: decode in chunks of that many latent frames with
        one context latent frame of overlap — cuts peak activation memory
        ~T'/chunk-fold for 49f x 480p decode on 16 GB chips.  Chunk
        boundaries are approximate (GroupNorm statistics are per-chunk and
        the causal receptive field is truncated at the context edge — the
        same approximation class as the reference's VAE tiling flags,
        SURVEY §2.9)."""
        if temporal_chunk is None or latents.shape[1] <= temporal_chunk:
            z = (latents / self.cfg.scaling_factor).transpose(0, 1, 3, 4, 2)
            z = z.astype(self.cfg.dtype)
            x = _jitted_apply("dec", self.cfg, z.shape, z.dtype)(
                params["decoder"], z)
            return x.transpose(0, 1, 4, 2, 3).astype(jnp.float32)

        outs = [c for _, c in
                self.decode_stream(params, latents, temporal_chunk)]
        return jnp.concatenate(outs, axis=1)

    def decode_stream(self, params, latents: jnp.ndarray,
                      temporal_chunk: Optional[int] = None):
        """Generator form of chunked `decode`: yields
        `(start_pixel_frame, chunk [B,t,3,H,W])` as each temporal chunk
        finishes, so serving can mux/ship early frames while the tail is
        still decoding.  Concatenating the yielded chunks along axis 1
        equals `decode(...)` exactly (same chunking, same jit cache)."""
        if temporal_chunk is None or latents.shape[1] <= temporal_chunk:
            yield 0, self.decode(params, latents)
            return
        t_lat = latents.shape[1]
        r = self.cfg.temporal_compression_ratio
        # first chunk takes temporal_chunk+1 frames WITHOUT context so every
        # chunk (except a ragged tail) decodes at the same [*, k+1, ...]
        # shape — one compile serves the whole clip (per-shape jit cache)
        k = temporal_chunk
        first = min(k + 1, t_lat)
        # trim to the owned pixel count: an even-sized first chunk decodes to
        # 4t frames (diffusers even-t upsample), not 4(t-1)+1
        yield 0, self.decode(params, latents[:, :first])[:, : r * (first - 1) + 1]
        pos = r * (first - 1) + 1
        i = first
        while i < t_lat:
            n = min(k, t_lat - i)
            chunk = self.decode(params, latents[:, i - 1:i + n])
            yield pos, chunk[:, 1:1 + r * n]         # drop context pixels
            pos += r * n
            i += n

    @classmethod
    def tiny(cls) -> "CausalVAE":
        return cls(VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                             latent_channels=4, norm_num_groups=4,
                             dtype=jnp.float32))
