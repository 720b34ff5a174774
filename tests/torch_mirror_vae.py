"""Torch mirror of the diffusers `AutoencoderKLCogVideoX` encoder/decoder.

The reference consumes this VAE through diffusers (`infer.py:278` /
`train.py:412-466`); diffusers isn't installed here, so the CausalConv3d /
SpatialNorm3D / Resnet / Down-/Upsample semantics are re-implemented
literally in torch, with diffusers' module naming — `state_dict()` feeds
`import_vae` directly for cross-implementation parity tests of the JAX
`models/vae.py` (VERDICT r2 item 1c).

Mirrored semantics:
  * CausalConv3d: temporal front-pad = (kt-1) replicated first frames,
    spatial zero pad, then a dense Conv3d.
  * SpatialNorm3D: nearest-interpolate zq to f's T/H/W with the
    odd-frame-count first-frame split, then GroupNorm(f)*conv_y(zq)+conv_b.
  * Downsample: odd-length temporal avg-pool passthrough of frame 0, then
    right/bottom-padded stride-2 Conv2d per frame.
  * Upsample: causal 2t-1 nearest temporal + 2x nearest spatial, Conv2d.
All tensors [B, C, T, H, W] (torch layout).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class MCausalConv3d(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        k = (k, k, k) if isinstance(k, int) else k
        self.kt = k[0]
        self.hp, self.wp = k[1] // 2, k[2] // 2
        self.conv = nn.Conv3d(cin, cout, k, stride=1, padding=0)

    def forward(self, x):
        if self.kt > 1:
            front = x[:, :, :1].repeat(1, 1, self.kt - 1, 1, 1)
            x = torch.cat([front, x], dim=2)
        x = F.pad(x, (self.wp, self.wp, self.hp, self.hp), mode="constant")
        return self.conv(x)


class MSpatialNorm3D(nn.Module):
    def __init__(self, f_channels, zq_channels, groups):
        super().__init__()
        self.norm_layer = nn.GroupNorm(groups, f_channels, eps=1e-6,
                                       affine=True)
        self.conv_y = MCausalConv3d(zq_channels, f_channels, 1)
        self.conv_b = MCausalConv3d(zq_channels, f_channels, 1)

    def forward(self, f, zq):
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            f_first, f_rest = f[:, :, :1], f[:, :, 1:]
            z_first, z_rest = zq[:, :, :1], zq[:, :, 1:]
            z_first = F.interpolate(z_first, size=f_first.shape[-3:])
            z_rest = F.interpolate(z_rest, size=f_rest.shape[-3:])
            zq = torch.cat([z_first, z_rest], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[-3:])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class MResnet3D(nn.Module):
    def __init__(self, cin, cout, groups, zq_channels=None):
        super().__init__()
        if zq_channels is None:
            self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6, affine=True)
            self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6, affine=True)
        else:
            self.norm1 = MSpatialNorm3D(cin, zq_channels, groups)
            self.norm2 = MSpatialNorm3D(cout, zq_channels, groups)
        self.conv1 = MCausalConv3d(cin, cout, 3)
        self.conv2 = MCausalConv3d(cout, cout, 3)
        self.conv_shortcut = (MCausalConv3d(cin, cout, 1)
                              if cin != cout else None)
        self.spatial = zq_channels is not None

    def forward(self, x, zq=None):
        n1 = self.norm1(x, zq) if self.spatial else self.norm1(x)
        h = self.conv1(F.silu(n1))
        n2 = self.norm2(h, zq) if self.spatial else self.norm2(h)
        h = self.conv2(F.silu(n2))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class MDownsample3D(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            b, c, t, h, w = x.shape
            xt = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, t)
            if t % 2 == 1:
                first, rest = xt[..., :1], xt[..., 1:]
                if rest.shape[-1] > 0:
                    rest = F.avg_pool1d(rest, kernel_size=2, stride=2)
                xt = torch.cat([first, rest], dim=-1)
            else:
                xt = F.avg_pool1d(xt, kernel_size=2, stride=2)
            t2 = xt.shape[-1]
            x = xt.reshape(b, h, w, c, t2).permute(0, 3, 4, 1, 2)
        x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
        b, c, t, h, w = x.shape
        y = self.conv(x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
        return y.reshape(b, t, *y.shape[1:]).permute(0, 2, 1, 3, 4)


class MUpsample3D(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=1, padding=1)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            if x.shape[2] > 1 and x.shape[2] % 2 == 1:
                x_first, x_rest = x[:, :, 0], x[:, :, 1:]
                x_first = F.interpolate(x_first, scale_factor=2.0)
                x_rest = F.interpolate(x_rest, scale_factor=2.0)
                x = torch.cat([x_first[:, :, None], x_rest], dim=2)
            elif x.shape[2] > 1:
                x = F.interpolate(x, scale_factor=2.0)
            else:
                y = F.interpolate(x.squeeze(2), scale_factor=2.0)
                x = y[:, :, None]
        else:
            b, c, t, h, w = x.shape
            y = F.interpolate(x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w),
                              scale_factor=2.0)
            x = y.reshape(b, t, *y.shape[1:]).permute(0, 2, 1, 3, 4)
        b, c, t, h, w = x.shape
        y = self.conv(x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
        return y.reshape(b, t, *y.shape[1:]).permute(0, 2, 1, 3, 4)


class _DownBlock(nn.Module):
    def __init__(self, cin, ch, layers, groups, downsample, compress_time):
        super().__init__()
        self.resnets = nn.ModuleList(
            [MResnet3D(cin if j == 0 else ch, ch, groups)
             for j in range(layers)])
        self.downsamplers = (nn.ModuleList([MDownsample3D(ch, compress_time)])
                             if downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _MidBlock(nn.Module):
    def __init__(self, ch, groups, zq_channels=None):
        super().__init__()
        self.resnets = nn.ModuleList(
            [MResnet3D(ch, ch, groups, zq_channels) for _ in range(2)])

    def forward(self, x, zq=None):
        for r in self.resnets:
            x = r(x, zq)
        return x


class _UpBlock(nn.Module):
    def __init__(self, cin, ch, layers, groups, zq_channels, upsample,
                 compress_time):
        super().__init__()
        self.resnets = nn.ModuleList(
            [MResnet3D(cin if j == 0 else ch, ch, groups, zq_channels)
             for j in range(layers + 1)])
        self.upsamplers = (nn.ModuleList([MUpsample3D(ch, compress_time)])
                           if upsample else None)

    def forward(self, x, zq):
        for r in self.resnets:
            x = r(x, zq)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class MirrorEncoder(nn.Module):
    def __init__(self, chans, layers_per_block, latent, groups,
                 temporal_levels=2, in_channels=3):
        super().__init__()
        self.conv_in = MCausalConv3d(in_channels, chans[0], 3)
        blocks = []
        prev = chans[0]
        for i, ch in enumerate(chans):
            blocks.append(_DownBlock(prev, ch, layers_per_block, groups,
                                     downsample=i < len(chans) - 1,
                                     compress_time=i < temporal_levels))
            prev = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _MidBlock(chans[-1], groups)
        self.norm_out = nn.GroupNorm(groups, chans[-1], eps=1e-6, affine=True)
        self.conv_out = MCausalConv3d(chans[-1], 2 * latent, 3)

    def forward(self, x):
        h = self.conv_in(x)
        for b in self.down_blocks:
            h = b(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class MirrorDecoder(nn.Module):
    def __init__(self, chans, layers_per_block, latent, groups,
                 temporal_levels=2, out_channels=3):
        super().__init__()
        rev = tuple(reversed(chans))
        self.conv_in = MCausalConv3d(latent, rev[0], 3)
        self.mid_block = _MidBlock(rev[0], groups, zq_channels=latent)
        blocks = []
        prev = rev[0]
        for i, ch in enumerate(rev):
            blocks.append(_UpBlock(prev, ch, layers_per_block, groups, latent,
                                   upsample=i < len(rev) - 1,
                                   compress_time=i < temporal_levels))
            prev = ch
        self.up_blocks = nn.ModuleList(blocks)
        self.norm_out = MSpatialNorm3D(rev[-1], latent, groups)
        self.conv_out = MCausalConv3d(rev[-1], out_channels, 3)

    def forward(self, z):
        zq = z
        h = self.conv_in(z)
        h = self.mid_block(h, zq)
        for b in self.up_blocks:
            h = b(h, zq)
        h = self.norm_out(h, zq)
        return self.conv_out(F.silu(h))


class MirrorVAE(nn.Module):
    """Container so state_dict keys carry the encoder./decoder. prefixes."""

    def __init__(self, chans=(8, 8, 16, 16), layers_per_block=1, latent=4,
                 groups=4):
        super().__init__()
        self.encoder = MirrorEncoder(chans, layers_per_block, latent, groups)
        self.decoder = MirrorDecoder(chans, layers_per_block, latent, groups)
