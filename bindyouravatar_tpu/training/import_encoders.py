"""Torch-checkpoint importers for the encoder stacks (T5, EVA-CLIP).

The reference loads these via transformers / the vendored eva_clip package;
these functions map their torch state dicts into our flax param trees so
released weights drop in (zero-egress build environments can't fetch them,
so tests validate the mapping against synthetic dicts with real shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Union

import numpy as np

from ..config import EVACLIPConfig, T5Config

StateDict = Dict[str, np.ndarray]


def _load_sd(sd_or_path) -> StateDict:
    if isinstance(sd_or_path, str):
        if sd_or_path.endswith(".safetensors"):
            from safetensors import safe_open

            out = {}
            with safe_open(sd_or_path, framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
        import torch

        obj = torch.load(sd_or_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in obj.items()}
    return sd_or_path


def _t(sd: StateDict, k: str) -> np.ndarray:
    return sd[k].astype(np.float32).T


def import_t5_encoder(sd_or_path, cfg: T5Config = T5Config()) -> Dict[str, Any]:
    """HF T5EncoderModel state dict -> our `T5Encoder` tree."""
    sd = _load_sd(sd_or_path)
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    shared = "shared.weight" if "shared.weight" in sd else f"{pre}embed_tokens.weight"

    params: Dict[str, Any] = {
        "token_embedding": sd[shared].astype(np.float32),
        "relative_attention_bias": sd[
            f"{pre}block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ].astype(np.float32),
        "final_ln": {"weight": sd[f"{pre}final_layer_norm.weight"].astype(np.float32)},
    }
    for i in range(cfg.num_layers):
        b = f"{pre}block.{i}.layer"
        params[f"block_{i}"] = {
            "ln_attn": {"weight": sd[f"{b}.0.layer_norm.weight"].astype(np.float32)},
            "attn": {
                "q": {"kernel": _t(sd, f"{b}.0.SelfAttention.q.weight")},
                "k": {"kernel": _t(sd, f"{b}.0.SelfAttention.k.weight")},
                "v": {"kernel": _t(sd, f"{b}.0.SelfAttention.v.weight")},
                "o": {"kernel": _t(sd, f"{b}.0.SelfAttention.o.weight")},
            },
            "ln_ff": {"weight": sd[f"{b}.1.layer_norm.weight"].astype(np.float32)},
            "wi_0": {"kernel": _t(sd, f"{b}.1.DenseReluDense.wi_0.weight")},
            "wi_1": {"kernel": _t(sd, f"{b}.1.DenseReluDense.wi_1.weight")},
            "wo": {"kernel": _t(sd, f"{b}.1.DenseReluDense.wo.weight")},
        }
    return params


def import_eva_vision(sd_or_path, cfg: EVACLIPConfig = EVACLIPConfig()) -> Dict[str, Any]:
    """EVA02-CLIP visual-tower state dict (reference vendored package naming,
    optionally `visual.`-prefixed) -> our `EVAVisionTower` tree."""
    sd = _load_sd(sd_or_path)
    pre = "visual." if any(k.startswith("visual.") for k in sd) else ""

    def g(k):
        return sd[pre + k].astype(np.float32)

    # EVA applies RoPE in the interleaved-pair convention; our tower uses
    # rotate-half tables (`ops/rope.py` note) — permute W_q/W_k output
    # channels (and q_bias) per head so attention scores match bit-wise
    dh = cfg.width // cfg.heads
    p1 = np.concatenate([np.arange(0, dh, 2), np.arange(1, dh, 2)])
    qk_perm = (np.concatenate([p1 + h * dh for h in range(cfg.heads)])
               if cfg.use_rope else np.arange(cfg.width))

    conv = g("patch_embed.proj.weight")              # [width, 3, p, p]
    params: Dict[str, Any] = {
        "patch_embed": {"kernel": conv.transpose(2, 3, 1, 0),
                        "bias": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
        "head": {"kernel": g("head.weight").T, "bias": g("head.bias")},
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": {"scale": g(f"{b}.norm1.weight"), "bias": g(f"{b}.norm1.bias")},
            "norm2": {"scale": g(f"{b}.norm2.weight"), "bias": g(f"{b}.norm2.bias")},
            "attn": {
                "q_proj": {"kernel": g(f"{b}.attn.q_proj.weight").T[:, qk_perm],
                           "bias": g(f"{b}.attn.q_bias")[qk_perm]},
                "k_proj": {"kernel": g(f"{b}.attn.k_proj.weight").T[:, qk_perm]},
                "v_proj": {"kernel": g(f"{b}.attn.v_proj.weight").T,
                           "bias": g(f"{b}.attn.v_bias")},
                "inner_attn_ln": {"scale": g(f"{b}.attn.inner_attn_ln.weight"),
                                  "bias": g(f"{b}.attn.inner_attn_ln.bias")},
                "proj": {"kernel": g(f"{b}.attn.proj.weight").T,
                         "bias": g(f"{b}.attn.proj.bias")},
            },
            "w1": {"kernel": g(f"{b}.mlp.w1.weight").T, "bias": g(f"{b}.mlp.w1.bias")},
            "w2": {"kernel": g(f"{b}.mlp.w2.weight").T, "bias": g(f"{b}.mlp.w2.bias")},
            "ffn_ln": {"scale": g(f"{b}.mlp.ffn_ln.weight"),
                       "bias": g(f"{b}.mlp.ffn_ln.bias")},
            "w3": {"kernel": g(f"{b}.mlp.w3.weight").T, "bias": g(f"{b}.mlp.w3.bias")},
        }
    return params


# ------------------------------------------------------------------ #
# CogVideoX causal 3D VAE (diffusers AutoencoderKLCogVideoX)
# ------------------------------------------------------------------ #

def vae_key_map(cfg) -> Dict[str, tuple]:
    """Map diffusers `AutoencoderKLCogVideoX` state-dict keys -> (our
    flat param path, kind).  kind: 'conv3d' [out,in,kt,kh,kw] -> NDHWC
    kernel; 'conv2d' [out,in,kh,kw] -> our (1,kh,kw) kernel; 'vec'.

    Loaded by the reference at `infer.py:278` (`pipe = ...from_pretrained`)
    and `train.py:412-466`; module naming per diffusers
    `autoencoder_kl_cogvideox.py` (CausalConv3d wraps `conv`; the
    down/upsamplers use plain Conv2d).
    """
    m: Dict[str, tuple] = {}

    def conv(theirs, ours, kind="conv3d"):
        # CogVideoXCausalConv3d and the down/upsamplers wrap an inner `conv`
        m[f"{theirs}.conv.weight"] = (f"{ours}/conv/kernel", kind)
        m[f"{theirs}.conv.bias"] = (f"{ours}/conv/bias", "vec")

    def gn(theirs, ours):
        m[f"{theirs}.weight"] = (f"{ours}/gn/scale", "vec")
        m[f"{theirs}.bias"] = (f"{ours}/gn/bias", "vec")

    def resnet(theirs, ours, spatial: bool, has_shortcut: bool):
        for norm in ("norm1", "norm2"):
            if spatial:
                gn(f"{theirs}.{norm}.norm_layer", f"{ours}/{norm}/norm_layer")
                conv(f"{theirs}.{norm}.conv_y", f"{ours}/{norm}/conv_y")
                conv(f"{theirs}.{norm}.conv_b", f"{ours}/{norm}/conv_b")
            else:
                gn(f"{theirs}.{norm}", f"{ours}/{norm}")
        conv(f"{theirs}.conv1", f"{ours}/conv1")
        conv(f"{theirs}.conv2", f"{ours}/conv2")
        if has_shortcut:
            conv(f"{theirs}.conv_shortcut", f"{ours}/conv_shortcut")

    chans = cfg.block_out_channels
    n = len(chans)

    # encoder
    conv("encoder.conv_in", "encoder/conv_in")
    prev = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            cin = prev if j == 0 else ch
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   f"encoder/down_{i}_res_{j}", spatial=False,
                   has_shortcut=cin != ch)
        prev = ch
        if i < n - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0",
                 f"encoder/down_{i}_downsample", kind="conv2d")
    for j in range(2):
        resnet(f"encoder.mid_block.resnets.{j}", f"encoder/mid_res_{j}",
               spatial=False, has_shortcut=False)
    gn("encoder.norm_out", "encoder/norm_out")
    conv("encoder.conv_out", "encoder/conv_out")

    # decoder
    rev = tuple(reversed(chans))
    conv("decoder.conv_in", "decoder/conv_in")
    for j in range(2):
        resnet(f"decoder.mid_block.resnets.{j}", f"decoder/mid_res_{j}",
               spatial=True, has_shortcut=False)
    prev = rev[0]
    for i, ch in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            cin = prev if j == 0 else ch
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   f"decoder/up_{i}_res_{j}", spatial=True,
                   has_shortcut=cin != ch)
        prev = ch
        if i < n - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0",
                 f"decoder/up_{i}_upsample", kind="conv2d")
    gn("decoder.norm_out.norm_layer", "decoder/norm_out/norm_layer")
    conv("decoder.norm_out.conv_y", "decoder/norm_out/conv_y")
    conv("decoder.norm_out.conv_b", "decoder/norm_out/conv_b")
    conv("decoder.conv_out", "decoder/conv_out")
    return m


def import_vae(sd_or_path, vae) -> Dict[str, Any]:
    """diffusers `AutoencoderKLCogVideoX` torch state dict -> `CausalVAE`
    param tree (torch conv [out,in,kt,kh,kw] -> flax NDHWC
    [kt,kh,kw,in,out]; the 2D down/upsampler convs gain a length-1
    temporal axis)."""
    import flax.traverse_util as tu

    sd = _load_sd(sd_or_path)
    flat: Dict[tuple, np.ndarray] = {}
    for theirs, (ours, kind) in vae_key_map(vae.cfg).items():
        # tolerate dicts saved without the inner `conv` wrapper
        key = theirs if theirs in sd else theirs.replace(".conv.", ".")
        w = np.asarray(sd[key]).astype(np.float32)
        if kind == "conv3d":
            w = w.transpose(2, 3, 4, 1, 0)          # [kt,kh,kw,in,out]
        elif kind == "conv2d":
            w = w.transpose(2, 3, 1, 0)[None]       # [1,kh,kw,in,out]
        flat[tuple(ours.split("/"))] = w
    tree = tu.unflatten_dict(flat)
    return {"encoder": tree["encoder"], "decoder": tree["decoder"]}
