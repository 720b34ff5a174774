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
                "q_proj": {"kernel": g(f"{b}.attn.q_proj.weight").T,
                           "bias": g(f"{b}.attn.q_bias")},
                "k_proj": {"kernel": g(f"{b}.attn.k_proj.weight").T},
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
