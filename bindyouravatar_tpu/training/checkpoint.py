"""Checkpoint / resume (reference `train.py:538-633, 882-1044, 1596-1650`).

Formats:
  * orbax for the full train state (params, opt state, step, EMA, sampler
    cursor) with `latest` auto-scan and total-limit rotation — the
    Accelerate `save_state` equivalent;
  * separate audio/face/router sub-module trees (the reference keeps
    `audio_modules.pt` / `face_modules.pt` / `router_modules.pt` so
    inference can mix-and-match, `transformer.py:461-513`) — same contract,
    as orbax dirs;
  * a torch-checkpoint importer for the reference's sharded safetensors
    (incl. the 16->32->48 patch-embed channel surgery of
    `transformer.py:1061-1073` and the RoPE interleave->rotate-half Q/K
    permutation, see `ops/rope.py`).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

SUBMODULE_KEYS = {
    "audio": ("audio_statics", "audio_layers"),
    "face": ("lfe", "perceiver"),
    "router": ("router_norms", "router_layers", "router_trunk"),
}


def _mgr(directory: str, total_limit: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=total_limit, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_checkpoint(directory: str, step: int, payload: Dict[str, Any],
                    total_limit: Optional[int] = None) -> None:
    """payload: any pytree dict (e.g. {'params':..., 'opt_state':...,
    'sampler_cursor': int})."""
    with _mgr(directory, total_limit) as m:
        m.save(step, args=ocp.args.StandardSave(payload))
        m.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _mgr(directory) as m:
        return m.latest_step()


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore `step` (or latest).  `like` provides the target structure /
    shardings (pass the abstract or concrete pytree)."""
    with _mgr(directory) as m:
        step = step if step is not None else m.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        if like is not None:
            ref = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return m.restore(step, args=ocp.args.StandardRestore(ref))
        return m.restore(step)


# ------------------------------------------------------------------ #
# sub-module checkpoints (audio/face/router interop contract)
# ------------------------------------------------------------------ #

def save_submodules(params: Dict[str, Any], directory: str) -> None:
    for name, keys in SUBMODULE_KEYS.items():
        sub = {k: params[k] for k in keys if k in params}
        if sub:
            path = os.path.join(directory, f"{name}_modules")
            if os.path.isdir(path):
                shutil.rmtree(path)
            with ocp.StandardCheckpointer() as ck:
                ck.save(os.path.abspath(path), sub)


def load_submodules(params: Dict[str, Any], directory: str,
                    names: Optional[List[str]] = None) -> Dict[str, Any]:
    """Merge saved sub-module trees into `params` (functional update)."""
    out = dict(params)
    for name in names or list(SUBMODULE_KEYS):
        path = os.path.join(directory, f"{name}_modules")
        if not os.path.isdir(path):
            continue
        keys = SUBMODULE_KEYS[name]
        ref = {k: jax.tree.map(ocp.utils.to_shape_dtype_struct, params[k])
               for k in keys if k in params}
        with ocp.StandardCheckpointer() as ck:
            sub = ck.restore(os.path.abspath(path), ref)
        out.update(sub)
    return out


# ------------------------------------------------------------------ #
# reference torch checkpoint import
# ------------------------------------------------------------------ #

def _rope_permutation(head_dim: int) -> np.ndarray:
    """interleaved pair layout -> rotate-half layout (see ops/rope.py)."""
    return np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def import_reference_dit(safetensor_files: List[str], dit,
                         target_in_channels: Optional[int] = None) -> Dict[str, Any]:
    """Convert a reference `BindyouravatarTransformer3DModel` state dict
    (sharded safetensors) into our DiT param tree.

    Handles: Linear transpose (torch [out,in] -> kernel [in,out]); per-head
    RoPE channel permutation of attn1 q/k (+ their QK-norm affines); the
    patch-embed conv -> matmul repack and in-channel growth surgery
    (`transformer.py:1061-1073`).  Conditioning sub-modules load via
    `import_reference_submodules`.
    """
    if isinstance(safetensor_files, dict):      # in-memory state dict
        sd: Dict[str, np.ndarray] = {k: np.asarray(v)
                                     for k, v in safetensor_files.items()}
    else:
        from safetensors import safe_open

        sd = {}
        for f in safetensor_files:
            with safe_open(f, framework="np") as fp:
                for k in fp.keys():
                    sd[k] = fp.get_tensor(k)

    c = dit.cfg
    heads, hd = c.num_attention_heads, c.attention_head_dim
    perm = _rope_permutation(hd)
    full_perm = np.concatenate([perm + h * hd for h in range(heads)])

    params = dit.init(jax.random.key(0))

    def lin(name, key_w, key_b=None, permute_out=False):
        w = sd[key_w].astype(np.float32).T            # [in, out]
        if permute_out:
            w = w[:, full_perm]
        out = {"kernel": w}
        if key_b and key_b in sd:
            b = sd[key_b].astype(np.float32)
            out["bias"] = b[full_perm] if permute_out else b
        return out

    # patch embed: conv [dim, C, p, p] -> matmul kernel [C*p*p, dim]
    pw = sd["patch_embed.proj.weight"].astype(np.float32)
    dim = pw.shape[0]
    cin = pw.shape[1]
    tgt_cin = target_in_channels or c.in_channels
    if cin < tgt_cin:   # channel growth surgery: extra channels zero
        grown = np.zeros((dim, tgt_cin) + pw.shape[2:], np.float32)
        grown[:, :cin] = pw
        pw = grown
    pw = pw.reshape(dim, -1).T                        # [C*p*p, dim]
    params["patch_embed"] = {
        "proj": {"kernel": pw, "bias": sd["patch_embed.proj.bias"].astype(np.float32)},
        "text_proj": lin("t", "patch_embed.text_proj.weight", "patch_embed.text_proj.bias"),
    }
    params["time_embedding"] = {
        "linear_1": lin("l1", "time_embedding.linear_1.weight", "time_embedding.linear_1.bias"),
        "linear_2": lin("l2", "time_embedding.linear_2.weight", "time_embedding.linear_2.bias"),
    }

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    blocks = {}
    import jax.numpy as jnp

    stacked: Dict[str, List[np.ndarray]] = {}

    def put(path, arr):
        stacked.setdefault(path, []).append(arr)

    for i in range(c.num_layers):
        p = f"transformer_blocks.{i}"
        for norm in ("norm1", "norm2"):
            put(f"{norm}/linear/kernel", sd[f"{p}.{norm}.linear.weight"].astype(np.float32).T)
            put(f"{norm}/linear/bias", sd[f"{p}.{norm}.linear.bias"].astype(np.float32))
            put(f"{norm}/norm/scale", sd[f"{p}.{norm}.norm.weight"].astype(np.float32))
            put(f"{norm}/norm/bias", sd[f"{p}.{norm}.norm.bias"].astype(np.float32))
        for proj, permute in (("to_q", True), ("to_k", True), ("to_v", False)):
            d = lin("x", f"{p}.attn1.{proj}.weight", f"{p}.attn1.{proj}.bias", permute)
            put(f"attn1/{proj}/kernel", d["kernel"])
            put(f"attn1/{proj}/bias", d["bias"])
        # per-head QK-norm affine permutation
        put("attn1/norm_q/scale", sd[f"{p}.attn1.norm_q.weight"].astype(np.float32)[perm])
        put("attn1/norm_q/bias", sd[f"{p}.attn1.norm_q.bias"].astype(np.float32)[perm])
        put("attn1/norm_k/scale", sd[f"{p}.attn1.norm_k.weight"].astype(np.float32)[perm])
        put("attn1/norm_k/bias", sd[f"{p}.attn1.norm_k.bias"].astype(np.float32)[perm])
        d = lin("x", f"{p}.attn1.to_out.0.weight", f"{p}.attn1.to_out.0.bias")
        put("attn1/to_out/kernel", d["kernel"])
        put("attn1/to_out/bias", d["bias"])
        d = lin("x", f"{p}.ff.net.0.proj.weight", f"{p}.ff.net.0.proj.bias")
        put("ff/net_0/kernel", d["kernel"])
        put("ff/net_0/bias", d["bias"])
        d = lin("x", f"{p}.ff.net.2.weight", f"{p}.ff.net.2.bias")
        put("ff/net_2/kernel", d["kernel"])
        put("ff/net_2/bias", d["bias"])

    import flax.traverse_util as tu

    blocks = tu.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(np.stack(v)) for k, v in stacked.items()})
    params["blocks"] = blocks

    params["norm_final"] = ln("norm_final")
    params["norm_out"] = {
        "linear": lin("x", "norm_out.linear.weight", "norm_out.linear.bias"),
        "norm": ln("norm_out.norm"),
    }
    params["proj_out"] = lin("x", "proj_out.weight", "proj_out.bias")
    return params


# ------------------------------------------------------------------ #
# reference peft-LoRA safetensors import + fusion
# ------------------------------------------------------------------ #

def _parse_lora_stacked(files_or_sd, c) -> Dict[str, List[np.ndarray]]:
    """Parse reference peft LoRA safetensors (files or a state dict) into
    stacked per-layer A/B matrices in our kernel convention (A [in,r],
    B [r,out], RoPE-permuted q/k output channels)."""
    if isinstance(files_or_sd, dict):
        sd = {k: np.asarray(v) for k, v in files_or_sd.items()}
    else:
        from safetensors import safe_open

        sd = {}
        for f in files_or_sd:
            with safe_open(f, framework="np") as fp:
                for k in fp.keys():
                    sd[k] = fp.get_tensor(k)

    def norm_key(k):
        i = k.find("transformer_blocks.")
        return k[i:] if i >= 0 else k

    sd = {norm_key(k): v for k, v in sd.items()}

    heads, hd = c.num_attention_heads, c.attention_head_dim
    perm = _rope_permutation(hd)
    full_perm = np.concatenate([perm + h * hd for h in range(heads)])

    stacked: Dict[str, List[np.ndarray]] = {}
    for i in range(c.num_layers):
        for proj in ("to_q", "to_k"):
            base = f"transformer_blocks.{i}.attn1.{proj}"
            a = sd[f"{base}.lora_A.weight"].astype(np.float32).T   # [in, r]
            b = sd[f"{base}.lora_B.weight"].astype(np.float32).T   # [r, out]
            b = b[:, full_perm]          # RoPE permutation on the q/k delta
            stacked.setdefault(f"{proj}_lora_A", []).append(a)
            stacked.setdefault(f"{proj}_lora_B", []).append(b)
    return stacked


def fuse_lora_files(files_or_sd, dit, params: Dict[str, Any],
                    lora_alpha: float = 128.0) -> Dict[str, Any]:
    """Fold reference peft LoRA safetensors straight into the base q/k
    kernels — the inference path (reference `infer.py:199` load +
    `infer.py:279` `pipe.fuse_lora()`), usable when the DiT was built with
    `lora_rank=0` (no in-layer slots)."""
    import jax.numpy as jnp

    stacked = _parse_lora_stacked(files_or_sd, dit.cfg)
    attn1 = dict(params["blocks"]["attn1"])
    for proj in ("to_q", "to_k"):
        a = np.stack(stacked[f"{proj}_lora_A"])     # [L, in, r]
        b = np.stack(stacked[f"{proj}_lora_B"])     # [L, r, out]
        r = a.shape[-1]
        delta = jnp.einsum("lir,lro->lio", jnp.asarray(a),
                           jnp.asarray(b)) * (lora_alpha / r)
        base = dict(attn1[proj])
        base["kernel"] = (base["kernel"].astype(jnp.float32)
                          + delta).astype(attn1[proj]["kernel"].dtype)
        attn1[proj] = base
    out = dict(params)
    out["blocks"] = dict(params["blocks"], attn1=attn1)
    return out


def import_lora_safetensors(files_or_sd, dit, params: Dict[str, Any],
                            ) -> Dict[str, Any]:
    """Load reference peft LoRA safetensors into the in-layer stacked
    `blocks/attn1/to_{q,k}_lora_{A,B}` params.

    Mirrors `load_mixed_lora_weights` (reference `util/utils.py:1027-1048`,
    wired at `infer.py:199`): keys are
    `transformer[.module].transformer_blocks.{i}.attn1.to_{q,k}.lora_{A,B}.weight`
    with peft shapes A [r, in] / B [out, r].  Transposed to our kernel-style
    A [in, r] / B [r, out]; the B output channels of q/k get the same RoPE
    interleave->rotate-half permutation as the base weights (ops/rope.py).
    peft's alpha/r scaling convention matches ours, so values import raw.
    """
    c = dit.cfg
    if c.lora_rank <= 0:
        raise ValueError("DiT config has lora_rank=0 — no LoRA slots to fill "
                         "(use fuse_lora_files for inference configs)")
    stacked = _parse_lora_stacked(files_or_sd, c)

    import jax.numpy as jnp

    out = jax.tree.map(lambda x: x, params)    # shallow-ish copy
    attn1 = dict(out["blocks"]["attn1"])
    for name, mats in stacked.items():
        arr = jnp.asarray(np.stack(mats))
        if attn1[name].shape != arr.shape:
            raise ValueError(f"{name}: expected {attn1[name].shape}, "
                             f"got {arr.shape} (rank mismatch?)")
        attn1[name] = arr.astype(attn1[name].dtype)
    out["blocks"] = dict(out["blocks"], attn1=attn1)
    return out


def fuse_lora(params: Dict[str, Any], lora_alpha: float = 128.0) -> Dict[str, Any]:
    """Fold the in-layer LoRA deltas into the base q/k kernels and drop the
    LoRA params (reference `pipe.fuse_lora()`, `infer.py:279`) — the
    inference configuration then runs with `lora_rank=0` (saves 264 MB of
    weights and the per-step delta matmuls)."""
    import jax.numpy as jnp

    attn1 = dict(params["blocks"]["attn1"])
    for proj in ("to_q", "to_k"):
        a = attn1.pop(f"{proj}_lora_A", None)
        b = attn1.pop(f"{proj}_lora_B", None)
        if a is None or b is None:
            continue
        r = a.shape[-1]
        delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                           b.astype(jnp.float32)) * (lora_alpha / r)
        base = dict(attn1[proj])
        base["kernel"] = (base["kernel"].astype(jnp.float32)
                          + delta).astype(attn1[proj]["kernel"].dtype)
        attn1[proj] = base
    out = dict(params)
    out["blocks"] = dict(params["blocks"], attn1=attn1)
    return out
