"""Importers for the reference's conditioning sub-module checkpoints.

The reference distributes `audio_modules.pt`, `face_modules.pt`,
`router_modules.pt` (torch state dicts, saved by
`transformer.py:461-513` / `router.py:413-423`).  These map them into our
param trees so released weights drop into the TPU pipeline.

Accepts either a path to a `.pt` file (loaded with torch-cpu) or an
already-loaded `{name: np.ndarray}` dict (tests use synthetic dicts).

Notes:
  * torch Linear [out,in] -> flax kernel [in,out] (transpose);
  * LayerNorm weight/bias -> scale/bias;
  * the audio Conv1d(k=2,s=2) [C,C,2] repacks to our paired-matmul
    [2C, C] (W2[0:C]=W[:,:,0].T, W2[C:]=W[:,:,1].T);
  * router `layer_merge.*` is dead code in the reference forward
    (`router.py:303-309` defined, never called) — skipped;
  * router `pos_emb` is a buffer of a fixed sinusoidal table — ours is
    computed on the fly for the canonical grid (PARITY.md divergence #2),
    so the buffer is not imported.
"""

from __future__ import annotations

from typing import Any, Dict, List, Union

import numpy as np

StateDict = Dict[str, np.ndarray]


def _load(sd_or_path: Union[str, StateDict, Dict[str, Any]]):
    if isinstance(sd_or_path, str):
        import torch

        obj = torch.load(sd_or_path, map_location="cpu", weights_only=True)

        def to_np(x):
            if hasattr(x, "float"):
                return x.float().numpy()
            return x

        if isinstance(obj, dict) and "local_facial_extractor" in obj:
            return {k: ({kk: to_np(vv) for kk, vv in v.items()}
                        if isinstance(v, dict) else
                        [{kk: to_np(vv) for kk, vv in e.items()} for e in v])
                    for k, v in obj.items()}
        return {k: to_np(v) for k, v in obj.items()}
    return sd_or_path


def _lin(sd: StateDict, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": sd[f"{prefix}.weight"].astype(np.float32).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
    return out


def _ln(sd: StateDict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _stack(dicts: List[Dict[str, Any]]) -> Dict[str, Any]:
    """List of identical trees -> tree with stacked leading axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *dicts)


# ------------------------------------------------------------------ #
def import_audio_modules(sd_or_path) -> Dict[str, Any]:
    """audio_modules.pt -> {'audio_statics': ..., 'audio_layers': ...}."""
    sd = _load(sd_or_path)
    conv_w = sd["audio_proj_model.conv1.weight"].astype(np.float32)  # [C,C,2]
    c = conv_w.shape[0]
    w2 = np.concatenate([conv_w[:, :, 0].T, conv_w[:, :, 1].T], axis=0)  # [2C,C]

    statics = {
        "proj": {
            "proj1": _lin(sd, "audio_proj_model.proj1"),
            "proj2": _lin(sd, "audio_proj_model.proj2"),
            "proj3": _lin(sd, "audio_proj_model.proj3"),
            "norm": _ln(sd, "audio_proj_model.norm"),
            "conv_w": w2,
            "conv_b": sd["audio_proj_model.conv1.bias"].astype(np.float32),
        },
        "mute_learnable_tokens": sd["mute_learnable_tokens"].astype(np.float32),
        "learnable_scale": sd["learnable_scale"].astype(np.float32),
    }

    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    layers = []
    for i in range(n_layers):
        p = f"layers.{i}"
        layers.append({
            "norm_q": _ln(sd, f"{p}.norm_q"),
            "to_q": _lin(sd, f"{p}.attn.to_q"),
            "to_k": _lin(sd, f"{p}.attn.to_k"),
            "to_v": _lin(sd, f"{p}.attn.to_v"),
            "to_out": _lin(sd, f"{p}.attn.to_out.0"),
        })
    return {"audio_statics": statics, "audio_layers": _stack(layers)}


# ------------------------------------------------------------------ #
def _mapping_mlp(sd: StateDict, prefix: str) -> Dict[str, Any]:
    """torch Sequential(Linear,LN,LeakyReLU)x2 + Linear -> _MappingMLP tree."""
    return {
        "fc0": _lin(sd, f"{prefix}.0"),
        "ln0": _ln(sd, f"{prefix}.1"),
        "fc1": _lin(sd, f"{prefix}.3"),
        "ln1": _ln(sd, f"{prefix}.4"),
        "fc_out": _lin(sd, f"{prefix}.6"),
    }


def import_face_modules(sd_or_path) -> Dict[str, Any]:
    """face_modules.pt -> {'lfe': ..., 'perceiver': ...(stacked)}."""
    obj = _load(sd_or_path)
    lfe_sd: StateDict = obj["local_facial_extractor"]
    pca_sds: List[StateDict] = obj["perceiver_cross_attention"]

    lfe: Dict[str, Any] = {
        "latents": lfe_sd["latents"].astype(np.float32),      # [1, nq, dim]
        "proj_out": lfe_sd["proj_out"].astype(np.float32),    # [dim, out]
        "id_embedding_mapping": _mapping_mlp(lfe_sd, "id_embedding_mapping"),
    }
    for i in range(5):
        lfe[f"mapping_{i}"] = _mapping_mlp(lfe_sd, f"mapping_{i}")
    n_layers = 1 + max(int(k.split(".")[1]) for k in lfe_sd if k.startswith("layers."))
    for i in range(n_layers):
        a = f"layers.{i}.0"
        f = f"layers.{i}.1"
        lfe[f"attn_{i}"] = {
            "norm1": _ln(lfe_sd, f"{a}.norm1"),
            "norm2": _ln(lfe_sd, f"{a}.norm2"),
            "to_q": _lin(lfe_sd, f"{a}.to_q"),
            "to_kv": _lin(lfe_sd, f"{a}.to_kv"),
            "to_out": _lin(lfe_sd, f"{a}.to_out"),
        }
        lfe[f"ff_{i}"] = {
            "norm": _ln(lfe_sd, f"{f}.0"),
            "fc1": _lin(lfe_sd, f"{f}.1"),
            "fc2": _lin(lfe_sd, f"{f}.3"),
        }

    pcas = []
    for sd in pca_sds:
        # the reference fuses k/v into one to_kv linear (router.py:223);
        # our PerceiverCrossAttention uses separate to_k/to_v dots (SPMD
        # concat-cotangent fix) — split the weight rows exactly
        kv_kernel = _lin(sd, "to_kv")["kernel"]          # [kv_dim, inner*2]
        k_kernel, v_kernel = np.split(kv_kernel, 2, axis=-1)
        pcas.append({
            "norm1": _ln(sd, "norm1"),
            "norm2": _ln(sd, "norm2"),
            "to_q": _lin(sd, "to_q"),
            "to_k": {"kernel": k_kernel},
            "to_v": {"kernel": v_kernel},
            "to_out": _lin(sd, "to_out"),
        })
    out = {"lfe": lfe}
    if pcas:
        out["perceiver"] = _stack(pcas)
    return out


# ------------------------------------------------------------------ #
def import_router_modules(sd_or_path, num_heads: int = 16) -> Dict[str, Any]:
    """router_modules.pt -> {'router_norms', 'router_layers', 'router_trunk'}.

    The reference flattens the perceiver's detached q/k d-MAJOR
    (f_ref = d*H + h, `router.py:375-378`); our perceiver hands the router
    the projections' natural h-MAJOR packing (f = h*dh + d, zero-transpose
    hot path).  The shared input norms and the per-layer q/k projections are
    the only packing-sensitive weights — permute their input rows once here
    (exact)."""
    sd = _load(sd_or_path)
    norms = {"norm_q": _ln(sd, "norm_q"), "norm_k": _ln(sd, "norm_k")}

    qk_dim = norms["norm_q"]["scale"].shape[0]
    dh = qk_dim // num_heads
    f_new = np.arange(qk_dim)
    perm = (f_new % dh) * num_heads + f_new // dh   # f_ref for each f_new

    def permute_rows(tree):
        tree["kernel"] = tree["kernel"][perm]
        return tree

    for n in norms.values():
        for key in ("scale", "bias"):
            n[key] = n[key][perm]

    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("to_q."))
    layers = [{"to_q": permute_rows(_lin(sd, f"to_q.{i}", bias=False)),
               "to_k": permute_rows(_lin(sd, f"to_k.{i}", bias=False))}
              for i in range(n_layers)]

    trunk: Dict[str, Any] = {"norm": _ln(sd, "norm")}
    n_st = 1 + max(int(k.split(".")[1]) for k in sd
                   if k.startswith("spatial_temporal_layers."))
    for i in range(n_st):
        p = f"spatial_temporal_layers.{i}"

        def attn(name):
            return {"to_q": _lin(sd, f"{p}.{name}.to_q"),
                    "to_k": _lin(sd, f"{p}.{name}.to_k"),
                    "to_v": _lin(sd, f"{p}.{name}.to_v"),
                    "to_out": _lin(sd, f"{p}.{name}.to_out.0")}

        trunk[f"st_{i}"] = {
            "spatial_attn": attn("spatial_attn"),
            "temporal_attn": attn("temporal_attn"),
            "multi_id_attn": attn("multi_id_attn"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "norm4": _ln(sd, f"{p}.norm4"),
            "mlp_fc1": _lin(sd, f"{p}.mlp.0"),
            "mlp_fc2": _lin(sd, f"{p}.mlp.2"),
        }
    trunk["final_proj"] = _lin(sd, "final_proj.0")
    return {"router_norms": norms, "router_layers": _stack(layers),
            "router_trunk": trunk}


def import_all_submodules(params: Dict[str, Any], *, audio=None, face=None,
                          router=None) -> Dict[str, Any]:
    """Merge any subset of reference sub-checkpoints into a param tree."""
    out = dict(params)
    if audio is not None:
        out.update(import_audio_modules(audio))
    if face is not None:
        out.update(import_face_modules(face))
    if router is not None:
        out.update(import_router_modules(router))
    return out
