"""Sub-module checkpoint import: synthetic torch-layout dicts -> our trees.

Builds reference-named state dicts with shapes matching the tiny DiT,
imports, and checks (a) exact tree/shape agreement with `dit.init`,
(b) the audio Conv1d repack is numerically identical to torch conv1d.
"""

import jax
import numpy as np
import pytest

from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.training.import_submodules import (import_audio_modules,
                                                           import_face_modules,
                                                           import_router_modules)


@pytest.fixture(scope="module")
def dit():
    return DiT.tiny()


@pytest.fixture(scope="module")
def ref_params(dit):
    return dit.init(jax.random.key(0))


def _shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def _synth_audio_sd(dit):
    rng = np.random.default_rng(0)
    a = dit.audio_cfg
    ctx = a.context_tokens * a.audio_dim
    win_in = a.window_size * a.blocks * a.audio_dim
    sd = {}

    def add(name, *shape):
        sd[name] = rng.normal(0, 0.02, shape).astype(np.float32)

    add("audio_proj_model.proj1.weight", a.intermediate_dim, win_in)
    add("audio_proj_model.proj1.bias", a.intermediate_dim)
    add("audio_proj_model.proj2.weight", a.intermediate_dim, a.intermediate_dim)
    add("audio_proj_model.proj2.bias", a.intermediate_dim)
    add("audio_proj_model.proj3.weight", ctx, a.intermediate_dim)
    add("audio_proj_model.proj3.bias", ctx)
    add("audio_proj_model.norm.weight", a.audio_dim)
    add("audio_proj_model.norm.bias", a.audio_dim)
    add("audio_proj_model.conv1.weight", ctx, ctx, 2)
    add("audio_proj_model.conv1.bias", ctx)
    add("mute_learnable_tokens", 1, a.context_tokens, a.audio_dim)
    add("learnable_scale", 1)
    inner = dit.cfg.inner_dim
    for i in range(a.num_layers):
        p = f"layers.{i}"
        add(f"{p}.norm_q.weight", inner)
        add(f"{p}.norm_q.bias", inner)
        add(f"{p}.attn.to_q.weight", inner, inner)
        add(f"{p}.attn.to_q.bias", inner)
        add(f"{p}.attn.to_k.weight", inner, a.audio_dim)
        add(f"{p}.attn.to_k.bias", inner)
        add(f"{p}.attn.to_v.weight", inner, a.audio_dim)
        add(f"{p}.attn.to_v.bias", inner)
        add(f"{p}.attn.to_out.0.weight", inner, inner)
        add(f"{p}.attn.to_out.0.bias", inner)
    return sd


def test_import_audio_modules_shapes(dit, ref_params):
    sd = _synth_audio_sd(dit)
    imported = import_audio_modules(sd)
    assert _shapes(imported["audio_statics"]) == _shapes(ref_params["audio_statics"])
    assert _shapes(imported["audio_layers"]) == _shapes(ref_params["audio_layers"])


def test_audio_conv_repack_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    c = 12
    w = rng.normal(0, 1, (c, c, 2)).astype(np.float32)
    b = rng.normal(0, 1, c).astype(np.float32)
    x = rng.normal(0, 1, (1, c, 8)).astype(np.float32)   # [B, C, T]

    conv = torch.nn.Conv1d(c, c, 2, stride=2)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    ref = conv(torch.from_numpy(x)).detach().numpy()      # [1, C, 4]

    w2 = np.concatenate([w[:, :, 0].T, w[:, :, 1].T], axis=0)  # [2C, C]
    pairs = x[0].T.reshape(4, 2 * c)                      # [T/2, (x_even||x_odd)]
    # pairs layout: [x[2t] (C), x[2t+1] (C)]
    pairs = np.concatenate([x[0].T[0::2], x[0].T[1::2]], axis=1)
    out = pairs @ w2 + b                                  # [4, C]
    np.testing.assert_allclose(out, ref[0].T, atol=1e-5)


def _synth_face_sd(dit):
    rng = np.random.default_rng(2)
    l = dit.lfe_cfg

    def lin(o, i):
        return rng.normal(0, 0.02, (o, i)).astype(np.float32)

    def vec(n):
        return rng.normal(0, 0.02, (n,)).astype(np.float32)

    def mlp(sd, p, in_dim, out_dim):
        sd[f"{p}.0.weight"] = lin(l.dim, in_dim); sd[f"{p}.0.bias"] = vec(l.dim)
        sd[f"{p}.1.weight"] = vec(l.dim); sd[f"{p}.1.bias"] = vec(l.dim)
        sd[f"{p}.3.weight"] = lin(l.dim, l.dim); sd[f"{p}.3.bias"] = vec(l.dim)
        sd[f"{p}.4.weight"] = vec(l.dim); sd[f"{p}.4.bias"] = vec(l.dim)
        sd[f"{p}.6.weight"] = lin(out_dim, l.dim); sd[f"{p}.6.bias"] = vec(out_dim)

    lfe_sd = {"latents": rng.normal(0, 1, (1, l.num_queries, l.dim)).astype(np.float32),
              "proj_out": rng.normal(0, 1, (l.dim, l.output_dim)).astype(np.float32)}
    mlp(lfe_sd, "id_embedding_mapping", l.id_embed_dim, l.dim * l.num_id_token)
    for i in range(l.num_scales):
        mlp(lfe_sd, f"mapping_{i}", l.vit_dim, l.dim)
    inner = l.dim_head * l.heads
    for i in range(l.depth):
        a = f"layers.{i}.0"
        lfe_sd[f"{a}.norm1.weight"] = vec(l.dim); lfe_sd[f"{a}.norm1.bias"] = vec(l.dim)
        lfe_sd[f"{a}.norm2.weight"] = vec(l.dim); lfe_sd[f"{a}.norm2.bias"] = vec(l.dim)
        lfe_sd[f"{a}.to_q.weight"] = lin(inner, l.dim)
        lfe_sd[f"{a}.to_kv.weight"] = lin(inner * 2, l.dim)
        lfe_sd[f"{a}.to_out.weight"] = lin(l.dim, inner)
        f = f"layers.{i}.1"
        lfe_sd[f"{f}.0.weight"] = vec(l.dim); lfe_sd[f"{f}.0.bias"] = vec(l.dim)
        lfe_sd[f"{f}.1.weight"] = lin(l.dim * l.ff_mult, l.dim)
        lfe_sd[f"{f}.3.weight"] = lin(l.dim, l.dim * l.ff_mult)

    r = dit.router_cfg
    d = dit.cfg.inner_dim
    inner_p = r.q_k_dim
    pca = []
    for _ in range(dit.cfg.num_ca):
        pca.append({
            "norm1.weight": vec(r.q_k_dim), "norm1.bias": vec(r.q_k_dim),
            "norm2.weight": vec(d), "norm2.bias": vec(d),
            "to_q.weight": lin(inner_p, d),
            "to_kv.weight": lin(inner_p * 2, r.q_k_dim),
            "to_out.weight": lin(d, inner_p),
        })
    return {"local_facial_extractor": lfe_sd, "perceiver_cross_attention": pca}


def test_import_face_modules_shapes(dit, ref_params):
    obj = _synth_face_sd(dit)
    imported = import_face_modules(obj)
    assert _shapes(imported["lfe"]) == _shapes(ref_params["lfe"])
    assert _shapes(imported["perceiver"]) == _shapes(ref_params["perceiver"])


def _synth_router_sd(dit):
    rng = np.random.default_rng(3)
    r = dit.router_cfg

    def lin(o, i):
        return rng.normal(0, 0.02, (o, i)).astype(np.float32)

    def vec(n):
        return rng.normal(0, 0.02, (n,)).astype(np.float32)

    sd = {"norm.weight": vec(r.feat_dim), "norm.bias": vec(r.feat_dim),
          "norm_q.weight": vec(r.q_k_dim), "norm_q.bias": vec(r.q_k_dim),
          "norm_k.weight": vec(r.q_k_dim), "norm_k.bias": vec(r.q_k_dim),
          "final_proj.0.weight": lin(1, r.feat_dim), "final_proj.0.bias": vec(1)}
    for i in range(dit.cfg.num_ca):
        sd[f"to_q.{i}.weight"] = lin(r.q_k_dim, r.q_k_dim)
        sd[f"to_k.{i}.weight"] = lin(r.q_k_dim, r.q_k_dim)
    for i in range(r.num_attention_layers):
        p = f"spatial_temporal_layers.{i}"
        for name in ("spatial_attn", "temporal_attn", "multi_id_attn"):
            for proj in ("to_q", "to_k", "to_v"):
                sd[f"{p}.{name}.{proj}.weight"] = lin(r.feat_dim, r.feat_dim)
                sd[f"{p}.{name}.{proj}.bias"] = vec(r.feat_dim)
            sd[f"{p}.{name}.to_out.0.weight"] = lin(r.feat_dim, r.feat_dim)
            sd[f"{p}.{name}.to_out.0.bias"] = vec(r.feat_dim)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[f"{p}.{n}.weight"] = vec(r.feat_dim)
            sd[f"{p}.{n}.bias"] = vec(r.feat_dim)
        sd[f"{p}.mlp.0.weight"] = lin(r.feat_dim * r.mlp_ratio, r.feat_dim)
        sd[f"{p}.mlp.0.bias"] = vec(r.feat_dim * r.mlp_ratio)
        sd[f"{p}.mlp.2.weight"] = lin(r.feat_dim, r.feat_dim * r.mlp_ratio)
        sd[f"{p}.mlp.2.bias"] = vec(r.feat_dim)
    return sd


def test_import_router_modules_shapes(dit, ref_params):
    sd = _synth_router_sd(dit)
    imported = import_router_modules(sd)
    for key in ("router_norms", "router_layers", "router_trunk"):
        assert _shapes(imported[key]) == _shapes(ref_params[key]), key
