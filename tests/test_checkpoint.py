"""Checkpoint/resume + reference-import tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.config import SchedulerConfig, TrainConfig
from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.ops.scheduler import Schedule
from bindyouravatar_tpu.training.checkpoint import (import_reference_dit,
                                                    latest_step, load_submodules,
                                                    restore_checkpoint,
                                                    save_checkpoint,
                                                    save_submodules)
from bindyouravatar_tpu.training.trainer import Trainer


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    payload = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
               "step": jnp.asarray(7), "cursor": jnp.asarray(123)}
    save_checkpoint(d, 7, payload)
    assert latest_step(d) == 7
    out = restore_checkpoint(d, like=payload)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(payload["params"]["w"]))
    assert int(out["cursor"]) == 123


def test_rotation_limit(tmp_path):
    d = str(tmp_path / "ckpt")
    for s in (1, 2, 3):
        save_checkpoint(d, s, {"x": jnp.asarray(s)}, total_limit=2)
    assert latest_step(d) == 3
    steps = sorted(int(p) for p in os.listdir(d) if p.isdigit())
    assert steps == [2, 3]


def test_submodule_interop(tmp_path):
    dit = DiT.tiny()
    p1 = dit.init(jax.random.key(0))
    p2 = dit.init(jax.random.key(1))
    d = str(tmp_path / "subs")
    save_submodules(p1, d)
    merged = load_submodules(p2, d)
    # router/audio/face come from p1, base blocks stay p2
    a = jax.tree.leaves(merged["router_trunk"])[0]
    b = jax.tree.leaves(p1["router_trunk"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    base_m = jax.tree.leaves(merged["blocks"])[0]
    base_2 = jax.tree.leaves(p2["blocks"])[0]
    np.testing.assert_array_equal(np.asarray(base_m), np.asarray(base_2))


def _synthetic_reference_sd(cfg):
    """Random torch-layout state dict for the base DiT (reference naming)."""
    rng = np.random.default_rng(0)
    sd = {}
    dim = cfg.inner_dim
    hd = cfg.attention_head_dim
    te = cfg.time_embed_dim

    def add(name, *shape):
        sd[name] = rng.normal(0, 0.02, shape).astype(np.float32)

    add("patch_embed.proj.weight", dim, cfg.in_channels, cfg.patch_size, cfg.patch_size)
    add("patch_embed.proj.bias", dim)
    add("patch_embed.text_proj.weight", dim, cfg.text_embed_dim)
    add("patch_embed.text_proj.bias", dim)
    add("time_embedding.linear_1.weight", te, dim)
    add("time_embedding.linear_1.bias", te)
    add("time_embedding.linear_2.weight", te, te)
    add("time_embedding.linear_2.bias", te)
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        for nrm in ("norm1", "norm2"):
            add(f"{p}.{nrm}.linear.weight", 6 * dim, te)
            add(f"{p}.{nrm}.linear.bias", 6 * dim)
            add(f"{p}.{nrm}.norm.weight", dim)
            add(f"{p}.{nrm}.norm.bias", dim)
        for proj in ("to_q", "to_k", "to_v"):
            add(f"{p}.attn1.{proj}.weight", dim, dim)
            add(f"{p}.attn1.{proj}.bias", dim)
        for nrm in ("norm_q", "norm_k"):
            add(f"{p}.attn1.{nrm}.weight", hd)
            add(f"{p}.attn1.{nrm}.bias", hd)
        add(f"{p}.attn1.to_out.0.weight", dim, dim)
        add(f"{p}.attn1.to_out.0.bias", dim)
        add(f"{p}.ff.net.0.proj.weight", 4 * dim, dim)
        add(f"{p}.ff.net.0.proj.bias", 4 * dim)
        add(f"{p}.ff.net.2.weight", dim, 4 * dim)
        add(f"{p}.ff.net.2.bias", dim)
    add("norm_final.weight", dim)
    add("norm_final.bias", dim)
    add("norm_out.linear.weight", 2 * dim, te)
    add("norm_out.linear.bias", 2 * dim)
    add("norm_out.norm.weight", dim)
    add("norm_out.norm.bias", dim)
    add("proj_out.weight", cfg.patch_size ** 2 * cfg.out_channels, dim)
    add("proj_out.bias", cfg.patch_size ** 2 * cfg.out_channels)
    return sd


def test_import_reference_dit_shapes(tmp_path):
    from safetensors.numpy import save_file

    dit = DiT.tiny(is_train_face=False, is_train_audio=False)
    sd = _synthetic_reference_sd(dit.cfg)
    f = str(tmp_path / "model.safetensors")
    save_file(sd, f)

    params = import_reference_dit([f], dit)
    ref = dit.init(jax.random.key(0))
    # identical tree structure + shapes
    ps = jax.tree_util.tree_map(lambda x: x.shape, params)
    rs = jax.tree_util.tree_map(lambda x: x.shape, ref)
    assert ps == rs
    # forward runs with imported params
    c = dit.cfg
    lat = jnp.zeros((1, c.latent_frames, c.in_channels, c.sample_height,
                     c.sample_width))
    text = jnp.zeros((1, c.max_text_seq_length, c.text_embed_dim))
    rope = dit.rope(c.sample_height * 8, c.sample_width * 8, c.latent_frames)
    out, _ = dit.apply(params, lat, text, jnp.array([10.0]), rope)
    assert np.all(np.isfinite(np.asarray(out)))


def test_import_channel_growth(tmp_path):
    """16 -> 48 channel patch-embed surgery (transformer.py:1061-1073)."""
    from safetensors.numpy import save_file

    dit_small = DiT.tiny(is_train_face=False, is_train_audio=False, in_channels=4)
    sd = _synthetic_reference_sd(dit_small.cfg)
    f = str(tmp_path / "m.safetensors")
    save_file(sd, f)

    dit_big = DiT.tiny(is_train_face=False, is_train_audio=False, in_channels=8)
    params = import_reference_dit([f], dit_big)
    k = np.asarray(params["patch_embed"]["proj"]["kernel"])
    assert k.shape[0] == 8 * dit_big.cfg.patch_size ** 2
    # grown input channels are zero: rows for channels 4..7
    p = dit_big.cfg.patch_size
    grown = k.reshape(8, p * p, -1)[4:]
    assert np.abs(grown).max() == 0.0


def test_import_lora_safetensors_and_fuse():
    """peft-style LoRA state dict -> in-layer stacked params (with the RoPE
    q/k output permutation), then fuse_lora == the unfused forward
    (reference util/utils.py:1027-1048 + infer.py:279)."""
    import dataclasses

    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.training.checkpoint import (
        _rope_permutation, fuse_lora, import_lora_safetensors)

    rank = 4
    dit = DiT.tiny(lora_rank=rank, in_channels=8, out_channels=4)
    c = dit.cfg
    params = dit.init(jax.random.key(0))
    inner = c.num_attention_heads * c.attention_head_dim

    rng = np.random.default_rng(0)
    sd = {}
    for i in range(c.num_layers):
        for proj in ("to_q", "to_k"):
            base = f"transformer.transformer_blocks.{i}.attn1.{proj}"
            sd[f"{base}.lora_A.weight"] = rng.normal(
                0, 0.05, (rank, c.inner_dim)).astype(np.float32)
            sd[f"{base}.lora_B.weight"] = rng.normal(
                0, 0.05, (inner, rank)).astype(np.float32)

    loaded = import_lora_safetensors(sd, dit, params)

    # spot-check the transpose + RoPE permutation on layer 0 to_q
    perm = _rope_permutation(c.attention_head_dim)
    full_perm = np.concatenate([perm + h * c.attention_head_dim
                                for h in range(c.num_attention_heads)])
    a0 = np.asarray(loaded["blocks"]["attn1"]["to_q_lora_A"][0])
    b0 = np.asarray(loaded["blocks"]["attn1"]["to_q_lora_B"][0])
    np.testing.assert_allclose(
        a0, sd["transformer.transformer_blocks.0.attn1.to_q.lora_A.weight"].T)
    np.testing.assert_allclose(
        b0, sd["transformer.transformer_blocks.0.attn1.to_q.lora_B.weight"].T[:, full_perm])

    # fused forward (lora_rank=0 config) == unfused forward (lora config)
    t, hg, wg = c.latent_grid
    lat = jax.random.normal(jax.random.key(1),
                            (1, t, c.in_channels, c.sample_height, c.sample_width))
    text = jax.random.normal(jax.random.key(2),
                             (1, c.max_text_seq_length, c.text_embed_dim))
    ts = jnp.full((1,), 300.0)
    rope = dit.rope(c.sample_height * 8, c.sample_width * 8, t)

    out_lora, _ = dit.apply(loaded, lat, text, ts, rope)

    dit0 = DiT.tiny(lora_rank=0, in_channels=8, out_channels=4)
    fused = fuse_lora(loaded, lora_alpha=c.lora_alpha)
    assert "to_q_lora_A" not in fused["blocks"]["attn1"]
    out_fused, _ = dit0.apply(fused, lat, text, ts, rope)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_fused),
                               atol=2e-4, rtol=1e-4)


def test_fuse_lora_files_matches_import_then_fuse(tmp_path):
    """The rank-0 inference path (`infer.py --lora_path` ->
    `fuse_lora_files`) produces the same fused kernels as import-into-slots
    + `fuse_lora`, from an actual safetensors file on disk."""
    from safetensors.numpy import save_file

    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.training.checkpoint import (
        fuse_lora, fuse_lora_files, import_lora_safetensors)

    rank = 4
    dit = DiT.tiny(lora_rank=rank, in_channels=8, out_channels=4)
    c = dit.cfg
    params = dit.init(jax.random.key(0))
    inner = c.num_attention_heads * c.attention_head_dim

    rng = np.random.default_rng(3)
    sd = {}
    for i in range(c.num_layers):
        for proj in ("to_q", "to_k"):
            base = f"transformer.transformer_blocks.{i}.attn1.{proj}"
            sd[f"{base}.lora_A.weight"] = rng.normal(
                0, 0.05, (rank, c.inner_dim)).astype(np.float32)
            sd[f"{base}.lora_B.weight"] = rng.normal(
                0, 0.05, (inner, rank)).astype(np.float32)
    f = str(tmp_path / "lora.safetensors")
    save_file(sd, f)

    fused_a = fuse_lora(import_lora_safetensors(sd, dit, params),
                        lora_alpha=c.lora_alpha)

    # rank-0 param tree: same base weights, no LoRA slots
    attn1 = {k: v for k, v in params["blocks"]["attn1"].items()
             if "lora" not in k}
    params0 = dict(params, blocks=dict(params["blocks"], attn1=attn1))
    dit0 = DiT.tiny(lora_rank=0, in_channels=8, out_channels=4)
    fused_b = fuse_lora_files([f], dit0, params0, lora_alpha=c.lora_alpha)

    for proj in ("to_q", "to_k"):
        ka = np.asarray(fused_a["blocks"]["attn1"][proj]["kernel"])
        kb = np.asarray(fused_b["blocks"]["attn1"][proj]["kernel"])
        np.testing.assert_allclose(ka, kb, atol=1e-6)
        assert not np.allclose(                      # fused != base
            kb, np.asarray(params["blocks"]["attn1"][proj]["kernel"]))


def test_import_lora_rejects_rank_mismatch():
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.training.checkpoint import import_lora_safetensors

    dit = DiT.tiny(lora_rank=4, in_channels=8, out_channels=4)
    params = dit.init(jax.random.key(0))
    c = dit.cfg
    inner = c.num_attention_heads * c.attention_head_dim
    sd = {}
    for i in range(c.num_layers):
        for proj in ("to_q", "to_k"):
            base = f"transformer_blocks.{i}.attn1.{proj}"
            sd[f"{base}.lora_A.weight"] = np.zeros((8, c.inner_dim), np.float32)
            sd[f"{base}.lora_B.weight"] = np.zeros((inner, 8), np.float32)
    with pytest.raises(ValueError, match="rank mismatch"):
        import_lora_safetensors(sd, dit, params)
