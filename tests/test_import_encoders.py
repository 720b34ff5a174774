"""Encoder importers: synthetic torch-layout dicts -> flax trees (shape parity
with init + forward runs with imported params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.config import EVACLIPConfig, T5Config
from bindyouravatar_tpu.models.eva_clip import EVACLIPVision
from bindyouravatar_tpu.models.t5 import T5TextEncoder
from bindyouravatar_tpu.training.import_encoders import (import_eva_vision,
                                                         import_t5_encoder)


def _shapes(t):
    return jax.tree.map(lambda x: tuple(np.shape(x)), t)


def test_import_t5():
    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    sd = {"shared.weight": rng.normal(0, 1, (128, 32)).astype(np.float32),
          "encoder.final_layer_norm.weight": np.ones(32, np.float32),
          "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
              rng.normal(0, 1, (32, 4)).astype(np.float32)}
    for i in range(2):
        b = f"encoder.block.{i}.layer"
        for n, shape in [("0.SelfAttention.q", (32, 32)), ("0.SelfAttention.k", (32, 32)),
                         ("0.SelfAttention.v", (32, 32)), ("0.SelfAttention.o", (32, 32)),
                         ("1.DenseReluDense.wi_0", (64, 32)),
                         ("1.DenseReluDense.wi_1", (64, 32)),
                         ("1.DenseReluDense.wo", (32, 64))]:
            sd[f"{b}.{n}.weight"] = rng.normal(0, 0.05, shape).astype(np.float32)
        sd[f"{b}.0.layer_norm.weight"] = np.ones(32, np.float32)
        sd[f"{b}.1.layer_norm.weight"] = np.ones(32, np.float32)

    enc = T5TextEncoder(cfg)
    ref = enc.init(jax.random.key(0))
    imported = import_t5_encoder(sd, cfg)
    assert _shapes(imported) == _shapes(ref)
    out = enc.apply(imported, jnp.zeros((1, 8), jnp.int32))
    assert np.all(np.isfinite(np.asarray(out)))


def test_import_eva():
    eva = EVACLIPVision.tiny()
    cfg = eva.cfg
    rng = np.random.default_rng(1)
    w = cfg.width
    hidden = int(w * cfg.mlp_ratio)
    sd = {"patch_embed.proj.weight": rng.normal(0, 0.05, (w, 3, cfg.patch_size,
                                                          cfg.patch_size)).astype(np.float32),
          "patch_embed.proj.bias": np.zeros(w, np.float32),
          "cls_token": rng.normal(0, 0.02, (1, 1, w)).astype(np.float32),
          "pos_embed": rng.normal(0, 0.02, (1, cfg.seq_len, w)).astype(np.float32),
          "norm.weight": np.ones(w, np.float32), "norm.bias": np.zeros(w, np.float32),
          "head.weight": rng.normal(0, 0.05, (cfg.out_dim, w)).astype(np.float32),
          "head.bias": np.zeros(cfg.out_dim, np.float32)}
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.weight"] = np.ones(w, np.float32)
            sd[f"{b}.{n}.bias"] = np.zeros(w, np.float32)
        sd[f"{b}.attn.q_proj.weight"] = rng.normal(0, 0.05, (w, w)).astype(np.float32)
        sd[f"{b}.attn.k_proj.weight"] = rng.normal(0, 0.05, (w, w)).astype(np.float32)
        sd[f"{b}.attn.v_proj.weight"] = rng.normal(0, 0.05, (w, w)).astype(np.float32)
        sd[f"{b}.attn.q_bias"] = np.zeros(w, np.float32)
        sd[f"{b}.attn.v_bias"] = np.zeros(w, np.float32)
        sd[f"{b}.attn.inner_attn_ln.weight"] = np.ones(w, np.float32)
        sd[f"{b}.attn.inner_attn_ln.bias"] = np.zeros(w, np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.normal(0, 0.05, (w, w)).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = np.zeros(w, np.float32)
        sd[f"{b}.mlp.w1.weight"] = rng.normal(0, 0.05, (hidden, w)).astype(np.float32)
        sd[f"{b}.mlp.w1.bias"] = np.zeros(hidden, np.float32)
        sd[f"{b}.mlp.w2.weight"] = rng.normal(0, 0.05, (hidden, w)).astype(np.float32)
        sd[f"{b}.mlp.w2.bias"] = np.zeros(hidden, np.float32)
        sd[f"{b}.mlp.ffn_ln.weight"] = np.ones(hidden, np.float32)
        sd[f"{b}.mlp.ffn_ln.bias"] = np.zeros(hidden, np.float32)
        sd[f"{b}.mlp.w3.weight"] = rng.normal(0, 0.05, (w, hidden)).astype(np.float32)
        sd[f"{b}.mlp.w3.bias"] = np.zeros(w, np.float32)

    ref = eva.init(jax.random.key(0))
    imported = import_eva_vision(sd, cfg)
    assert _shapes(imported) == _shapes(ref)
    pooled, hidden_states = eva.apply(imported, jnp.zeros((1, 3, cfg.image_size,
                                                           cfg.image_size)))
    assert np.all(np.isfinite(np.asarray(pooled)))


def test_import_vae_roundtrip():
    """Synthetic diffusers-style AutoencoderKLCogVideoX state dict ->
    CausalVAE tree: every param covered, conv transposes exact, and the
    imported tree decodes/encodes identically to the source values."""
    import flax.traverse_util as tu

    from bindyouravatar_tpu.models.vae import CausalVAE
    from bindyouravatar_tpu.training.import_encoders import (import_vae,
                                                             vae_key_map)

    vae = CausalVAE.tiny()
    params = vae.init(jax.random.key(0))
    flat = tu.flatten_dict(params, sep="/")

    kmap = vae_key_map(vae.cfg)
    ours_covered = {ours for ours, _ in kmap.values()}
    missing = set(flat) - ours_covered
    assert not missing, f"params not covered by the VAE key map: {missing}"

    # build the torch-layout dict by inverting the converter's transposes
    rng = np.random.default_rng(0)
    sd = {}
    for theirs, (ours, kind) in kmap.items():
        v = rng.normal(0, 0.05, flat[ours].shape).astype(np.float32)
        flat[ours] = jnp.asarray(v)
        if kind == "conv3d":
            sd[theirs] = v.transpose(4, 3, 0, 1, 2)      # [out,in,kt,kh,kw]
        elif kind == "conv2d":
            sd[theirs] = v[0].transpose(3, 2, 0, 1)      # [out,in,kh,kw]
        else:
            sd[theirs] = v

    want = tu.unflatten_dict(flat, sep="/")
    got = import_vae(sd, vae)
    for k in tu.flatten_dict(want, sep="/"):
        np.testing.assert_allclose(
            np.asarray(tu.flatten_dict(got, sep="/")[k]),
            np.asarray(tu.flatten_dict(want, sep="/")[k]), atol=0, rtol=0)

    # imported tree actually runs (odd latent frame count: even-t decode
    # follows diffusers' t->2t interpolate, see test_vae_parity.py)
    video = jax.random.normal(jax.random.key(1), (1, 9, 3, 16, 16))
    lat = vae.encode(got, video)
    assert lat.shape[1] == 3
    out = vae.decode(got, lat)
    assert out.shape == (1, 9, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_t5_parity_vs_transformers():
    """Cross-implementation parity vs the ACTUAL dependency the reference
    loads (`T5EncoderModel`, `pipeline_bindyouravatar.py:222-249`): random
    torch weights -> `import_t5_encoder` -> outputs match fp32 <=2e-4,
    including relative-bucket bias, unscaled attention, gated-GELU FFN and
    attention masking."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_heads=4,
                        relative_attention_num_buckets=8,
                        relative_attention_max_distance=16,
                        feed_forward_proj="gated-gelu", dropout_rate=0.0,
                        is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, relative_attention_num_buckets=8,
                   relative_attention_max_distance=16, dtype=jnp.float32)
    params = import_t5_encoder(sd, cfg)
    enc = T5TextEncoder(cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)
                    ).last_hidden_state.numpy()
    out = np.asarray(enc.apply(params, jnp.asarray(ids),
                               attention_mask=jnp.asarray(mask).astype(bool)))
    # masked positions may legitimately differ (torch computes them with
    # masked attention context; the contract only covers valid tokens)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out[1, :6], ref[1, :6], atol=2e-4, rtol=1e-3)
