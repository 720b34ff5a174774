"""T5-v1.1 encoder in flax (reference text encoder: T5-XXL via transformers,
`pipeline_bindyouravatar.py:222-249`, 226-token prompts, 4096-d output).

Implements the encoder stack exactly as google/t5-v1_1-xxl: RMSNorm (no
mean subtraction, no bias), relative position buckets (bidirectional, 32
buckets / 128 max distance, bias only from layer 0, shared), unscaled
attention (no 1/sqrt(d)), gated-GELU FFN, final RMSNorm.  Weight conversion
from the torch checkpoint is a transpose of each Linear kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5Config


class RMSNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        return (y * w).astype(dt)


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket function (host-side, static seq len)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, bias, mask):
        c = self.cfg
        b, s, _ = x.shape
        inner = c.num_heads * c.d_kv
        dense = lambda name, d=inner: nn.Dense(d, use_bias=False, dtype=c.dtype,
                                               param_dtype=c.param_dtype, name=name)
        q = dense("q")(x).reshape(b, s, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        k = dense("k")(x).reshape(b, s, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        v = dense("v")(x).reshape(b, s, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        # T5: NO 1/sqrt(d) scaling
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        sc = sc + bias
        if mask is not None:
            sc = jnp.where(mask[:, None, None, :], sc, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(sc, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=c.dtype,
                        param_dtype=c.param_dtype, name="o")(o)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, bias, mask):
        c = self.cfg
        h = RMSNorm(c.layer_norm_epsilon, c.param_dtype, name="ln_attn")(x)
        x = x + T5SelfAttention(c, name="attn")(h, bias, mask)
        h = RMSNorm(c.layer_norm_epsilon, c.param_dtype, name="ln_ff")(x)
        wi0 = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype,
                       param_dtype=c.param_dtype, name="wi_0")(h)
        wi1 = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype,
                       param_dtype=c.param_dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=c.dtype,
                         param_dtype=c.param_dtype, name="wo")(h)
        return x


class T5Encoder(nn.Module):
    cfg: T5Config = T5Config()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """input_ids [B, S] -> embeddings [B, S, d_model]."""
        c = self.cfg
        s = input_ids.shape[1]
        emb = self.param("token_embedding", nn.initializers.normal(1.0),
                         (c.vocab_size, c.d_model), c.param_dtype)
        x = emb[input_ids].astype(c.dtype)

        rel = np.arange(s)[None, :] - np.arange(s)[:, None]   # memory - query
        buckets = relative_position_bucket(
            rel, c.relative_attention_num_buckets, c.relative_attention_max_distance)
        bias_table = self.param("relative_attention_bias", nn.initializers.normal(1.0),
                                (c.relative_attention_num_buckets, c.num_heads),
                                c.param_dtype)
        bias = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)[None]  # [1,H,S,S]
        bias = bias.astype(jnp.float32)

        for i in range(c.num_layers):
            x = T5Block(c, name=f"block_{i}")(x, bias, attention_mask)
        x = RMSNorm(c.layer_norm_epsilon, c.param_dtype, name="final_ln")(x)
        return x


@dataclasses.dataclass(frozen=True)
class T5TextEncoder:
    cfg: T5Config = T5Config()

    def init(self, key):
        ids = jnp.zeros((1, 4), jnp.int32)
        return T5Encoder(self.cfg).init(key, ids)["params"]

    def apply(self, params, input_ids, attention_mask=None):
        return T5Encoder(self.cfg).apply({"params": params}, input_ids, attention_mask)

    @classmethod
    def tiny(cls):
        return cls(T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                            num_layers=2, num_heads=4, dtype=jnp.float32))


def tokenize(prompts, tokenizer_dir: str, max_length: int = 226):
    """Tokenize with a LOCAL sentencepiece tokenizer (reference uses the
    T5 tokenizer at 226 tokens, `pipeline_bindyouravatar.py:310-320`).
    Returns (input_ids [B, L], attention_mask [B, L]) as numpy."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    out = tok(prompts, padding="max_length", max_length=max_length,
              truncation=True, return_tensors="np")
    return out["input_ids"], out["attention_mask"].astype(bool)


def encode_prompts(params, prompts, tokenizer_dir: str,
                   cfg: T5Config = T5Config(), max_length: int = 226):
    """prompts -> embeddings [B, L, d_model] (the reference zeroes nothing:
    embeddings at padded positions pass through with the mask applied in
    attention; downstream consumes the full 226 tokens)."""
    import jax as _jax

    ids, mask = tokenize(prompts, tokenizer_dir, max_length)
    enc = T5TextEncoder(cfg)
    return _jax.jit(enc.apply)(params, ids, mask)
