"""Audio conditioning: window projection + per-layer frame-local cross-attn.

Mirrors reference `models/audio_model.py`:
  * `sliding_windows`: unfold [B, 4F+1+4, 12, 768] -> [B, 4F+1, 5, 12, 768]
  * `AudioProjModel`: window MLP -> 32 context tokens, then the strided
    odd-first-passthrough Conv1d applied twice to downsample pixel frames ->
    latent frames (49 -> 25 -> 13)
  * `AudioCrossAttnLayer`: per-DiT-layer cross-attention where each latent
    frame's video tokens attend only to that frame's 32 audio tokens
  * mute-track: fixture embedding projected through the same proj +
    learnable tokens (reference `:201-220`)

Batched over (batch x identity); the per-layer params stack along the DiT
scan axis in `dit.py`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import AudioConfig
from .layers import LayerNorm


def sliding_windows(audio_embeds: jnp.ndarray, num_pixel_frames: int,
                    window_size: int = 5, window_stride: int = 1) -> jnp.ndarray:
    """[..., A, blocks, C] -> [..., num_pixel_frames, window, blocks, C].

    A must equal 1 + (latent_frames-1)*4 + (window-stride) — the reference
    asserts this contract (`audio_model.py:190`); here it is a static shape
    check at trace time.
    """
    a = audio_embeds.shape[-3]
    expect = num_pixel_frames + (window_size - window_stride)
    if a != expect:
        raise ValueError(f"audio frames {a} != pixel frames {num_pixel_frames} "
                         f"+ window slack {window_size - window_stride}")
    slices = [
        jax.lax.dynamic_slice_in_dim(audio_embeds, i, num_pixel_frames, axis=-3)
        for i in range(window_size)
    ]
    return jnp.stack(slices, axis=-3)  # [..., F, W, blocks, C]


class AudioProjModel(nn.Module):
    """Window MLP -> context tokens -> 2x strided temporal downsample.

    The Conv1d(k=2, s=2) over channel dim 32*768 is implemented as a pair
    reshape + one MXU matmul (weights [2*C, C]); the odd-length passthrough
    of the first frame matches reference `audio_model.py:98-109`.
    """
    cfg: AudioConfig = AudioConfig()
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, windows: jnp.ndarray) -> jnp.ndarray:
        """windows: [B, F, W, blocks, C] -> [B, F_latent, ctx_tokens, out]."""
        c = self.cfg
        b, f = windows.shape[0], windows.shape[1]
        x = windows.reshape(b, f, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(c.intermediate_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj1")(x))
        x = nn.relu(nn.Dense(c.intermediate_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj2")(x))
        ctx_dim = c.context_tokens * c.audio_dim
        x = nn.Dense(ctx_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj3")(x)                      # [B, F, 32*768]

        w = self.param("conv_w", nn.initializers.lecun_normal(),
                       (2 * ctx_dim, ctx_dim), self.param_dtype)
        bconv = self.param("conv_b", nn.initializers.zeros, (ctx_dim,), self.param_dtype)

        def downsample(t):
            n = t.shape[1]
            if n % 2 == 1:
                first, rest = t[:, :1], t[:, 1:]
                pairs = rest.reshape(b, (n - 1) // 2, 2 * ctx_dim)
                out = pairs @ w.astype(t.dtype) + bconv.astype(t.dtype)
                return jnp.concatenate([first, out], axis=1)
            pairs = t.reshape(b, n // 2, 2 * ctx_dim)
            return pairs @ w.astype(t.dtype) + bconv.astype(t.dtype)

        x = downsample(downsample(x))                      # [B, F_lat, 32*768]
        x = x.reshape(b, x.shape[1], c.context_tokens, c.audio_dim)
        return LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm")(x)


class EinsumOutProj(nn.Module):
    """to_out with a per-query-scaled bias: the identity-combined path's
    bias is sum_i(w_i) * bias (PARITY divergence #10).  Input is the
    kernel's q-major output flattened to [..., Sq, H*D] — a plain matmul in
    the projection's natural layout.  Param tree (kernel [H*D, out],
    bias [out]) is identical to nn.Dense."""
    out_dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, o, bias_scale):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.heads * self.dim_head, self.out_dim),
                          self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                          self.param_dtype)
        y = o @ kern.astype(self.dtype)
        return y + bias_scale[..., None] * bias.astype(self.dtype)


class AudioCrossAttnLayer(nn.Module):
    """One per-DiT-layer audio cross-attention (frame-local).

    video tokens [B, S, D] (S = F*HW), audio ctx [B, I, F, n_ctx, A].

    With `weights` ([B, S, I], the swap-and-inverted routing) the whole
    layer — frame-local attention, identity combine, out-projection with the
    sum_i(w)-scaled bias — runs through the fused short-KV kernel and
    returns the injection [B, S, D] directly.  Without weights, returns
    per-id features [B, I, S, D] (reference contract,
    `audio_model.py:223-270`).  Q is computed once (shared across ids).
    """
    cfg: AudioConfig = AudioConfig()
    # skip to_out: the caller combines identities with the (swapped-inverted)
    # routing first and applies to_out once — linear, so exact, and halves
    # the out-projection FLOPs (init always uses the default variant so the
    # param tree keeps to_out)
    return_pre_out: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video, audio_ctx, weights=None):
        c = self.cfg
        b, s, d = video.shape
        n_id, f, n_ctx = audio_ctx.shape[1], audio_ctx.shape[2], audio_ctx.shape[3]
        hw = s // f
        dh = c.attention_head_dim
        nh = c.num_attention_heads
        inner = nh * dh

        from ..parallel.mesh import constrain_batch

        video = constrain_batch(video)
        q_in = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm_q")(video)
        q_in = constrain_batch(q_in)
        q = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(q_in)
        k = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(audio_ctx)
        v = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(audio_ctx)

        if weights is not None:
            from ..ops.short_kv_attention import short_kv_attention_combined_flat

            # q stays FLAT in the to_q projection's natural (8,128)-tiled
            # layout ([B,S,inner] -> [B*F, HW, inner] splits the sublane
            # dim only): no lane-padded [.., H, 64] q array exists, so
            # XLA fuses no strided-relayout epilogue into the to_q matmul
            # (head-major layout measured ~24 TF/s in-model; 4D q-major
            # still pads 64->128 and regressed)
            qk = q.reshape(b * f, hw, nh * dh)
            kk = (k.reshape(b, n_id, f, n_ctx, nh, dh)
                  .transpose(0, 2, 1, 4, 3, 5)
                  .reshape(b * f, n_id, nh, n_ctx, dh))
            vk = (v.reshape(b, n_id, f, n_ctx, nh, dh)
                  .transpose(0, 2, 1, 4, 3, 5)
                  .reshape(b * f, n_id, nh, n_ctx, dh))
            wk = weights.astype(self.dtype).reshape(b * f, hw, n_id)
            o = short_kv_attention_combined_flat(qk, kk, vk, wk, dh ** -0.5)
            inject = EinsumOutProj(d, nh, dh, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="to_out")(o.reshape(b, s, nh * dh),
                                                  wk.sum(-1).reshape(b, s))
            return inject

        q = q.reshape(b, f, hw, nh, dh)
        k = k.reshape(b, n_id, f, n_ctx, nh, dh)
        v = v.reshape(b, n_id, f, n_ctx, nh, dh)

        sc = jnp.einsum("bfqhd,bifkhd->bifhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
        p = jax.nn.softmax(sc, axis=-1).astype(v.dtype)
        o = jnp.einsum("bifhqk,bifkhd->bifqhd", p, v)
        o = o.reshape(b, n_id, s, inner)
        if self.return_pre_out:
            return o
        return nn.Dense(d, use_bias=True, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out")(o)


class AudioStatics(nn.Module):
    """Non-layer audio params: proj model, mute tokens, (dead) learnable_scale."""
    cfg: AudioConfig = AudioConfig()
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.proj = AudioProjModel(self.cfg, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.mute_learnable_tokens = self.param(
            "mute_learnable_tokens", nn.initializers.zeros,
            (1, self.cfg.context_tokens, self.cfg.audio_dim), self.param_dtype)
        # present-but-unused in the reference forward (`audio_model.py:149`);
        # kept for checkpoint-shape parity
        self.learnable_scale = self.param(
            "learnable_scale", nn.initializers.constant(0.01), (1,), self.param_dtype)

    def __call__(self, audio_embeds: jnp.ndarray, num_pixel_frames: int,
                 mute_embeds: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """audio_embeds: [B, n_tracks, A, blocks, C] -> ctx [B, I, F_lat, 32, 768].

        When n_tracks == 1, the second identity's track is the mute fixture
        (+ learnable tokens, dropout 0.1 at train time) per reference
        `audio_model.py:201-220, transformer.py:874-878`.
        """
        c = self.cfg
        b, n_tracks = audio_embeds.shape[0], audio_embeds.shape[1]
        flat = audio_embeds.reshape((b * n_tracks,) + audio_embeds.shape[2:])
        wins = sliding_windows(flat, num_pixel_frames, c.window_size, c.window_stride)
        ctx = self.proj(wins)
        ctx = ctx.reshape((b, n_tracks) + ctx.shape[1:])   # [B, n, F_lat, 32, 768]

        if n_tracks == 1:
            if mute_embeds is None:
                raise ValueError("single-track audio requires mute_embeds fixture")
            mw = sliding_windows(mute_embeds[None], num_pixel_frames,
                                 c.window_size, c.window_stride)
            mute_ctx = self.proj(mw)                       # [1, F_lat, 32, 768]
            tok = self.mute_learnable_tokens.astype(ctx.dtype)
            if not deterministic:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 0.9, tok.shape)
                tok = jnp.where(keep, tok / 0.9, 0.0)
            mute_ctx = mute_ctx + tok[None]                # [1, F, 32, 768]
            mute_ctx = jnp.broadcast_to(mute_ctx[None], ctx.shape)
            ctx = jnp.concatenate([ctx, mute_ctx.astype(ctx.dtype)], axis=1)
        return ctx
