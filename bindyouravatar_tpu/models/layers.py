"""Shared flax leaf modules for the DiT and conditioning stacks.

These are the building blocks scanned over in `dit.py`.  Semantics mirror
diffusers' CogVideoX modules as instantiated by the reference
(`models/transformer.py:143-262, 378-427`), re-expressed for TPU/XLA:
LayerNorm statistics in fp32, attention via the shared `ops.attention`
dispatcher, patchify as reshape+matmul.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention, sdpa


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of activation dtype."""
    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    fused: bool = False
    # memory-lean custom vjp (ops/layernorm.lean_layernorm): saves bf16
    # input + squeezed fp32 stats, closed-form backward — for norms whose
    # autodiff fp32 temps dominate the training live set (per-head QK norms)
    lean: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        if self.lean and self.use_scale and self.use_bias:
            from ..ops.layernorm import lean_layernorm

            scale = self.param("scale", nn.initializers.ones, (d,),
                               self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (d,),
                              self.param_dtype)
            return lean_layernorm(x, scale, bias, self.eps)
        if self.fused and self.use_scale and self.use_bias:
            # single-pass Pallas LN on TPU (bf16 read + fp32 stats + bf16
            # write in VMEM) — XLA's lowering materialises a fp32 convert
            # and fuses the normalize into the consuming matmul, which then
            # reads 2x bytes (audio to_q measured 145 vs 175 TF/s).  OPT-IN:
            # where the LN output feeds an adaLN modulation (LayerNormZero),
            # XLA's own fusion wins — forcing the kernel there cost the bare
            # DiT ~160 ms/step (chip-measured r4) — so only the profiled
            # conditioning-path sites set fused=True
            from ..ops.layernorm import fused_layernorm

            scale = self.param("scale", nn.initializers.ones, (d,),
                               self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (d,),
                              self.param_dtype)
            return fused_layernorm(x, scale, bias, self.eps)
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (d,), self.param_dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (d,), self.param_dtype)
        return y.astype(dtype)


class LayerNormZero(nn.Module):
    """CogVideoXLayerNormZero: adaLN producing (video, text) shift/scale/gate.

    Returns (norm_video, norm_text, gate_video, gate_text).
    """
    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder_hidden, temb):
        mod = nn.Dense(6 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(nn.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
        norm = LayerNorm(eps=self.eps, param_dtype=self.param_dtype, name="norm")
        h = norm(hidden) * (1 + scale[:, None]) + shift[:, None]
        e = norm(encoder_hidden) * (1 + e_scale[:, None]) + e_shift[:, None]
        return h.astype(self.dtype), e.astype(self.dtype), gate[:, None], e_gate[:, None]


class AdaLayerNorm(nn.Module):
    """Final adaLN (diffusers AdaLayerNorm, chunk_dim=1: shift then scale)."""
    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        mod = nn.Dense(2 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        y = LayerNorm(eps=self.eps, param_dtype=self.param_dtype, name="norm")(x)
        return (y * (1 + scale[:, None]) + shift[:, None]).astype(self.dtype)


class TimestepEmbedding(nn.Module):
    """Linear-SiLU-Linear over sinusoidal features (diffusers semantics)."""
    time_embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_freq):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_1")(t_freq)
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="linear_2")(x)


class _DenseParams(nn.Module):
    """Params-only twin of nn.Dense (same tree: kernel/bias, same inits) —
    lets ff_chunked own the matmuls while checkpoints stay interchangeable
    with the plain Dense path."""
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return k, b


class FeedForward(nn.Module):
    """gelu-approximate MLP (diffusers FeedForward, biases on).

    `chunks > 1`: sequence-chunked custom-VJP path (ops/ff.py) — same
    math and param tree, bounds the backward's [S, 4*dim] intermediates
    to [S/chunks, 4*dim] (the single-chip train-depth lever).
    """
    dim: int
    mult: int = 4
    chunks: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.chunks > 1:
            from ..ops.ff import ff_chunked
            w0, b0 = _DenseParams(self.dim * self.mult, self.param_dtype,
                                  name="net_0")(x.shape[-1])
            w2, b2 = _DenseParams(self.dim, self.param_dtype,
                                  name="net_2")(self.dim * self.mult)
            return ff_chunked(x.astype(self.dtype), w0, b0, w2, b2,
                              self.chunks)
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="net_0")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="net_2")(h)


class _Affine(nn.Module):
    """Registers LayerNorm-compatible scale/bias params without running the
    norm — the fused-QK-norm flat path reads them and normalises inside the
    flash kernel; the param tree stays identical to `LayerNorm` (checkpoints
    and importers unchanged)."""
    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.dim,),
                       self.param_dtype)
        return s, b


class HeadLayerNorm(nn.Module):
    """LN over the trailing head dim of [..., H, dh] with the affine
    shared across heads (the reference's per-head q_norm/k_norm).  Routes
    through `ops.layernorm.head_layernorm`: Pallas fwd+bwd on the flat
    [..., H*dh] view (free bitcast) — no fp32 [S, H*dh] HBM temps in the
    training backward.  Param tree identical to LayerNorm (scale/bias
    of [dh])."""
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.layernorm import head_layernorm

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (d,),
                          self.param_dtype)
        flat = x.reshape(x.shape[:-2] + (x.shape[-2] * d,))
        return head_layernorm(flat, scale, bias, self.eps).reshape(x.shape)


class JointSelfAttention(nn.Module):
    """CogVideoX joint text+video self-attention.

    QKV over the concatenated [text, video] sequence, per-head QK LayerNorm
    (eps 1e-6), RoPE applied to the video positions only, out projection.
    Mirrors `CogVideoXAttnProcessor2_0` as wired at
    reference `models/transformer.py:200-208`.

    `fuse_qk_norm=True` (inference only — the fused path has no vjp) keeps
    q/k/v in the projections' FLAT [B, S, H*D] layout end to end and runs
    the QK-LN + RoPE inside the flat flash kernel: no lane-padded
    [B,S,H,64] arrays, no LN round trips, no transpose epilogues on the
    qkv dots (to_v measured at 88 TF/s vs 139 clean).
    """
    heads: int
    head_dim: int
    qk_norm: bool = True
    bias: bool = True
    out_bias: bool = True
    use_flash: bool = True
    fuse_qk_norm: bool = False
    lora_rank: int = 0       # LoRA on to_q/to_k (reference trains r=128 there)
    lora_alpha: float = 128.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder_hidden,
                 rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
                 sp_mesh=None):
        from ..ops.flash_attention import _round_up

        text_len = encoder_hidden.shape[1]
        x = jnp.concatenate([encoder_hidden, hidden], axis=1)  # [B, L+S, D]
        s_real = x.shape[1]
        # pad the joint sequence BEFORE the qkv projection: to the flash
        # block multiple (q/k/v born padded — no separate pad copies, 3 x
        # 432 MB of HBM temps at 17,776 tokens), or to the ring-shard
        # multiple under sequence parallelism
        if sp_mesh is not None:
            sp = sp_mesh.shape["sp"]
            s_pad = _round_up(s_real, sp * 128)
            if s_pad != s_real:
                x = jnp.pad(x, ((0, 0), (0, s_pad - s_real), (0, 0)))
        elif self.use_flash and s_real >= 1024:
            s_pad = _round_up(s_real, 2048)
            if s_pad != s_real:
                x = jnp.pad(x, ((0, 0), (0, s_pad - s_real), (0, 0)))
        b, s, _ = x.shape
        inner = self.heads * self.head_dim

        dense = lambda name: nn.Dense(inner, use_bias=self.bias, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)

        def with_lora(name, base):
            """base + (x @ A) @ B * alpha/r — LoRA the peft way (B zero-init)."""
            if self.lora_rank <= 0:
                return base
            a = self.param(f"{name}_lora_A", nn.initializers.he_uniform(),
                           (x.shape[-1], self.lora_rank), self.param_dtype)
            bb = self.param(f"{name}_lora_B", nn.initializers.zeros,
                            (self.lora_rank, inner), self.param_dtype)
            scaling = self.lora_alpha / self.lora_rank
            delta = (x @ a.astype(x.dtype)) @ bb.astype(x.dtype) * scaling
            return base + delta

        flat = (self.fuse_qk_norm and self.qk_norm and sp_mesh is None
                and self.use_flash and s >= 1024
                and self.head_dim in (32, 64, 128))
        if flat:
            # FLAT inference path: q/k/v stay [B, S, H*D]; LN+RoPE fuse
            # into the flat flash kernel (scratch-cached, computed once per
            # tile — unlike the reverted per-grid-step fusion, +26 ms/call)
            q = with_lora("to_q", dense("to_q")(x))
            k = with_lora("to_k", dense("to_k")(x))
            # to_v emits V TRANSPOSED ([B, H*D, S]): the swapaxes fuses into
            # the dot's epilogue, and the transposed-PV flash kernel then
            # runs both its matmuls at full MXU width (chip A/B 53.9 ->
            # 45.5 ms/call, runs/chip_r4/flat_t.log).  Param tree is the
            # plain nn.Dense("to_v") — importers/checkpoints unchanged.
            qs_, qb_ = _Affine(self.head_dim, self.param_dtype, name="norm_q")()
            ks_, kb_ = _Affine(self.head_dim, self.param_dtype, name="norm_k")()
            vt = jnp.swapaxes(dense("to_v")(x), 1, 2)
            # out_transposed: the kernel stores its accumulator's natural
            # [B, H*D, S] orientation (no in-kernel eye-matmul rotate); the
            # swapaxes below folds into to_out's dot (contraction over H*D)
            ot = attention(q, k, vt, use_flash=True, kv_len=s_real,
                           rope=rope, rope_start=text_len, layout="flat",
                           heads=self.heads, qk_norm=(qs_, qb_, ks_, kb_),
                           v_transposed=True, out_transposed=True)
            o = jnp.swapaxes(ot[:, :, :s_real], 1, 2)
            o = nn.Dense(hidden.shape[-1], use_bias=self.out_bias,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="to_out")(o)
            return o[:, text_len:], o[:, :text_len]

        # (r3, measured: pinning the FLAT projections with a barrier to
        # stop the transpose fusing into the dots is a LOSS in-model —
        # bare step 7038 -> 7134 ms — the fused epilogue beats a plain dot
        # + separate transpose here despite the lower reported TF/s)
        q = with_lora("to_q", dense("to_q")(x)).reshape(b, s, self.heads, self.head_dim)
        k = with_lora("to_k", dense("to_k")(x)).reshape(b, s, self.heads, self.head_dim)
        v = dense("to_v")(x).reshape(b, s, self.heads, self.head_dim)

        # NOTE (r3, measured): fusing this LN into the flash kernel
        # per-grid-step (`flash_attention(qk_norm=...)` on the bhsd path)
        # is a LOSS in-model — the kernel reloads q/k tiles per (iq, ik)
        # grid step, so the LN's cross-lane mean/var reductions recompute
        # nk/nq times (+26 ms/call).  The FLAT path above fixes that with
        # scratch caching; this bshd path (training / SP / tiny shapes)
        # keeps the outside LN.
        qk_aff = None
        if self.qk_norm:
            # Pallas per-head LN (MXU segment stats) fwd AND bwd: the XLA
            # backward of the fp32 LN spec — autodiff or closed-form —
            # keeps fp32 [S, H*D] sub/mul temps live per rematted block
            # backward (4 x 216 MB at flagship geometry, the top HBM
            # allocations of the depth-14 single-chip step,
            # runs/chip_r5b/depth14.log); the kernel keeps fp32 in VMEM
            q = HeadLayerNorm(eps=1e-6, param_dtype=self.param_dtype,
                              name="norm_q")(q)
            k = HeadLayerNorm(eps=1e-6, param_dtype=self.param_dtype,
                              name="norm_k")(k)

        if sp_mesh is not None:
            # sequence-parallel ring attention over the `sp` mesh axis —
            # the >49-frame superset path (the reference hard-caps 49,
            # `pipeline_bindyouravatar.py:739-742`)
            from ..ops.ring_attention import ring_attention
            from ..ops.rope import apply_rotary_emb

            qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if rope is not None:
                cos, sin = rope
                end = text_len + cos.shape[0]
                rot = lambda t: jnp.concatenate(
                    [t[:, :, :text_len],
                     apply_rotary_emb(t[:, :, text_len:end], cos, sin),
                     t[:, :, end:]], axis=2)
                qt, kt = rot(qt), rot(kt)
            o = ring_attention(qt, kt, vt, mesh=sp_mesh,
                               scale=self.head_dim ** -0.5, valid_len=s_real)
            o = o.transpose(0, 2, 1, 3)
        else:
            hpb = max(1, 128 // self.head_dim)
            if self.use_flash and self.heads % hpb == 0:
                # FLAT training path: q/k/v flattened back to [B, S, H*D]
                # (a free reshape of the bshd view) — the custom-VJP flat
                # kernel's saved residuals are then the projections
                # themselves, with NO [B,H,S,D] transposed copies in the
                # backward's live set (~650 MB/block at flagship geometry,
                # the depth-14 single-chip limiter; runs/chip_r5/depth14.log)
                flat3 = lambda t: t.reshape(b, s, inner)
                o = attention(flat3(q), flat3(k), flat3(v),
                              use_flash=True, kv_len=s_real, rope=rope,
                              rope_start=text_len, layout="flat",
                              heads=self.heads)
                o = o.reshape(b, s, self.heads, self.head_dim)
            else:
                # stay in [B, S, H, Dh] — the kernel consumes the
                # projections' natural layout; RoPE fused in-kernel
                o = attention(q, k, v, use_flash=self.use_flash,
                              kv_len=s_real, rope=rope, rope_start=text_len,
                              layout="bshd", qk_norm=qk_aff)
        # named for DiTConfig.remat_policy="save_attn": keep this tensor
        # across the remat backward so the flash forward never recomputes
        from jax.ad_checkpoint import checkpoint_name
        o = checkpoint_name(o, "attn_out")
        o = o[:, :s_real].reshape(b, s_real, inner)
        o = nn.Dense(hidden.shape[-1], use_bias=self.out_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_out")(o)
        return o[:, text_len:], o[:, :text_len]


class CogVideoXBlock(nn.Module):
    """One DiT block (reference `models/transformer.py:143-262`)."""
    dim: int
    heads: int
    head_dim: int
    time_embed_dim: int
    eps: float = 1e-5
    ff_mult: int = 4
    ff_chunks: int = 1
    qk_norm: bool = True
    attention_bias: bool = True
    use_flash: bool = True
    fuse_qk_norm: bool = False
    lora_rank: int = 0
    lora_alpha: float = 128.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder_hidden, temb, rope, sp_mesh=None):
        text_len = encoder_hidden.shape[1]
        norm1 = LayerNormZero(self.dim, eps=self.eps, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="norm1")
        nh, ne, gate, e_gate = norm1(hidden, encoder_hidden, temb)
        attn_h, attn_e = JointSelfAttention(
            heads=self.heads, head_dim=self.head_dim, qk_norm=self.qk_norm,
            bias=self.attention_bias, use_flash=self.use_flash,
            fuse_qk_norm=self.fuse_qk_norm,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn1")(nh, ne, rope, sp_mesh)
        hidden = hidden + (gate * attn_h).astype(hidden.dtype)
        encoder_hidden = encoder_hidden + (e_gate * attn_e).astype(hidden.dtype)

        norm2 = LayerNormZero(self.dim, eps=self.eps, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="norm2")
        nh, ne, gate_ff, e_gate_ff = norm2(hidden, encoder_hidden, temb)
        ff = FeedForward(self.dim, mult=self.ff_mult, chunks=self.ff_chunks,
                         dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ff")
        ff_out = ff(jnp.concatenate([ne, nh], axis=1))
        hidden = hidden + (gate_ff * ff_out[:, text_len:]).astype(hidden.dtype)
        encoder_hidden = encoder_hidden + (e_gate_ff * ff_out[:, :text_len]).astype(hidden.dtype)
        return hidden, encoder_hidden


class PatchEmbed(nn.Module):
    """CogVideoXPatchEmbed: patchified-latent proj + text proj, concatenated.

    Input latents arrive already patchified ([B, S_vid, C*p*p], see
    `ops.patch.patchify`), so the 2x2 conv becomes one MXU matmul.
    """
    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_embeds, patch_tokens):
        t = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="text_proj")(text_embeds)
        x = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(patch_tokens)
        return jnp.concatenate([t, x], axis=1)
