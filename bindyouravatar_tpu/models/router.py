"""Face-injection cross-attention + the dynamic 3D-mask embedding router.

`PerceiverCrossAttention` mirrors reference `models/router.py:196-275`
(Q from video tokens, KV from LFE face tokens, detached Q/K handed to the
router).  `MultiIPRouter` mirrors `models/router.py:280-423` but is
shape-polymorphic over the (T, H, W) latent grid and batched over the real
batch axis instead of the reference's per-sample python loop
(`transformer.py:779-831`).

Canonical grid note: the reference hard-codes `frames=13, height=45,
width=30` (`router.py:313-315`) while the true latent grid is (13, 30, 45);
both flatten to the same 17,550 tokens so the model is self-consistent.  We
use the canonical (T, H=30, W=45) layout; the flat token order is identical,
so checkpoints interop (the sinusoidal pos-emb frequency assignment differs
— documented divergence, immaterial for from-scratch training).

Gradient contract (SURVEY.md §7 "hard parts"): q/k fed to the router are
`stop_gradient`-ed, so router losses do NOT backprop into the perceiver;
the router's own projections and trunk do get gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import RouterConfig
from .layers import LayerNorm


class PerceiverCrossAttention(nn.Module):
    """Face feature injection attention.

    Inputs: face tokens [B, I, n_tok, kv_dim], video tokens [B, S, dim].
    Returns (id_feat, q_flat [B, S, H*dh] (detached), k_flat
    [B, I, n_tok, H*dh] (detached)); id_feat is [B, I, S, dim] normally or
    the head-major kernel layout [B, I, H, S, dh] with `return_pre_out`.

    The detached q/k hand-off to the router uses the projections' natural
    h-major flat packing (f = h*dh + d) — NO [B,H,S,dh] -> flat transposes.
    The reference flattens d-major (`router.py:375-378` permute(0,2,3,1));
    weight importers absorb the difference as a row permutation of the
    router's shared norms and per-layer projections (exact).
    """
    dim: int = 3072
    dim_head: int = 128
    heads: int = 16
    kv_dim: int = 2048
    # return features BEFORE to_out: the caller combines identities with the
    # routing weights first and applies to_out ONCE (linear, so exact) —
    # halves the out-projection FLOPs and skips the [B,I,S,dim] HBM tensor
    return_pre_out: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, face_tokens, video_tokens):
        from ..ops.short_kv_attention import short_kv_attention

        b, n_id, n_tok, _ = face_tokens.shape
        s = video_tokens.shape[1]
        inner = self.dim_head * self.heads

        from ..parallel.mesh import constrain_batch

        x = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm1")(face_tokens)
        lat = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm2")(video_tokens)
        x = constrain_batch(x)

        q_flat = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_q")(lat)
        # separate k/v dots (the reference fuses them into one to_kv linear,
        # `router.py:223`; the importer splits that weight).  Fused + split
        # makes the SPMD partitioner involuntarily rematerialize the split's
        # cotangent concatenate under FSDP (it can't reshard batch-sharded ->
        # feature-sharded efficiently); two dots have no concat at all.
        k_flat = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_k")(x)
        v_flat = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="to_v")(x)
        k_flat = constrain_batch(k_flat)
        v_flat = constrain_batch(v_flat)

        q = q_flat.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k_flat.reshape(b, n_id, n_tok, self.heads,
                           self.dim_head).transpose(0, 1, 3, 2, 4)
        v = v_flat.reshape(b, n_id, n_tok, self.heads,
                           self.dim_head).transpose(0, 1, 3, 2, 4)

        o = short_kv_attention(q, k, v, self.dim_head ** -0.5)  # [B,I,H,S,dh]
        if not self.return_pre_out:
            o = o.transpose(0, 1, 3, 2, 4).reshape(b, n_id, s, inner)
            o = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="to_out")(o)
        return o, jax.lax.stop_gradient(q_flat), jax.lax.stop_gradient(k_flat)


class SelfAttention(nn.Module):
    """MHA (diffusers `Attention` with bias, as used by STAB).

    Long sequences (the STAB spatial attention over H*W=1350 tokens x 52
    batch rows) go through the flash dispatcher — the naive fp32 score
    tensor is 2.95 GB of HBM temp per step (measured) — short ones use SDPA.
    """
    dim: int
    heads: int = 8
    bias: bool = True
    # inference-only (no vjp): route through the transposed-PV flash kernel
    # — to_v emits V as [B, H*D, S] in the dot's epilogue and both kernel
    # matmuls run at full MXU width (the DiT flat path's round-4 win)
    v_transposed: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import attention

        b, s, _ = x.shape
        dh = self.dim // self.heads
        dense = lambda name, d=self.dim: nn.Dense(
            d, use_bias=self.bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        # FLAT [B, S, H*D] end-to-end: the flash kernel lane-slices heads in
        # VMEM, so no lane-padded [B, S, H, 64->128] or transposed
        # [B, H, S, D] arrays ever hit HBM; differentiable (custom_vjp) so
        # the trained router uses the same path
        q = dense("to_q")(x)
        k = dense("to_k")(x)
        use_flash = dh % 64 == 0   # Mosaic lane width; tiny test dims -> SDPA
        if self.v_transposed and use_flash and s >= 1024:
            vt = jnp.swapaxes(dense("to_v")(x), 1, 2)
            ot = attention(q, k, vt, use_flash=True, layout="flat",
                           heads=self.heads, v_transposed=True,
                           out_transposed=True)
            o = jnp.swapaxes(ot, 1, 2)   # folds into to_out's dot
        else:
            v = dense("to_v")(x)
            o = attention(q, k, v, use_flash=use_flash, layout="flat",
                          heads=self.heads)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out")(o)


class AxisAttention(nn.Module):
    """Self-attention along ONE tiny axis of a [B, I, T, H, W, C] block via
    the packed-head Pallas kernel: the sequence axis is transposed next to
    the channels once, QKV project on C, heads split by reshape (free), and
    scores/softmax/PV run entirely in VMEM with (seq, head) folded into one
    MXU tile (`ops/packed_attention.py`).  XLA's layout for the [..., S, S]
    fp32 score tensors (S = 13 or 2) pads their minor dims to (8k, 128)
    tiles — a 10-60x blowup that made every softmax elementwise op
    HBM-bound (measured ~18 ms of a 55 ms router invocation).  Same math
    and the same param tree (to_q/to_k/to_v/to_out, bias) as
    `SelfAttention` — checkpoints and importers are layout-agnostic.
    """
    dim: int
    axis: int                     # 1 = multi-ID, 2 = temporal
    heads: int = 8
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.packed_attention import pair_axis_attention, tiny_seq_attention

        sh = x.shape
        dh = self.dim // self.heads
        dense = lambda name: nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        if self.axis == 1 and sh[1] == 2:
            # multi-ID fast path: the id axis stays LEADING ([B, I, THW, C]
            # is a FREE reshape of [B, I, T, H, W, C]) — no transpose, and
            # projections + kernel all run on dense-tiled arrays.  The old
            # path's [M, 2, C] arrays tile 2 -> 8 sublanes in HBM (4x) and
            # taxed the transpose, all four projections, and the kernel.
            b, i = sh[0], sh[1]
            xf = x.reshape(b, i, -1, self.dim)
            q = dense("to_q")(xf)
            k = dense("to_k")(xf)
            v = dense("to_v")(xf)
            o = pair_axis_attention(q, k, v, self.heads, dh ** -0.5)
            o = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="to_out")(o)
            return o.reshape(sh)
        perm = [j for j in range(5) if j != self.axis] + [self.axis, 5]
        xt = x.transpose(perm)                      # [batch..., S, C]
        s = xt.shape[-2]
        m = int(np.prod(xt.shape[:-2]))
        xf = xt.reshape(m, s, self.dim)
        # channel-packed kernel IO: the projections' [M, S, C] layout flows
        # straight through (head split happens in VMEM lane slices / the
        # packed fold — no [M, S*H, dh] HBM reshapes)
        q = dense("to_q")(xf)
        k = dense("to_k")(xf)
        v = dense("to_v")(xf)
        o = tiny_seq_attention(q, k, v, self.heads, dh ** -0.5)
        o = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_out")(o)
        inv = list(np.argsort(perm))
        return o.reshape(xt.shape).transpose(inv)


class SpatialTemporalAttentionBlock(nn.Module):
    """Three factored self-attentions (spatial / temporal / multi-ID) + MLP.

    Mirrors reference `models/router.py:425-493`, with the real batch axis
    folded into each attention's batch.  Spatial (H*W=1350 tokens) routes
    through the flash kernel; temporal (T=13) and multi-ID (I=2) use the
    transpose-free `AxisAttention` einsums.
    """
    dim: int
    heads: int = 8
    mlp_ratio: int = 1
    inference_vt: bool = False    # transposed-PV spatial attn (no-vjp path)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, I, T, H, W, C]
        b, i, t, h, w, c = x.shape
        spatial = SelfAttention(self.dim, self.heads,
                                v_transposed=self.inference_vt,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype, name="spatial_attn")
        temporal = AxisAttention(self.dim, axis=2, heads=self.heads,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="temporal_attn")
        multi_id = AxisAttention(self.dim, axis=1, heads=self.heads,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="multi_id_attn")

        xs = x.reshape(b * i * t, h * w, c)
        xs = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm1")(xs)
        x = x + spatial(xs).reshape(b, i, t, h, w, c)

        xt = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm2")(x)
        x = x + temporal(xt)

        xi = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm3")(x)
        x = x + multi_id(xi)

        y = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm4")(x)
        # flat [M, C] for the MLP matmuls: the 6D [B,I,T,H,W,C] shape leaves
        # XLA a ragged (45, 512)-minor row tiling (measured 52 GF/s); the
        # free reshape to 2D restores dense MXU tiles
        y = y.reshape(-1, c)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(y)
        return x + y.reshape(x.shape)


@functools.lru_cache(maxsize=16)
def _router_pos_emb(t: int, h: int, w: int, feat_dim: int) -> np.ndarray:
    """Additive 3D sincos pos-emb, flat [T*H*W, feat_dim]
    (reference `router.py:334-362`, made grid-polymorphic)."""
    third = feat_dim // 3

    def axis_emb(n):
        pos = np.arange(n, dtype=np.float64)[:, None]
        div = np.power(10000.0, np.arange(0, third, 2, dtype=np.float64) / third)
        ang = pos / div
        return np.stack([np.sin(ang), np.cos(ang)], axis=-1).reshape(n, -1)

    te, he, we = axis_emb(t), axis_emb(h), axis_emb(w)
    full = np.zeros((t, h, w, feat_dim), dtype=np.float32)
    d = te.shape[-1]
    full[..., :d] = te[:, None, None, :]
    full[..., d:2 * d] = he[None, :, None, :]
    full[..., 2 * d:3 * d] = we[None, None, :, :]
    return full.reshape(t * h * w, feat_dim)


class MultiIPRouterLayerProj(nn.Module):
    """Per-DiT-layer router projections (reference to_q[i]/to_k[i]).

    Kept separate so the per-layer params stack along the scan axis while
    the trunk (`MultiIPRouterTrunk`) is shared.
    """
    q_k_dim: int = 2048
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_flat, k_flat):
        to_q = nn.Dense(self.q_k_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_q")
        to_k = nn.Dense(self.q_k_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_k")
        return to_q(q_flat), to_k(k_flat)


class MulReduceDense(nn.Module):
    """Dense(1) computed as multiply+reduce.  A [.., S, 1] dot output pads
    its minor dim 1 to 128 lanes (128x HBM write amplification); the
    mul-reduce emits the squeezed [.., S] directly.  Param tree (kernel
    [d, 1], bias [1]) is identical to nn.Dense — importers unchanged."""
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kern = self.param("kernel", nn.initializers.lecun_normal(), (d, 1),
                          self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (1,), self.param_dtype)
        # products in fp32, like the dot's MXU accumulation — bf16-rounded
        # products would perturb near-threshold routing logits
        w = kern[:, 0].astype(jnp.float32)
        logit = (x.astype(jnp.float32) * w).sum(-1) + bias[0].astype(jnp.float32)
        return logit.astype(self.dtype)


class MultiIPRouterTrunk(nn.Module):
    """Shared router trunk: norms, re-attention, pos-emb, 4 STABs, head.

    forward(q [B,H,S,dh], k [B,I,H,n_tok,dh], layer projections applied via
    `layer_proj` module call outside) -> routing [B, S, I] in [0,1].
    """
    cfg: RouterConfig = RouterConfig()
    inference_vt: bool = False    # thread to the STAB spatial attention
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_proj, k_proj, grid: Tuple[int, int, int]):
        """q_proj: [B, S, q_k_dim] (already layer-projected & pre-normed),
        k_proj: [B, I, n_tok, q_k_dim]."""
        c = self.cfg
        t, h, w = grid
        b, s, _ = q_proj.shape
        n_id, n_tok = k_proj.shape[1], k_proj.shape[2]
        dh = c.q_k_dim // c.num_heads

        # re-attention features feat[b,i,s,(k*heads+h)] = per-head q.k scores
        # (reference `router.py:385-390`).  Computed as ONE dense matmul
        # against a head-block-diagonal expansion of k: the per-head einsum's
        # [.., s, n_tok] output pads n_tok=32 to 128 lanes (4x fp32 HBM blow
        # -up) and needs a transpose+convert to reach the [.., s, 512] packed
        # layout — the dense form writes that layout directly, and the 16x
        # extra MACs ride the MXU for ~0.5 ms (measured net ~-2.5 ms/call).
        kx = jnp.repeat(k_proj.transpose(0, 1, 3, 2), c.num_heads, axis=-1)
        fidx = jax.lax.broadcasted_iota(jnp.int32, (c.q_k_dim, c.feat_dim), 0)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (c.q_k_dim, c.feat_dim), 1)
        kx = kx * (fidx // dh == gidx % c.num_heads).astype(kx.dtype)
        feat = jnp.einsum("bsf,bifg->bisg", q_proj, kx,
                          preferred_element_type=jnp.float32)
        feat = feat.astype(self.dtype)
        feat = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm")(feat)

        pos = jnp.asarray(_router_pos_emb(t, h, w, c.feat_dim))
        feat = feat + pos.astype(feat.dtype)[None, None]
        feat = feat.reshape(b, n_id, t, h, w, c.feat_dim)

        for li in range(c.num_attention_layers):
            feat = SpatialTemporalAttentionBlock(
                dim=c.feat_dim, heads=c.attn_heads, mlp_ratio=c.mlp_ratio,
                inference_vt=self.inference_vt,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"st_{li}")(feat)

        feat = feat.reshape(b, n_id, s, c.feat_dim)
        logit = MulReduceDense(dtype=self.dtype, param_dtype=self.param_dtype,
                               name="final_proj")(feat)     # [B, I, S]
        routing = jax.nn.sigmoid(logit.astype(jnp.float32))  # [B, I, S]
        return routing.transpose(0, 2, 1)                   # [B, S, I]


class RouterNorms(nn.Module):
    """Shared input norms applied before the per-layer projections
    (reference `router.py:380-383`: norm_q/norm_k are shared)."""
    q_k_dim: int = 2048
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_flat, k_flat):
        q = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm_q")(q_flat)
        k = LayerNorm(param_dtype=self.param_dtype, fused=True, name="norm_k")(k_flat)
        return q, k


def fold_heads_to_flat(q: jnp.ndarray, k: jnp.ndarray):
    """[B,H,S,dh]/[B,I,H,n,dh] -> flat [B,S,H*dh]/[B,I,n,H*dh], h-MAJOR
    packing (f = h*dh + d) — the projections' natural layout, which the
    perceiver now hands to the router directly (no transposes).  The
    reference flattens d-major (permute(0,2,3,1), `router.py:375-378`);
    `import_router_modules` permutes the router's norm/projection rows so
    imported weights see their expected packing (exact)."""
    b, hh, s, dh = q.shape
    q_flat = q.transpose(0, 2, 1, 3).reshape(b, s, dh * hh)
    bi, n_id, hh2, n, dh2 = k.shape
    k_flat = k.transpose(0, 1, 3, 2, 4).reshape(bi, n_id, n, dh2 * hh2)
    return q_flat, k_flat
