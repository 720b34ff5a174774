"""BindYourAvatar DiT denoiser — functional TPU-native core.

Re-architecture of reference `BindyouravatarTransformer3DModel.forward`
(`models/transformer.py:615-1021`):

* The 42 blocks run as ONE `lax.scan` over layer *groups* whose size is the
  injection-schedule period (lcm of the face/audio intervals, = 2 for the 5B
  config), with per-layer params stacked along the scan axis.  The group
  body is a static Python program — no `lax.cond` — so XLA compiles one
  group once instead of 42 block graphs.
* The reference's per-batch-element python loops with `repeat(2,1,1)` and
  `torch.cuda.empty_cache()` (`transformer.py:779-831, 870-934`) become
  batched einsums over an explicit identity axis.
* Teacher-forced / SAM2-forced routing enters as a single `routing_override`
  tensor prepared by the caller (noising / temporal-OR done host-side);
  router predictions are always returned for the losses.
* Gradient flow: router sees `stop_gradient`-ed perceiver Q/K (see
  `router.py`); everything else follows autodiff.

Losses over the returned routing logits live in `training/losses.py`
(the reference computes them inline at `transformer.py:963-1021`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig, DiTConfig, LFEConfig, RouterConfig
from ..ops.patch import patchify, unpatchify
from ..ops.rope import (get_3d_rotary_pos_embed, get_3d_sincos_pos_embed,
                        get_resize_crop_region_for_grid, timestep_embedding)
from .audio import AudioCrossAttnLayer, AudioStatics
from .layers import (AdaLayerNorm, CogVideoXBlock, LayerNorm, PatchEmbed,
                     TimestepEmbedding)
from .lfe import LocalFacialExtractor
from .router import (MultiIPRouterLayerProj, MultiIPRouterTrunk, PerceiverCrossAttention,
                     RouterNorms)

import flax.linen as nn

Params = Dict[str, Any]


def _tree_at(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


@dataclasses.dataclass(frozen=True)
class DiT:
    """Template bundle: stateless module instances + pure init/apply."""
    cfg: DiTConfig
    router_cfg: RouterConfig
    audio_cfg: AudioConfig
    lfe_cfg: LFEConfig

    @classmethod
    def create(cls, cfg: DiTConfig,
               router_cfg: Optional[RouterConfig] = None,
               audio_cfg: Optional[AudioConfig] = None,
               lfe_cfg: Optional[LFEConfig] = None) -> "DiT":
        if router_cfg is None:
            # contract: q_k_dim == perceiver heads*dim_head == LFE output dim;
            # num_id_token == the perceiver's kv token count (LFE queries)
            router_cfg = RouterConfig(num_layers=cfg.num_ca,
                                      q_k_dim=cfg.lfe_final_output_dim,
                                      num_id_token=cfg.lfe_num_tokens)
        if audio_cfg is None:
            audio_cfg = AudioConfig(
                dim=cfg.inner_dim,
                num_attention_heads=cfg.num_attention_heads,
                attention_head_dim=cfg.attention_head_dim,
                num_layers=cfg.num_layers // cfg.audio_attn_interval,
                norm_eps=cfg.norm_eps)
        if lfe_cfg is None:
            lfe_cfg = LFEConfig(num_queries=cfg.lfe_num_tokens,
                                output_dim=cfg.lfe_final_output_dim)
        return cls(cfg, router_cfg, audio_cfg, lfe_cfg)

    @classmethod
    def tiny(cls, **overrides) -> "DiT":
        """Small end-to-end-testable DiT (SURVEY.md §4 test plan)."""
        from ..config import tiny_dit_config
        cfg = tiny_dit_config(**overrides)
        router_cfg = RouterConfig(
            num_layers=cfg.num_ca, q_k_dim=cfg.lfe_final_output_dim,
            num_id_token=cfg.lfe_num_tokens, num_heads=4, attn_heads=4,
            num_attention_layers=2)
        audio_cfg = AudioConfig(
            dim=cfg.inner_dim, audio_dim=16, blocks=2, intermediate_dim=16,
            context_tokens=4, num_attention_heads=cfg.num_attention_heads,
            attention_head_dim=cfg.attention_head_dim,
            num_layers=cfg.num_layers // cfg.audio_attn_interval)
        lfe_cfg = LFEConfig(
            dim=32, depth=5, dim_head=8, heads=4, num_id_token=2,
            num_queries=cfg.lfe_num_tokens, output_dim=cfg.lfe_final_output_dim,
            id_embed_dim=24, vit_dim=16)
        return cls(cfg, router_cfg, audio_cfg, lfe_cfg)

    # ------------------------------------------------------------------ #
    # module templates
    # ------------------------------------------------------------------ #
    def _modules(self):
        c = self.cfg
        kw = dict(dtype=c.dtype, param_dtype=c.param_dtype)
        return dict(
            patch_embed=PatchEmbed(c.inner_dim, **kw),
            time_embedding=TimestepEmbedding(c.time_embed_dim, **kw),
            block=CogVideoXBlock(
                dim=c.inner_dim, heads=c.num_attention_heads,
                head_dim=c.attention_head_dim, time_embed_dim=c.time_embed_dim,
                eps=c.norm_eps, ff_mult=c.ff_mult, ff_chunks=c.ff_chunks,
                qk_norm=c.qk_norm,
                attention_bias=c.attention_bias, use_flash=c.use_flash_attention,
                fuse_qk_norm=c.fuse_qk_norm,
                lora_rank=c.lora_rank, lora_alpha=c.lora_alpha, **kw),
            norm_final=LayerNorm(eps=c.norm_eps, param_dtype=c.param_dtype),
            norm_out=AdaLayerNorm(c.inner_dim, eps=c.norm_eps, **kw),
            proj_out=nn.Dense(c.patch_size * c.patch_size * c.out_channels, **kw),
            lfe=LocalFacialExtractor(self.lfe_cfg, **kw),
            perceiver=PerceiverCrossAttention(
                dim=c.inner_dim,
                dim_head=self.router_cfg.q_k_dim // self.router_cfg.num_heads,
                heads=self.router_cfg.num_heads,
                kv_dim=c.lfe_final_output_dim, **kw),
            # apply() variants returning pre-out features: the routing
            # combine happens BEFORE the output projection (linear => exact),
            # halving the out-proj FLOPs and skipping [B,I,S,dim] HBM tensors
            perceiver_pre=PerceiverCrossAttention(
                dim=c.inner_dim,
                dim_head=self.router_cfg.q_k_dim // self.router_cfg.num_heads,
                heads=self.router_cfg.num_heads,
                kv_dim=c.lfe_final_output_dim, return_pre_out=True, **kw),
            audio_layer_pre=AudioCrossAttnLayer(self.audio_cfg,
                                                return_pre_out=True, **kw),
            router_norms=RouterNorms(q_k_dim=self.router_cfg.q_k_dim,
                                     param_dtype=c.param_dtype),
            router_layer=MultiIPRouterLayerProj(q_k_dim=self.router_cfg.q_k_dim, **kw),
            # fuse_qk_norm marks the DiT as inference-configured (pipeline
            # .create sets it): the trunk's spatial attention then takes the
            # no-vjp transposed-PV flash path too
            router_trunk=MultiIPRouterTrunk(self.router_cfg,
                                            inference_vt=c.fuse_qk_norm, **kw),
            audio_statics=AudioStatics(self.audio_cfg, **kw),
            audio_layer=AudioCrossAttnLayer(self.audio_cfg, **kw),
        )

    # ------------------------------------------------------------------ #
    def init(self, key: jax.Array) -> Params:
        """Initialise all params.  Per-layer modules are vmap-initialised to
        produce leading-axis-stacked param trees (scan xs)."""
        c = self.cfg
        m = self._modules()
        t, hg, wg = c.latent_grid
        # tiny dummy shapes — param shapes are seq-len independent
        s_dummy, l_dummy, b_dummy = 4, 2, 1
        dim = c.inner_dim
        keys = jax.random.split(key, 16)
        dt = c.dtype

        h0 = jnp.zeros((b_dummy, s_dummy, dim), dt)
        e0 = jnp.zeros((b_dummy, l_dummy, dim), dt)
        temb0 = jnp.zeros((b_dummy, c.time_embed_dim), dt)
        rope0 = (jnp.zeros((s_dummy, c.attention_head_dim)),
                 jnp.zeros((s_dummy, c.attention_head_dim)))

        params: Params = {}
        params["patch_embed"] = m["patch_embed"].init(
            keys[0], jnp.zeros((b_dummy, l_dummy, c.text_embed_dim), dt),
            jnp.zeros((b_dummy, s_dummy, c.in_channels * c.patch_size ** 2), dt))["params"]
        params["time_embedding"] = m["time_embedding"].init(
            keys[1], jnp.zeros((b_dummy, dim), dt))["params"]

        block_keys = jax.random.split(keys[2], c.num_layers)
        params["blocks"] = jax.vmap(
            lambda k: m["block"].init(k, h0, e0, temb0, rope0)["params"])(block_keys)

        params["norm_final"] = m["norm_final"].init(keys[3], h0)["params"]
        params["norm_out"] = m["norm_out"].init(keys[4], h0, temb0)["params"]
        params["proj_out"] = m["proj_out"].init(keys[5], h0)["params"]

        if not c.use_rotary_positional_embeddings:
            pos = get_3d_sincos_pos_embed(
                dim, (hg, wg), t, c.spatial_interpolation_scale,
                c.temporal_interpolation_scale).reshape(1, -1, dim)
            joint = np.zeros((1, c.max_text_seq_length + pos.shape[1], dim), np.float32)
            joint[:, c.max_text_seq_length:] = pos
            params["pos_embedding"] = jnp.asarray(joint)

        if c.is_train_face:
            params["lfe"] = m["lfe"].init(
                keys[6], jnp.zeros((2, self.lfe_cfg.id_embed_dim), dt),
                jnp.zeros((2, self.lfe_cfg.num_scales, 4, self.lfe_cfg.vit_dim), dt))["params"]
            face0 = jnp.zeros((b_dummy, c.num_ids, c.lfe_num_tokens,
                               c.lfe_final_output_dim), dt)
            pc_keys = jax.random.split(keys[7], c.num_ca)
            params["perceiver"] = jax.vmap(
                lambda k: m["perceiver"].init(k, face0, h0)["params"])(pc_keys)

            qk = self.router_cfg.q_k_dim
            qf0 = jnp.zeros((b_dummy, s_dummy, qk), dt)
            # n_tok must be the real token count: trunk feature dim = n_tok*heads
            kf0 = jnp.zeros((b_dummy, c.num_ids, self.router_cfg.num_id_token, qk), dt)
            params["router_norms"] = m["router_norms"].init(keys[8], qf0, kf0)["params"]
            rl_keys = jax.random.split(keys[9], c.num_ca)
            params["router_layers"] = jax.vmap(
                lambda k: m["router_layer"].init(k, qf0, kf0)["params"])(rl_keys)
            # trunk init needs a real (t,h,w) grid matching s
            qt = jnp.zeros((b_dummy, 1 * 2 * 2, qk), dt)
            params["router_trunk"] = m["router_trunk"].init(
                keys[10], qt, kf0, (1, 2, 2))["params"]

        if c.is_train_audio:
            a = self.audio_cfg
            frames_px = 4 * 2 + 1  # tiny: 3 latent frames
            ae0 = jnp.zeros((b_dummy, 2, frames_px + a.window_size - a.window_stride,
                             a.blocks, a.audio_dim), dt)
            params["audio_statics"] = m["audio_statics"].init(
                keys[11], ae0, frames_px)["params"]
            ctx0 = jnp.zeros((b_dummy, c.num_ids, 1, a.context_tokens, a.audio_dim), dt)
            h_frames = jnp.zeros((b_dummy, 1 * 4, dim), dt)
            al_keys = jax.random.split(keys[12], a.num_layers)
            params["audio_layers"] = jax.vmap(
                lambda k: m["audio_layer"].init(k, h_frames, ctx0)["params"])(al_keys)

        return params

    # ------------------------------------------------------------------ #
    def rope(self, height_px: int, width_px: int, latent_frames: int,
             base_height_px: int = 480, base_width_px: int = 720,
             vae_spatial: int = 8):
        """Precompute the 3D RoPE tables for a pixel-space resolution
        (reference `pipeline_bindyouravatar.py:585-610`)."""
        c = self.cfg
        gh = height_px // (vae_spatial * c.patch_size)
        gw = width_px // (vae_spatial * c.patch_size)
        base_w = base_width_px // (vae_spatial * c.patch_size)
        base_h = base_height_px // (vae_spatial * c.patch_size)
        crops = get_resize_crop_region_for_grid((gh, gw), base_w, base_h)
        return get_3d_rotary_pos_embed(
            c.attention_head_dim, crops, (gh, gw), latent_frames)

    # ------------------------------------------------------------------ #
    def _face_emb(self, params, id_cond, id_vit_hidden):
        c = self.cfg
        m = self._modules()
        b = id_cond.shape[0]
        n = b * c.num_ids
        face_flat = m["lfe"].apply(
            {"params": params["lfe"]},
            id_cond.reshape(n, -1).astype(c.dtype),
            id_vit_hidden.reshape((n,) + id_vit_hidden.shape[2:]).astype(c.dtype))
        return face_flat.reshape(b, c.num_ids, c.lfe_num_tokens, -1)

    def _audio_ctx(self, params, audio_embeds, mute_embeds, num_pixel_frames,
                   deterministic, rngs):
        c = self.cfg
        m = self._modules()
        a_rngs = None if rngs is None else {"dropout": rngs["dropout"]}
        return m["audio_statics"].apply(
            {"params": params["audio_statics"]}, audio_embeds.astype(c.dtype),
            num_pixel_frames, mute_embeds, deterministic, rngs=a_rngs)

    def prepare_conditioning(
        self,
        params: Params,
        *,
        id_cond: Optional[jnp.ndarray] = None,        # [B, I, 1280]
        id_vit_hidden: Optional[jnp.ndarray] = None,  # [B, I, 5, 577, 1024]
        audio_embeds: Optional[jnp.ndarray] = None,   # [B, tracks, A, 12, 768]
        mute_embeds: Optional[jnp.ndarray] = None,    # [A, 12, 768]
        num_pixel_frames: Optional[int] = None,
        deterministic: bool = True,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Precompute (face_emb [B,I,32,2048], audio_ctx [B,I,F,32,768]).

        These depend only on the conditioning inputs — not on latents or the
        timestep — so callers compute them ONCE per clip and pass them to
        `apply` for every denoise step.  (The reference recomputes the LFE
        and the audio window projection inside every forward,
        `transformer.py:635-676` — 50 steps x CFG 2 of redundant work, and
        the 1.2B-param audio downsample conv has to stay HBM-resident.)
        """
        c = self.cfg
        face_emb = None
        if c.is_train_face and id_cond is not None:
            face_emb = self._face_emb(params, id_cond, id_vit_hidden)
        audio_ctx = None
        if c.is_train_audio and audio_embeds is not None:
            if num_pixel_frames is None:
                num_pixel_frames = c.sample_frames
            audio_ctx = self._audio_ctx(params, audio_embeds, mute_embeds,
                                        num_pixel_frames, deterministic, rngs)
        return face_emb, audio_ctx

    # ------------------------------------------------------------------ #
    def apply(
        self,
        params: Params,
        latents: jnp.ndarray,                 # [B, T, C_in, H, W]
        text_embeds: jnp.ndarray,             # [B, L, text_dim]
        timesteps: jnp.ndarray,               # [B]
        rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        *,
        id_cond: Optional[jnp.ndarray] = None,        # [B, I, 1280]
        id_vit_hidden: Optional[jnp.ndarray] = None,  # [B, I, 5, 577, 1024]
        audio_embeds: Optional[jnp.ndarray] = None,   # [B, tracks, A, 12, 768]
        mute_embeds: Optional[jnp.ndarray] = None,    # [A, 12, 768]
        af_matrix: Optional[jnp.ndarray] = None,      # [B, I, I]
        routing_override: Optional[jnp.ndarray] = None,  # [B, S, I]
        num_pixel_frames: Optional[int] = None,
        deterministic: bool = True,
        rngs: Optional[Dict[str, jax.Array]] = None,
        face_emb: Optional[jnp.ndarray] = None,       # [B, I, 32, 2048] precomputed
        audio_ctx: Optional[jnp.ndarray] = None,      # [B, I, F, 32, 768] precomputed
        sp_mesh=None,   # jax Mesh with an "sp" axis: ring-attention sequence
                        # parallelism for >49-frame generation (superset)
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """One denoise step.  Returns (output [B,T,C_out,H,W],
        routing_logits [num_ca, B, S, I] or None)."""
        c = self.cfg
        m = self._modules()
        b, t, _, h_px, w_px = latents.shape
        grid = (t, h_px // c.patch_size, w_px // c.patch_size)
        s = grid[0] * grid[1] * grid[2]
        text_len = text_embeds.shape[1]
        if num_pixel_frames is None:
            num_pixel_frames = (t - 1) * c.temporal_compression_ratio + 1

        # 1. time embedding
        t_freq = timestep_embedding(timesteps, c.inner_dim, c.flip_sin_to_cos,
                                    c.freq_shift)
        temb = m["time_embedding"].apply(
            {"params": params["time_embedding"]}, t_freq.astype(c.dtype))

        # 2. patch embed + text proj
        tokens = patchify(latents, c.patch_size).astype(c.dtype)
        x = m["patch_embed"].apply({"params": params["patch_embed"]},
                                   text_embeds.astype(c.dtype), tokens)
        if not c.use_rotary_positional_embeddings:
            pe = params["pos_embedding"][:, : text_len + s]
            x = x + pe.astype(x.dtype)
        enc, hid = x[:, :text_len], x[:, text_len:]

        # 3. conditioning prep (unless precomputed via `prepare_conditioning`)
        if face_emb is None and c.is_train_face and id_cond is not None:
            face_emb = self._face_emb(params, id_cond, id_vit_hidden)
        if audio_ctx is None and c.is_train_audio and audio_embeds is not None:
            audio_ctx = self._audio_ctx(params, audio_embeds, mute_embeds,
                                        num_pixel_frames, deterministic, rngs)
        if audio_ctx is not None and af_matrix is None:
            af_matrix = jnp.eye(c.num_ids, dtype=c.dtype)[None].repeat(b, 0)

        # 4. scan over layer groups
        g = c.group_size
        n_groups = c.num_layers // g
        faces_per_group = g // c.cross_attn_interval if c.is_train_face else 0
        audio_per_group = g // c.audio_attn_interval if c.is_train_audio else 0

        xs = {"blocks": jax.tree.map(
            lambda p: p.reshape((n_groups, g) + p.shape[1:]), params["blocks"])}
        if c.is_train_face and face_emb is not None:
            xs["perceiver"] = jax.tree.map(
                lambda p: p.reshape((n_groups, faces_per_group) + p.shape[1:]),
                params["perceiver"])
            xs["router_layers"] = jax.tree.map(
                lambda p: p.reshape((n_groups, faces_per_group) + p.shape[1:]),
                params["router_layers"])
        if c.is_train_audio and audio_ctx is not None:
            xs["audio_layers"] = jax.tree.map(
                lambda p: p.reshape((n_groups, audio_per_group) + p.shape[1:]),
                params["audio_layers"])

        def block_apply(bp, hid_, enc_):
            return m["block"].apply({"params": bp}, hid_, enc_, temb, rope,
                                    sp_mesh)

        if c.remat and c.remat_policy == "nested":
            # second remat level: each BLOCK inside the (remat'd) group is
            # itself remat'd, so the group's backward recomputes one layer
            # at a time — without this, every layer-in-group's bf16
            # [S, 4*dim] FF temps (416 MB each at flagship geometry) are
            # live simultaneously during the group backward (the round-3
            # single-chip depth limiter).  Cost: one extra block forward
            # per block during backward.
            block_apply = jax.checkpoint(block_apply)

        def group_body(carry, group_xs):
            hid_, enc_, last_routing = carry
            preds = []
            for j in range(g):
                hid_, enc_ = block_apply(
                    _tree_at(group_xs["blocks"], j), hid_, enc_)

                if c.is_train_face and face_emb is not None and j % c.cross_attn_interval == 0:
                    pj = j // c.cross_attn_interval
                    pparams = _tree_at(group_xs["perceiver"], pj)
                    # id_pre [B,I,H,S,dh] (kernel layout); q/k flats feed the
                    # router in their natural h-major packing (no transposes)
                    id_pre, q_flat, k_flat = m["perceiver_pre"].apply(
                        {"params": pparams}, face_emb, hid_)
                    qn, kn = m["router_norms"].apply(
                        {"params": params["router_norms"]}, q_flat, k_flat)
                    qp, kp = m["router_layer"].apply(
                        {"params": _tree_at(group_xs["router_layers"], pj)}, qn, kn)
                    pred = m["router_trunk"].apply(
                        {"params": params["router_trunk"]}, qp, kp, grid)  # [B,S,I]
                    preds.append(pred)
                    used = pred if routing_override is None else routing_override
                    used = used.astype(c.dtype)
                    # routing combine BEFORE to_out (no bias), then project
                    # once straight from the head-major layout
                    pre = jnp.einsum("bsi,bihsd->bhsd", used, id_pre)
                    r = m["perceiver"].heads, m["perceiver"].dim_head
                    wk = pparams["to_out"]["kernel"].astype(c.dtype).reshape(
                        r[0], r[1], c.inner_dim)
                    inject = jnp.einsum("bhsd,hdo->bso", pre, wk)
                    hid_ = hid_ + c.local_face_scale * inject
                    last_routing = used

                if (c.is_train_audio and audio_ctx is not None
                        and j % c.audio_attn_interval == 0):
                    aj = j // c.audio_attn_interval
                    aparams = _tree_at(group_xs["audio_layers"], aj)
                    av = jnp.einsum("bij,bsj->bsi",
                                    af_matrix.astype(c.dtype), last_routing)
                    # swap-and-invert (reference `transformer.py:899-900`);
                    # attention + identity combine + out-proj (bias scaled by
                    # sum_i(inv)) all fused in the short-KV kernel
                    inv = 1.0 - av[..., ::-1]
                    hid_ = hid_ + m["audio_layer"].apply(
                        {"params": aparams}, hid_, audio_ctx, weights=inv)

            ys = jnp.stack(preds) if preds else None
            return (hid_, enc_, last_routing), ys

        if c.remat:
            policy = None
            if c.remat_policy == "save_attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out")
            group_body = jax.checkpoint(group_body, policy=policy)

        # uniform routing when audio runs with no face path (superset
        # behavior; the reference crashes in that configuration)
        init_routing = jnp.full((b, s, c.num_ids), 0.5, c.dtype)
        (hid, enc, _), routing_ys = jax.lax.scan(
            group_body, (hid, enc, init_routing), xs)

        routing_logits = None
        if routing_ys is not None:
            routing_logits = routing_ys.reshape((c.num_ca,) + routing_ys.shape[2:])

        # 5. final norm + adaLN head
        if c.use_rotary_positional_embeddings:
            joint = jnp.concatenate([enc, hid], axis=1)
            joint = m["norm_final"].apply({"params": params["norm_final"]}, joint)
            hid = joint[:, text_len:]
        else:
            hid = m["norm_final"].apply({"params": params["norm_final"]}, hid)
        hid = m["norm_out"].apply({"params": params["norm_out"]}, hid, temb)
        hid = m["proj_out"].apply({"params": params["proj_out"]}, hid)

        out = unpatchify(hid, grid, c.out_channels, c.patch_size)
        return out.astype(jnp.float32), routing_logits
