"""BindYourAvatar inference pipeline — fully on-device denoise loop.

Re-architecture of reference `BindyouravatarPipeline.__call__`
(`models/pipeline_bindyouravatar.py:624-980`): the 50-step DPM++/CFG loop is
ONE jitted `lax.scan` (CFG as a leading batch axis of 2, exactly the
reference's `cat([latents]*2)` but compiled once), conditioning tensors are
CFG-doubled up front (reference `:877-884`, `cfg_id_*` helpers
`models/utils.py:630-657`), and the scheduler's two-sample recursion is the
scan carry.  Text encode and VAE encode/decode run as separate jitted
stages (the reference offloads modules between them — on TPU we simply
don't keep duplicates).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, SchedulerConfig
from ..models.dit import DiT
from ..models.vae import CausalVAE
from ..ops.scheduler import Schedule


def cfg_double(x: Optional[jnp.ndarray], zero_uncond: bool) -> Optional[jnp.ndarray]:
    """[B, ...] -> [2B, ...]: uncond half first (zeros if `zero_uncond`)."""
    if x is None:
        return None
    un = jnp.zeros_like(x) if zero_uncond else x
    return jnp.concatenate([un, x], axis=0)


def temporal_or_routing(routing: jnp.ndarray, grid: Tuple[int, int, int]) -> jnp.ndarray:
    """Forced/teacher masks are OR-reduced over time then repeated
    (reference `transformer.py:747-749, 815-818`).  routing: [B, S, I]."""
    t, h, w = grid
    b, s, i = routing.shape
    r = routing.reshape(b, t, h, w, i)
    r = jnp.max(r, axis=1, keepdims=True)
    return jnp.broadcast_to(r, (b, t, h, w, i)).reshape(b, s, i)


@dataclasses.dataclass(frozen=True)
class BindYourAvatarPipeline:
    dit: DiT
    vae: CausalVAE
    schedule: Schedule
    cfg: PipelineConfig = PipelineConfig()
    # jax Mesh with an "sp" axis: ring-attention sequence parallelism in the
    # DiT for >49-frame generation (superset; reference hard-caps 49 frames)
    sp_mesh: Any = None
    # compiled denoise loops keyed by (steps, guidance); jax.jit's own cache
    # handles shape/structure changes under each key.  Without this every
    # `denoise` call re-wraps `jax.jit(run_loop)` and recompiles the full
    # 42-layer graph (4-7 min) — the reference reuses one module across the
    # 50-step loop and across batch samples (`tools/batch_run_samples.py`).
    _loop_cache: Dict[Any, Any] = dataclasses.field(
        default_factory=dict, compare=False, repr=False)

    @classmethod
    def create(cls, dit: DiT, vae: CausalVAE,
               cfg: PipelineConfig = PipelineConfig(),
               sched_cfg: SchedulerConfig = SchedulerConfig()) -> "BindYourAvatarPipeline":
        # the pipeline only ever FORWARDS the DiT (denoise loop, validation),
        # so enable the flat fused-QK-LN flash path (inference-only — it has
        # no VJP; the param tree is identical, see `_Affine`).  Without this
        # the loop takes the bshd branch: out-of-kernel QK-LN converts +
        # [B,S,H,D] layout slices, chip-measured +0.42 s/step on the 42L
        # loop (runs/chip_r4/e2e_prof.log: to_v at 55 GB/s vs 113).
        if dit.cfg.qk_norm and not dit.cfg.fuse_qk_norm:
            dit = dataclasses.replace(
                dit, cfg=dataclasses.replace(dit.cfg, fuse_qk_norm=True))
        return cls(dit=dit, vae=vae, schedule=Schedule.create(sched_cfg), cfg=cfg)

    # ------------------------------------------------------------------ #
    def prepare_image_latents(self, vae_params, image: jnp.ndarray,
                              latent_frames: int,
                              kps_image: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Encode the conditioning image (+ optional rendered-keypoint frame,
        the `is_kps` path) and zero-pad to `latent_frames`
        (reference `prepare_latents`, pipeline:376-458)."""
        lat = self.vae.encode(vae_params, image)          # [B,1,C,h,w]
        parts = [lat]
        if kps_image is not None:
            parts.append(self.vae.encode(vae_params, kps_image))
        used = sum(p.shape[1] for p in parts)
        pad = jnp.zeros((lat.shape[0], latent_frames - used) + lat.shape[2:],
                        lat.dtype)
        return jnp.concatenate(parts + [pad], axis=1)

    # ------------------------------------------------------------------ #
    def denoise(
        self,
        dit_params,
        prompt_embeds: jnp.ndarray,          # [2B, L, text_dim] (CFG-doubled)
        image_latents: jnp.ndarray,          # [B, T, C, h, w]
        key: jax.Array,
        *,
        bg_latents: Optional[jnp.ndarray] = None,
        id_cond: Optional[jnp.ndarray] = None,          # [B, I, 1280]
        id_vit_hidden: Optional[jnp.ndarray] = None,    # [B, I, 5, 577, 1024]
        audio_embeds: Optional[jnp.ndarray] = None,     # [B, tracks, A, 12, 768]
        mute_embeds: Optional[jnp.ndarray] = None,
        af_matrix: Optional[jnp.ndarray] = None,        # [B, I, I]
        routing_forcing: Optional[jnp.ndarray] = None,  # [B, S, I] (stage 2)
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        latents: Optional[jnp.ndarray] = None,
        return_routing: bool = False,
    ) -> jnp.ndarray:
        """Run the full CFG denoise loop; returns final latents [B,T,C,h,w].

        With `return_routing` (the `--draw_routing_logits` debug surface,
        reference `util/utils.py:771-784`), returns (latents, routing) where
        routing is [steps, num_ca, B, S, I] bf16 from the cond CFG half (None
        when the face/router path is off)."""
        steps = num_inference_steps or self.cfg.num_inference_steps
        guidance = (guidance_scale if guidance_scale is not None
                    else self.cfg.guidance_scale)
        args = self.prepare_denoise_inputs(
            dit_params, prompt_embeds, image_latents, key, steps,
            bg_latents=bg_latents, id_cond=id_cond,
            id_vit_hidden=id_vit_hidden, audio_embeds=audio_embeds,
            mute_embeds=mute_embeds, af_matrix=af_matrix,
            routing_forcing=routing_forcing, latents=latents)
        run_loop = self._jitted_loop(steps, float(guidance),
                                     return_routing=return_routing)
        out = run_loop(dit_params, *args)
        return out if return_routing else out[0]

    def prepare_denoise_inputs(self, dit_params, prompt_embeds, image_latents,
                               key, steps, *, bg_latents=None, id_cond=None,
                               id_vit_hidden=None, audio_embeds=None,
                               mute_embeds=None, af_matrix=None,
                               routing_forcing=None, latents=None):
        """Build the positional args the compiled loop consumes (everything
        after `dit_params`) — CFG doubling, per-clip conditioning precompute,
        RoPE tables, scan xs, init latents."""
        c = self.cfg
        b, t_lat, ch, h_lat, w_lat = image_latents.shape
        zero2cond = c.zero2cond_cfg

        ts = self.schedule.timesteps(steps)                       # [N] descending
        prev_ts = ts - self.schedule.config.num_train_timesteps // steps
        ts_back = np.concatenate([[ts[0]], ts[:-1]])              # prev loop t
        second = np.arange(steps) > 0

        rope = self.dit.rope(h_lat * 8, w_lat * 8, t_lat,
                             base_height_px=c.base_height, base_width_px=c.base_width)

        # CFG doubling of conditioning (reference :877-884 + cfg helpers).
        # Raw inputs are doubled BEFORE the context precompute so the uncond
        # half sees zeroed *inputs* (LFE/audio-proj of zeros != zeros).
        pe = prompt_embeds
        img_lat2 = cfg_double(image_latents, zero2cond)
        bg2 = (jnp.concatenate([bg_latents] * 2, axis=0)
               if bg_latents is not None else None)
        idc2 = cfg_double(id_cond, zero2cond)
        vit2 = cfg_double(id_vit_hidden, zero2cond)
        af2 = cfg_double(af_matrix, zero2cond)
        audio2 = cfg_double(audio_embeds, True) if audio_embeds is not None else None
        force2 = (jnp.concatenate([routing_forcing] * 2, axis=0)
                  if routing_forcing is not None else None)
        if force2 is not None:
            force2 = temporal_or_routing(force2, self.dit.cfg.latent_grid)

        # conditioning context ONCE per clip, outside the 50-step loop
        # (the reference recomputes LFE + the 1.2B-param audio downsample in
        # every forward, `transformer.py:635-676`)
        face2, actx2 = self.jit_prepare_conditioning()(
            dit_params, idc2, vit2, audio2, mute_embeds)
        if actx2 is not None and af2 is None:
            af2 = jnp.eye(self.dit.cfg.num_ids)[None].repeat(2 * b, 0)

        key, k_init = jax.random.split(key)
        if latents is None:
            latents = jax.random.normal(
                k_init, (b, t_lat, ch, h_lat, w_lat), jnp.float32)

        xs = (jnp.asarray(ts), jnp.asarray(prev_ts), jnp.asarray(ts_back),
              jnp.asarray(second))
        return (pe, img_lat2, bg2, face2, actx2, af2, force2, rope, xs,
                latents, key)

    def aot_compile_loop(self, steps: int, guidance: float, param_structs,
                         arg_structs):
        """AOT-compile the denoise loop with AUTO argument layouts (the
        bench.py single-chip recipe: XLA picks the stacked-weight layouts
        and the caller MATERIALISES params directly in them — without this
        the loop inserts ~4 GB of loop-invariant transposed weight copies).

        Returns (compiled, param_formats).  Call as
        `compiled(params, *args)` with params device_put into
        `param_formats` and args built by `prepare_denoise_inputs`."""
        from jax.experimental.layout import Format, Layout

        base = self._jitted_loop(steps, float(guidance))
        # re-wrap the traced callable: AUTO layouts for the params (the
        # stacked weights are where the transposed copies come from), default
        # layouts for the loop tensors (PRNG keys can't take a Format)
        shardings = (Format(Layout.AUTO),) + (None,) * len(arg_structs)
        fn = jax.jit(base.__wrapped__, in_shardings=shardings)
        structs = jax.tree.map(
            lambda x: (jax.ShapeDtypeStruct(x.shape, x.dtype)
                       if hasattr(x, "shape") else x),
            (param_structs,) + tuple(arg_structs))
        compiled = fn.lower(*structs).compile()
        fmts, _ = compiled.input_formats
        return compiled, fmts[0]

    # ------------------------------------------------------------------ #
    def jit_prepare_conditioning(self):
        """Cached jit of `DiT.prepare_conditioning` (None args are static).
        Keyed on the values the closure bakes — instances made via
        dataclasses.replace share the cache dict, so a replaced num_frames
        (the >49-frame sp path) must not reuse a stale prep."""
        key = ("prep", self.cfg.num_frames)
        if key not in self._loop_cache:
            def prep(params_, idc_, vit_, audio_, mute_):
                return self.dit.prepare_conditioning(
                    params_, id_cond=idc_, id_vit_hidden=vit_,
                    audio_embeds=audio_, mute_embeds=mute_,
                    num_pixel_frames=self.cfg.num_frames)
            self._loop_cache[key] = jax.jit(prep)
        return self._loop_cache[key]

    def _jitted_loop(self, steps: int, guidance: float,
                     return_routing: bool = False):
        """Build (or fetch) the compiled CFG denoise loop for a given step
        count + guidance scale.  Everything tensor-valued enters as a jit ARG
        — capturing params as closure consts ships gigabytes through the
        (remote) compiler, and without jit the scan's param-tree reshapes run
        eagerly and copy the 11 GB stacked params (OOM on one chip).

        Always returns (final_latents, routing_ys) — routing_ys is None
        unless `return_routing` (then [steps, num_ca, B, S, I] bf16)."""
        c = self.cfg
        # key includes every config value baked into the closure — instances
        # made via dataclasses.replace(pipe, cfg=...) share the cache dict
        cache_key = (steps, guidance, c.scheduler_type, c.use_dynamic_cfg,
                     c.cfg_microbatch, self.sp_mesh, self.schedule.config,
                     return_routing)
        if cache_key in self._loop_cache:
            return self._loop_cache[cache_key]
        sched = self.schedule
        dit = self.dit

        def step_fn(carry, xs, *, params_, pe_, img_, bg_, face_, actx_,
                    af_, force_, rope_):
            lat, old_pred, k = carry
            t_cur, t_prev, t_bk, so = xs
            k, k_noise = jax.random.split(k)

            b_ = lat.shape[0]

            def fwd(half):
                """One CFG half (0 = uncond, 1 = cond) at batch b."""
                sel = lambda x: (None if x is None
                                 else x[half * b_:(half + 1) * b_])
                chans = [lat, sel(img_)]
                if bg_ is not None:
                    chans.append(sel(bg_))
                model_in = jnp.concatenate(chans, axis=2)
                tvec = jnp.broadcast_to(t_cur.astype(jnp.float32), (b_,))
                pred, routing = dit.apply(
                    params_, model_in, sel(pe_), tvec, rope_,
                    face_emb=sel(face_), audio_ctx=sel(actx_),
                    af_matrix=sel(af_), routing_override=sel(force_),
                    sp_mesh=self.sp_mesh)
                return pred.astype(jnp.float32), routing

            routing_y = None
            if c.cfg_microbatch:
                # two sequential batch-b forwards: same math as the CFG
                # batch-of-2, half the activation HBM (single-chip mode)
                (un, _), (txt, routing_cond) = fwd(0), fwd(1)
                if return_routing and routing_cond is not None:
                    routing_y = routing_cond.astype(jnp.bfloat16)
            else:
                lat_in = jnp.concatenate([lat] * 2, axis=0)
                chans = [lat_in, img_]
                if bg_ is not None:
                    chans.append(bg_)
                model_in = jnp.concatenate(chans, axis=2)
                tvec = jnp.broadcast_to(t_cur.astype(jnp.float32),
                                        (model_in.shape[0],))
                noise_pred, routing2 = dit.apply(
                    params_, model_in, pe_, tvec, rope_,
                    face_emb=face_, audio_ctx=actx_, af_matrix=af_,
                    routing_override=force_, sp_mesh=self.sp_mesh)
                noise_pred = noise_pred.astype(jnp.float32)
                un, txt = jnp.split(noise_pred, 2, axis=0)
                if return_routing and routing2 is not None:
                    routing_y = routing2[:, b_:].astype(jnp.bfloat16)
            if c.use_dynamic_cfg:
                # reference formula verbatim (pipeline:927-930) — note it
                # mixes timestep VALUE with step count, as shipped
                g = 1.0 + guidance * (
                    (1.0 - jnp.cos(jnp.pi * ((steps - t_cur) / steps) ** 5.0)) / 2.0)
            else:
                g = guidance
            guided = un + g * (txt - un)

            if c.scheduler_type == "ddim":
                new_lat = sched.ddim_step(guided, t_cur, t_prev, lat)
                x0 = old_pred    # unused carry in DDIM mode
            else:
                noise = jax.random.normal(k_noise, lat.shape, jnp.float32)
                new_lat, x0 = sched.dpm_step_scan(guided, old_pred, t_cur, t_bk,
                                                  t_prev, lat, so, noise)
            return (new_lat, x0, k), routing_y

        def run_loop(params_, pe_, img_, bg_, face_, actx_, af_, force_,
                     rope_, xs_, latents, key):
            body = functools.partial(
                step_fn, params_=params_, pe_=pe_, img_=img_, bg_=bg_,
                face_=face_, actx_=actx_, af_=af_, force_=force_, rope_=rope_)
            (final, _, _), ys = jax.lax.scan(
                body, (latents, jnp.zeros_like(latents), key), xs_)
            return final, ys

        fn = jax.jit(run_loop)
        self._loop_cache[cache_key] = fn
        return fn

    # ------------------------------------------------------------------ #
    def generate(
        self,
        params: Dict[str, Any],
        prompt_embeds: jnp.ndarray,
        negative_prompt_embeds: jnp.ndarray,
        image: jnp.ndarray,                   # [B,1,3,H,W] conditioning canvas
        key: jax.Array,
        image_bg: Optional[jnp.ndarray] = None,
        decode: bool = True,
        return_routing: bool = False,
        latents: Optional[jnp.ndarray] = None,
        **cond,
    ):
        """End-to-end: prepare latents -> denoise -> decode.

        `params` = {"dit": ..., "vae": ...}.  Conditioning kwargs as in
        `denoise`.  Returns video [B,T,3,H,W] in [-1,1] (or latents);
        with `return_routing`, (video, routing [steps,num_ca,B,S,I]|None).
        """
        c = self.cfg
        t_lat = (c.num_frames - 1) // self.dit.cfg.temporal_compression_ratio + 1
        img_lat = self.prepare_image_latents(params["vae"], image, t_lat)
        bg_lat = None
        if image_bg is not None:
            if self.dit.cfg.in_channels // self.vae.cfg.latent_channels < 3:
                raise ValueError(
                    f"image_bg given but DiT in_channels="
                    f"{self.dit.cfg.in_channels} has no bg latent block "
                    f"(needs >= 3x latent_channels="
                    f"{self.vae.cfg.latent_channels})")
            bg_lat = self.prepare_image_latents(params["vae"], image_bg, t_lat)
        elif self.dit.cfg.in_channels // self.vae.cfg.latent_channels >= 3:
            bg_lat = jnp.zeros_like(img_lat)   # reference `use_inpaint=False`

        pe = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
        out = self.denoise(params["dit"], pe, img_lat, key,
                           bg_latents=bg_lat, return_routing=return_routing,
                           latents=latents, **cond)
        lat, routing = out if return_routing else (out, None)
        video = lat if not decode else self.vae.decode(params["vae"], lat)
        return (video, routing) if return_routing else video
