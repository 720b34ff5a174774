"""Stage-3 trainer: sharded train step, freezing, LoRA, LR schedule.

TPU-native counterpart of reference `train.py:313-1795` (Accelerate +
DeepSpeed ZeRO-2 over NCCL): one jitted `train_step` under a (dp, fsdp)
mesh; gradients only flow through the trainable partition (reference
freeze/unfreeze lists, `train.py:714-746`), optimizer state is sharded like
the params (ZeRO), and the loss is the v-prediction diffusion loss plus the
six weighted routing losses (`train.py:1509-1545`, weights from sft.sh).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.dit import DiT
from ..ops.scheduler import Schedule
from ..parallel.mesh import batch_sharding, create_mesh, replicated
from ..parallel.sharding import param_shardings
from . import losses as L

# Trainable param-path patterns mirroring sft.sh's unfreeze list
# (`--unfreeze_modules audio_model.mute_learnable_tokens
#   perceiver_cross_attention audio_model.layers router`) + LoRA adapters.
DEFAULT_TRAINABLE_PATTERNS = (
    r".*lora_[AB].*",                      # LoRA on attn1 q/k
    r"^perceiver($|/).*",                  # perceiver_cross_attention
    r"^router_norms($|/).*",
    r"^router_layers($|/).*",
    r"^router_trunk($|/).*",
    r"^audio_layers($|/).*",               # audio_model.layers
    r"^audio_statics/mute_learnable_tokens$",
)


def _flat(params):
    import flax.traverse_util as tu

    return tu.flatten_dict(params, sep="/")


def _unflat(flat):
    import flax.traverse_util as tu

    return tu.unflatten_dict(flat, sep="/")


def partition_params(params: Dict[str, Any],
                     patterns=DEFAULT_TRAINABLE_PATTERNS
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split the param tree into (trainable, frozen) by path regex."""
    regs = [re.compile(p) for p in patterns]
    flat = _flat(params)
    train = {k: v for k, v in flat.items() if any(r.match(k) for r in regs)}
    frozen = {k: v for k, v in flat.items() if k not in train}
    return _unflat(train), _unflat(frozen)


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    flat = dict(_flat(frozen))
    flat.update(_flat(trainable))
    return _unflat(flat)


def make_lr_schedule(cfg: TrainConfig):
    if cfg.lr_scheduler == "cosine_with_restarts":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)]
            + [optax.cosine_decay_schedule(
                cfg.learning_rate,
                max(1, (cfg.max_train_steps - cfg.lr_warmup_steps) // cfg.lr_num_cycles))
               for _ in range(cfg.lr_num_cycles)],
            [cfg.lr_warmup_steps
             + i * max(1, (cfg.max_train_steps - cfg.lr_warmup_steps) // cfg.lr_num_cycles)
             for i in range(cfg.lr_num_cycles)])
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(cfg.lr_scheduler)


def _base_opt(cfg: TrainConfig, lr_mult: float = 1.0) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg)
    lr = (lambda c: sched(c) * lr_mult) if lr_mult != 1.0 else sched
    if cfg.optimizer == "adamw":
        if cfg.use_8bit_adam:   # reference train.py:244-279 (bnb AdamW8bit)
            from .adam8bit import adamw8bit
            return adamw8bit(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                             eps=cfg.adam_epsilon,
                             weight_decay=cfg.weight_decay)
        return optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           eps=cfg.adam_epsilon, weight_decay=cfg.weight_decay)
    if cfg.optimizer == "adafactor":   # TPU-native low-memory choice
        return optax.adafactor(lr)
    if cfg.optimizer == "prodigy":     # reference `train.py:281-307`
        from .prodigy import prodigy
        return prodigy(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                       beta3=cfg.prodigy_beta3, eps=cfg.adam_epsilon,
                       weight_decay=cfg.weight_decay,
                       decouple=cfg.prodigy_decouple,
                       use_bias_correction=cfg.prodigy_use_bias_correction,
                       safeguard_warmup=cfg.prodigy_safeguard_warmup)
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    clip = optax.clip_by_global_norm(cfg.max_grad_norm)
    if not cfg.is_diff_lr:
        return optax.chain(clip, _base_opt(cfg))

    # two-group LR (reference `train.py:756-762`): perceiver_cross_attention
    # at lr*high, all other trainables at lr*low
    def label_fn(params):
        flat = _flat(params)
        labels = {k: ("high" if k.startswith("perceiver") else "low")
                  for k in flat}
        return _unflat(labels)

    return optax.chain(clip, optax.multi_transform(
        {"high": _base_opt(cfg, cfg.diff_lr_high),
         "low": _base_opt(cfg, cfg.diff_lr_low)}, label_fn))


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Dict[str, Any]          # trainable partition
    opt_state: Any
    ema_params: Optional[Dict[str, Any]] = None


class _MeshBoundStep:
    """A jitted step whose tracing/lowering runs under `jax.set_mesh(mesh)`
    so spec-only sharding constraints inside the model resolve."""

    def __init__(self, fn, mesh):
        self._fn, self._mesh = fn, mesh

    def __call__(self, *args, **kwargs):
        with jax.set_mesh(self._mesh):
            return self._fn(*args, **kwargs)

    def lower(self, *args, **kwargs):
        with jax.set_mesh(self._mesh):
            return self._fn.lower(*args, **kwargs)


@dataclasses.dataclass(frozen=True)
class Trainer:
    dit: DiT
    schedule: Schedule
    cfg: TrainConfig = TrainConfig()
    trainable_patterns: Tuple[str, ...] = DEFAULT_TRAINABLE_PATTERNS

    def init_state(self, params: Dict[str, Any],
                   mesh=None) -> Tuple[TrainState, Dict[str, Any]]:
        """Partition into (state, frozen).  With a mesh, params are placed
        under the FSDP rules FIRST so `tx.init`'s `zeros_like` inherits the
        sharding — optimizer state lands sharded (ZeRO) with no extra code."""
        trainable, frozen = partition_params(params, self.trainable_patterns)
        if mesh is not None:
            from ..parallel.sharding import shard_params

            trainable = shard_params(trainable, mesh)
            frozen = shard_params(frozen, mesh)
        tx = make_optimizer(self.cfg)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=trainable,
                           opt_state=tx.init(trainable),
                           ema_params=(jax.tree.map(jnp.copy, trainable)
                                       if self.cfg.ema_decay else None))
        return state, frozen

    # ------------------------------------------------------------------ #
    def loss_and_metrics(self, params: Dict[str, Any], batch: Dict[str, Any],
                         rng: jax.Array):
        c = self.cfg
        d = self.dit.cfg
        sch = self.schedule
        video_lat = batch["video_latents"]          # [B,T,C,h,w] clean
        b = video_lat.shape[0]
        grid = (video_lat.shape[1], video_lat.shape[3] // d.patch_size,
                video_lat.shape[4] // d.patch_size)

        (r_t, r_noise, r_dropimg, r_dropbg, r_dropmask, r_maskloss,
         r_dropout) = jax.random.split(rng, 7)

        t = jax.random.randint(r_t, (b,), 0, sch.config.num_train_timesteps)
        noise = jax.random.normal(r_noise, video_lat.shape, jnp.float32)
        noisy = sch.add_noise(video_lat, noise, t)

        # conditioning dropout (reference train.py:1345-1346, 1464-1469)
        img_lat = batch["image_latents"]
        keep = (jax.random.uniform(r_dropimg, (b, 1, 1, 1, 1))
                >= c.noised_image_dropout)
        img_lat = img_lat * keep
        chans = [noisy.astype(video_lat.dtype), img_lat]
        if batch.get("bg_latents") is not None:
            bg = batch["bg_latents"]
            if c.drop_inpaint_prob > 0:
                keep_bg = (jax.random.uniform(r_dropbg, (b, 1, 1, 1, 1))
                           >= c.drop_inpaint_prob)
                bg = bg * keep_bg
            chans.append(bg)
        model_in = jnp.concatenate(chans, axis=2)

        # teacher-forced routing (noisy copy injected; per-sample drop,
        # reference transformer.py:770-772)
        teacher_noisy = batch.get("teacher_noisy")
        if teacher_noisy is not None and c.index_mask_drop_prob > 0:
            keep_m = (jax.random.uniform(r_dropmask, (b, 1, 1))
                      >= c.index_mask_drop_prob)
            teacher_noisy = teacher_noisy * keep_m

        rope = self.dit.rope(video_lat.shape[3] * 8, video_lat.shape[4] * 8,
                             video_lat.shape[1])
        model_out, routing = self.dit.apply(
            params, model_in, batch["prompt_embeds"], t.astype(jnp.float32),
            rope,
            id_cond=batch.get("id_cond"), id_vit_hidden=batch.get("id_vit_hidden"),
            audio_embeds=batch.get("audio_embeds"),
            mute_embeds=batch.get("mute_embeds"),
            af_matrix=batch.get("af_matrix"),
            routing_override=teacher_noisy,
            deterministic=False, rngs={"dropout": r_dropout})

        dense = None
        if c.enable_mask_loss and batch.get("dense_mask") is not None:
            use = jax.random.uniform(r_maskloss, ()) < c.mask_prob
            dense = jnp.where(use, batch["dense_mask"],
                              jnp.ones_like(batch["dense_mask"]))
        d_loss = L.diffusion_loss(model_out, noisy, video_lat, t, sch, dense)

        metrics = {"diffusion_loss": d_loss}
        total = d_loss
        teacher_clean = batch.get("teacher_clean")
        if routing is not None and teacher_clean is not None:
            ct = c.compat_transposed_grid_losses
            r_loss = L.routing_bce_loss(routing, teacher_clean)
            cons = L.consistency_loss(routing)
            tdiff = L.temporal_diff_loss(routing, grid, ct)
            sdiff = L.spatial_diff_loss(routing, grid, ct)
            sdist = L.spatial_distribution_loss(routing, grid, ct)
            idist = L.id_distribution_loss(routing, grid, ct)
            total = (total
                     + c.router_loss_weight * r_loss
                     + c.consistency_loss_weight * cons
                     + c.temporal_diff_loss_weight * tdiff
                     + c.spatial_diff_loss_weight * sdiff
                     + c.spatial_dist_loss_weight * sdist
                     + c.id_dist_loss_weight * idist)
            metrics.update(router_loss=r_loss, consistency_loss=cons,
                           temporal_diff_loss=tdiff, spatial_diff_loss=sdiff,
                           spatial_dist_loss=sdist, id_dist_loss=idist)
        metrics["loss"] = total
        return total, metrics

    # ------------------------------------------------------------------ #
    def _grads_and_metrics(self, params, frozen, batch, rng):
        """Gradients of the total loss, with accumulation over micro-batches.

        Reference trains with `accelerator.accumulate`, accum 2 (`sft.sh`,
        `train.py:1116`): here the incoming batch is the FULL effective batch
        whose leading axis is `grad_accum_steps x micro`, and a `lax.scan`
        over micro-batches accumulates mean gradients inside the jitted step
        (same math, no inter-step optimizer bookkeeping needed)."""
        accum = max(1, int(self.cfg.grad_accum_steps))

        def loss_fn(tp, mb, r):
            return self.loss_and_metrics(merge_params(tp, frozen), mb, r)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum == 1:
            (_, metrics), grads = grad_fn(params, batch, rng)
            return grads, metrics

        statics = {k: v for k, v in batch.items()
                   if v is None or k == "mute_embeds"}

        def split(x):
            if x.shape[0] % accum:
                raise ValueError(
                    f"batch size {x.shape[0]} not divisible by "
                    f"grad_accum_steps={accum}")
            return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

        micro = {k: split(v) for k, v in batch.items() if k not in statics}
        rngs = jax.random.split(rng, accum)

        first = {**jax.tree.map(lambda x: x[0], micro), **statics}
        zero_shapes = jax.eval_shape(grad_fn, params, first, rngs[0])
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), zero_shapes)

        def body(carry, xs):
            mb, r = xs
            out = grad_fn(params, {**mb, **statics}, r)
            return jax.tree.map(jnp.add, carry, out), None

        ((_, m_sum), g_sum), _ = jax.lax.scan(body, zeros, (micro, rngs))
        mean = lambda t: jax.tree.map(lambda x: x / accum, t)
        return mean(g_sum), mean(m_sum)

    def train_step(self, state: TrainState, frozen: Dict[str, Any],
                   batch: Dict[str, Any], rng: jax.Array):
        tx = make_optimizer(self.cfg)
        grads, metrics = self._grads_and_metrics(state.params, frozen, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            dcy = self.cfg.ema_decay
            ema = jax.tree.map(lambda e, p: dcy * e + (1 - dcy) * p, ema, new_params)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt, ema_params=ema), metrics

    # ------------------------------------------------------------------ #
    def jit_train_step(self, mesh=None):
        """Jitted step; shardings propagate from the placed inputs
        (state/frozen placed by `init_state(mesh=...)`, batch by
        `place_batch`).  Donates the state buffers.

        Pass the mesh to trace under `jax.set_mesh` so the model's
        `constrain_batch` cotangent pins activate (kills GSPMD's involuntary
        full rematerialization on dp x fsdp meshes — see
        parallel.mesh.constrain_batch)."""
        step = jax.jit(self.train_step, donate_argnums=(0,))
        if mesh is None:
            return step
        return _MeshBoundStep(step, mesh)

    @staticmethod
    def place_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
        """Shard batch tensors over (dp, fsdp); batch-less fixtures
        (mute_embeds) are replicated."""
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        out = {}
        for k, v in batch.items():
            if v is None:
                out[k] = None
            elif k == "mute_embeds":
                out[k] = jax.device_put(v, rep)
            else:
                out[k] = jax.device_put(v, bsh)
        return out
