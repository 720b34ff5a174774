"""Training system tests: losses, partitioning, sharded train step on the
8-device CPU mesh (the multi-chip stand-in, SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.config import SchedulerConfig, TrainConfig
from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.ops.scheduler import Schedule
from bindyouravatar_tpu.parallel.mesh import create_mesh
from bindyouravatar_tpu.parallel.sharding import param_specs, shard_bytes
from bindyouravatar_tpu.training import losses as L
from bindyouravatar_tpu.training.trainer import (DEFAULT_TRAINABLE_PATTERNS,
                                                 Trainer, merge_params,
                                                 partition_params)


# ------------------------------------------------------------------ losses
def test_bce_matches_manual():
    p = jnp.array([0.2, 0.8])
    t = jnp.array([0.0, 1.0])
    out = np.asarray(L.bce(p, t))
    np.testing.assert_allclose(out, [-np.log(0.8), -np.log(0.8)], rtol=1e-5)


def test_routing_bce_perfect_prediction_low():
    teacher = (jax.random.uniform(jax.random.key(0), (2, 24, 2)) > 0.5).astype(jnp.float32)
    logits = jnp.broadcast_to(teacher[None], (3,) + teacher.shape)
    good = L.routing_bce_loss(logits, teacher)
    bad = L.routing_bce_loss(1.0 - logits, teacher)
    assert float(good) < float(bad)


def test_consistency_loss_zero_for_identical_layers():
    r = jax.random.uniform(jax.random.key(0), (1, 2, 24, 2))
    stacked = jnp.broadcast_to(r, (4, 2, 24, 2))
    assert float(L.consistency_loss(stacked)) < 1e-7
    varied = stacked + jax.random.uniform(jax.random.key(1), (4, 2, 24, 2))
    assert float(L.consistency_loss(varied)) > 1e-3


def test_smoothness_losses_prefer_constant_masks():
    grid = (2, 4, 6)
    s = 2 * 4 * 6
    const = jnp.ones((3, 1, s, 2)) * 0.5
    noisy = jax.random.uniform(jax.random.key(0), (3, 1, s, 2))
    for fn in (L.temporal_diff_loss, L.spatial_diff_loss):
        assert float(fn(const, grid)) < 1e-5
        assert float(fn(noisy, grid)) > 0.01


def test_distribution_losses_left_right_semantics():
    """Canonical mode: a mask split left/right scores lower than one with
    both ids everywhere."""
    grid = (2, 4, 7)   # W=7 -> halves of 3
    t, h, w = grid
    good = np.zeros((1, 1, t, h, w, 2), np.float32)
    good[..., :3, 0] = 1.0    # id0 left
    good[..., 4:, 1] = 1.0    # id1 right
    good = jnp.asarray(good.reshape(1, 1, t * h * w, 2))
    bad = jnp.ones((1, 1, t * h * w, 2)) * 0.8
    assert float(L.spatial_distribution_loss(good, grid, False)) < \
        float(L.spatial_distribution_loss(bad, grid, False))
    assert float(L.id_distribution_loss(good, grid, False)) < \
        float(L.id_distribution_loss(bad, grid, False))


def test_diffusion_loss_zero_for_perfect_prediction():
    sch = Schedule.create(SchedulerConfig())
    x0 = jax.random.normal(jax.random.key(0), (2, 3, 4, 4, 4))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t = jnp.array([100, 700])
    noisy = sch.add_noise(x0, noise, t)
    v = sch.get_velocity(noise, x0, t)   # the true velocity target
    loss = L.diffusion_loss(v, noisy, x0, t, sch)
    assert float(loss) < 1e-6


# -------------------------------------------------------------- partition
def test_partition_matches_sft_unfreeze_list():
    dit = DiT.tiny(lora_rank=4)
    params = dit.init(jax.random.key(0))
    trainable, frozen = partition_params(params)
    tflat = set()
    import flax.traverse_util as tu

    tflat = set(tu.flatten_dict(trainable, sep="/"))
    assert any("lora_A" in k for k in tflat)
    assert any(k.startswith("router_trunk") for k in tflat)
    assert any(k.startswith("audio_layers") for k in tflat)
    assert "audio_statics/mute_learnable_tokens" in tflat
    fflat = set(tu.flatten_dict(frozen, sep="/"))
    assert any(k.startswith("lfe/") for k in fflat)          # LFE frozen
    assert any(k.startswith("audio_statics/proj") for k in fflat)
    assert not any("lora" in k for k in fflat)
    # base attention kernels frozen
    assert any("attn1/to_q/kernel" in k for k in fflat)
    merged = merge_params(trainable, frozen)
    assert jax.tree.all(jax.tree.map(lambda a, b: a is b, merged, params))


def test_param_specs_skip_stacked_axis():
    dit = DiT.tiny()
    params = dit.init(jax.random.key(0))
    mesh = create_mesh(dp=2, fsdp=4)
    specs = param_specs(params, mesh)
    flatspecs = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))[0]
    for path, spec in flatspecs:
        if getattr(path[0], "key", None) == "blocks" and len(spec) > 0:
            assert spec[0] is None   # never shard the scan axis
    info = shard_bytes(params, mesh)
    assert info["per_device"] <= info["total"]


# ------------------------------------------------------------- train step
@pytest.fixture(scope="module")
def trainer_setup():
    dit = DiT.tiny(lora_rank=4, in_channels=8, out_channels=4)
    sch = Schedule.create(SchedulerConfig())
    cfg = TrainConfig(lr_warmup_steps=2, max_train_steps=10,
                      noised_image_dropout=0.0, index_mask_drop_prob=0.0)
    tr = Trainer(dit=dit, schedule=sch, cfg=cfg)
    params = dit.init(jax.random.key(0))
    return tr, params


def _batch(dit, b=2):
    c = dit.cfg
    t, hg, wg = c.latent_grid
    s = c.video_seq_len
    ks = jax.random.split(jax.random.key(11), 9)
    a = dit.audio_cfg
    n_af = c.sample_frames + a.window_size - a.window_stride
    teacher = (jax.random.uniform(ks[6], (b, s, c.num_ids)) > 0.5).astype(jnp.float32)
    return dict(
        video_latents=jax.random.normal(ks[0], (b, t, 4, c.sample_height, c.sample_width)),
        image_latents=jax.random.normal(ks[1], (b, t, 4, c.sample_height, c.sample_width)),
        prompt_embeds=jax.random.normal(ks[2], (b, c.max_text_seq_length, c.text_embed_dim)),
        id_cond=jax.random.normal(ks[3], (b, c.num_ids, dit.lfe_cfg.id_embed_dim)),
        id_vit_hidden=jax.random.normal(
            ks[4], (b, c.num_ids, dit.lfe_cfg.num_scales, 9, dit.lfe_cfg.vit_dim)),
        audio_embeds=jax.random.normal(ks[5], (b, 2, n_af, a.blocks, a.audio_dim)),
        af_matrix=jnp.eye(c.num_ids)[None].repeat(b, 0),
        teacher_clean=teacher,
        teacher_noisy=jnp.clip(teacher + 0.1 * jax.random.normal(ks[7], teacher.shape), 0, 1),
        dense_mask=(jax.random.uniform(ks[8], (b, t, c.sample_height, c.sample_width))
                    > 0.5).astype(jnp.float32),
    )


def test_train_step_decreases_router_loss(trainer_setup):
    tr, params = trainer_setup
    state, frozen = tr.init_state(params)
    batch = _batch(tr.dit)
    step = jax.jit(tr.train_step, donate_argnums=(0,))
    m0 = None
    for i in range(3):
        state, m = step(state, frozen, batch, jax.random.key(5))
        if m0 is None:
            m0 = m
    assert int(state.step) == 3
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # same rng/batch: optimisation should reduce the (deterministic) loss
    assert float(m["loss"]) < float(m0["loss"])


def test_train_step_sharded_on_mesh(trainer_setup):
    """Full FSDP train step on the virtual 8-device mesh."""
    tr, _ = trainer_setup
    # fresh params: the previous test's donated step consumed the shared
    # buffers (donation invalidates them — standard JAX semantics)
    params = tr.dit.init(jax.random.key(0))
    mesh = create_mesh(dp=2, fsdp=4)
    state, frozen = tr.init_state(params, mesh=mesh)
    batch = tr.place_batch(_batch(tr.dit, b=8), mesh)
    step = tr.jit_train_step()
    state, m = step(state, frozen, batch, jax.random.key(5))
    assert np.isfinite(float(m["loss"]))
    # params sharded over fsdp stay sharded after the update
    some = state.params["router_trunk"]
    leaf = jax.tree.leaves(some)[0]
    assert len(leaf.sharding.device_set) in (1, 4, 8)
    state, m2 = step(state, frozen, batch, jax.random.key(6))
    assert np.isfinite(float(m2["loss"]))


def test_diff_lr_groups():
    """Two-group LR (reference train.py:756-762): perceiver updates move
    ~100x more than other groups under the same gradient scale."""
    import dataclasses

    from bindyouravatar_tpu.config import TrainConfig
    from bindyouravatar_tpu.training.trainer import make_optimizer, partition_params
    from bindyouravatar_tpu.models.dit import DiT
    import optax

    dit = DiT.tiny(lora_rank=2)
    params = dit.init(jax.random.key(0))
    trainable, _ = partition_params(params)
    cfg = TrainConfig(is_diff_lr=True, lr_scheduler="constant",
                      learning_rate=1e-3, optimizer="adamw")
    tx = make_optimizer(cfg)
    opt_state = tx.init(trainable)
    grads = jax.tree.map(jnp.ones_like, trainable)
    updates, _ = tx.update(grads, opt_state, trainable)
    up_high = float(jnp.abs(jax.tree.leaves(updates["perceiver"])[0]).mean())
    up_low = float(jnp.abs(jax.tree.leaves(updates["router_trunk"])[0]).mean())
    assert up_high > 50 * up_low


def test_lr_override_on_resume():
    """Reference train.py:909-921: resuming applies the CLI learning_rate to
    the restored optimizer (param_groups['lr'] + scheduler base_lrs are
    overwritten) while the moments/counters continue.  Our LR is a cfg
    schedule closed over by a fresh `make_optimizer`, never part of
    opt_state — so updates from the SAME restored state must scale exactly
    with the new configured LR."""
    import dataclasses

    from bindyouravatar_tpu.training.trainer import make_optimizer, partition_params

    dit = DiT.tiny(lora_rank=2)
    trainable, _ = partition_params(dit.init(jax.random.key(0)))
    cfg_a = TrainConfig(learning_rate=1e-5, lr_scheduler="constant",
                        optimizer="adamw", lr_warmup_steps=0)
    tx_a = make_optimizer(cfg_a)
    state = tx_a.init(trainable)        # "checkpointed" optimizer state
    grads = jax.tree.map(jnp.ones_like, trainable)
    # a couple of pre-resume steps so moments are non-trivial
    for _ in range(2):
        up, state = tx_a.update(grads, state, trainable)

    cfg_b = dataclasses.replace(cfg_a, learning_rate=1e-4)   # resume w/ new LR
    up_a, _ = tx_a.update(grads, state, trainable)
    up_b, _ = make_optimizer(cfg_b).update(grads, state, trainable)
    for a, b in zip(jax.tree.leaves(up_a), jax.tree.leaves(up_b)):
        np.testing.assert_allclose(np.asarray(b), 10.0 * np.asarray(a),
                                   rtol=1e-5)


def test_text_drop_ratio():
    """Text-prompt dropout (reference dataloader.py:995-996): off by
    default, empties the caption at the configured rate."""
    from bindyouravatar_tpu.training.data import maybe_drop_text

    class FixedRng:
        def __init__(self, v):
            self.v = v

        def random(self):
            return self.v

    assert maybe_drop_text("cap", 0.0, FixedRng(0.0)) == "cap"   # default off
    assert maybe_drop_text("cap", 0.3, FixedRng(0.29)) == ""
    assert maybe_drop_text("cap", 0.3, FixedRng(0.31)) == "cap"
    # dataset wiring: the field exists on both on-disk dataset classes
    import dataclasses as dc

    from bindyouravatar_tpu.training.data import (AvatarVideoDataset,
                                                  ReferenceLayoutDataset)
    for cls in (AvatarVideoDataset, ReferenceLayoutDataset):
        assert any(f.name == "text_drop_ratio" and f.default == 0.0
                   for f in dc.fields(cls))


def test_adafactor_option():
    from bindyouravatar_tpu.config import TrainConfig
    from bindyouravatar_tpu.training.trainer import make_optimizer

    tx = make_optimizer(TrainConfig(optimizer="adafactor", lr_scheduler="constant"))
    p = {"w": jnp.ones((4, 4))}
    s = tx.init(p)
    u, _ = tx.update(jax.tree.map(jnp.ones_like, p), s, p)
    assert np.all(np.isfinite(np.asarray(u["w"])))


def test_grad_accum_equals_mean_of_microbatch_grads(trainer_setup):
    """grad_accum_steps=2 over a [2b] batch == mean of the two half-batch
    gradients computed with the same per-micro rngs (reference trains with
    accelerator.accumulate, accum 2 — sft.sh, train.py:1116)."""
    import dataclasses

    tr, _ = trainer_setup
    from bindyouravatar_tpu.training.trainer import partition_params

    # fresh params: earlier tests donate the fixture's buffers
    trainable, frozen = partition_params(tr.dit.init(jax.random.key(0)))
    batch = _batch(tr.dit, b=2)
    rng = jax.random.key(3)

    tr2 = dataclasses.replace(tr, cfg=dataclasses.replace(tr.cfg, grad_accum_steps=2))
    tr1 = dataclasses.replace(tr, cfg=dataclasses.replace(tr.cfg, grad_accum_steps=1))

    g2, m2 = jax.jit(tr2._grads_and_metrics)(trainable, frozen, batch, rng)

    rs = jax.random.split(rng, 2)
    halves = [jax.tree.map(lambda x, i=i: x[i:i + 1], batch) for i in range(2)]
    g1a, m1a = jax.jit(tr1._grads_and_metrics)(trainable, frozen, halves[0], rs[0])
    g1b, m1b = jax.jit(tr1._grads_and_metrics)(trainable, frozen, halves[1], rs[1])
    expect = jax.tree.map(lambda a, b: (a + b) / 2, g1a, g1b)

    flat_got = jax.tree.leaves(g2)
    flat_want = jax.tree.leaves(expect)
    for got, want in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m2["loss"]),
                               (float(m1a["loss"]) + float(m1b["loss"])) / 2,
                               rtol=1e-5)


def test_grad_accum_rejects_indivisible_batch(trainer_setup):
    import dataclasses

    tr, _ = trainer_setup
    from bindyouravatar_tpu.training.trainer import partition_params

    trainable, frozen = partition_params(tr.dit.init(jax.random.key(0)))
    tr3 = dataclasses.replace(tr, cfg=dataclasses.replace(tr.cfg, grad_accum_steps=3))
    with pytest.raises(ValueError, match="not divisible"):
        tr3._grads_and_metrics(trainable, frozen, _batch(tr.dit, b=2),
                               jax.random.key(0))
