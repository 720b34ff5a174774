"""Tensor-parallel inference test: TP-sharded DiT == single-device DiT."""

import jax
import jax.numpy as jnp
import numpy as np

from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.parallel.mesh import create_mesh
from bindyouravatar_tpu.parallel.tp import shard_params_tp, tp_specs


def test_tp_sharded_forward_matches():
    dit = DiT.tiny()
    c = dit.cfg
    params = dit.init(jax.random.key(0))

    t = c.latent_frames
    lat = jax.random.normal(jax.random.key(1),
                            (1, t, c.in_channels, c.sample_height, c.sample_width))
    text = jax.random.normal(jax.random.key(2),
                             (1, c.max_text_seq_length, c.text_embed_dim))
    rope = dit.rope(c.sample_height * 8, c.sample_width * 8, t)
    ts = jnp.array([300.0])
    id_cond = jax.random.normal(jax.random.key(3), (1, c.num_ids, dit.lfe_cfg.id_embed_dim))
    vit = jax.random.normal(jax.random.key(4),
                            (1, c.num_ids, dit.lfe_cfg.num_scales, 9, dit.lfe_cfg.vit_dim))

    ref, _ = dit.apply(params, lat, text, ts, rope, id_cond=id_cond,
                       id_vit_hidden=vit)

    mesh = create_mesh(dp=1, fsdp=1, tp=8)
    specs = tp_specs(params, 8)
    n_sharded = sum(1 for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        if any(a is not None for a in s))
    assert n_sharded > 10, "TP rules matched too few leaves"

    with mesh:
        sharded = shard_params_tp(params, mesh)
        out, _ = jax.jit(lambda p: dit.apply(p, lat, text, ts, rope,
                                             id_cond=id_cond,
                                             id_vit_hidden=vit))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)
