"""Block-wise 8-bit AdamW (training/adam8bit.py) — the TPU counterpart of
the reference's `--use_8bit_adam` -> bnb AdamW8bit path (train.py:244-279).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bindyouravatar_tpu.training.adam8bit import (Adam8bitState, _dequant_m,
                                                  _dequant_v, _quant_m,
                                                  _quant_v, adamw8bit,
                                                  scale_by_adam8bit)


def test_quant_roundtrip_bounds():
    """Linear absmax int8 roundtrip error <= scale/2 per block; sqrt-domain
    v roundtrip relative error small for the dominant entries."""
    k = jax.random.key(0)
    x = jax.random.normal(k, (3, 1024)) * jnp.array([[0.01], [1.0], [100.0]])
    q, s = _quant_m(x, 256)
    assert q.dtype == jnp.int8 and q.shape == x.shape
    back = _dequant_m(q, s, 256)
    # per-block absmax: |err| <= scale/2, scale = blockmax/127
    err = np.abs(np.asarray(back - x))
    bmax = np.abs(np.asarray(x)).reshape(-1, 256).max(1)
    assert (err.reshape(-1, 256).max(1) <= bmax / 127.0 * 0.5 + 1e-12).all()

    v = jnp.square(x)
    qv, sv = _quant_v(v, 256)
    assert qv.dtype == jnp.uint8
    backv = _dequant_v(qv, sv, 256)
    # sqrt-domain: entries near the block max keep ~1% relative error
    vf = np.asarray(v).reshape(-1, 256)
    big = vf > vf.max(1, keepdims=True) * 0.25
    rel = (np.abs(np.asarray(backv - v)).reshape(-1, 256)
           / np.maximum(vf, 1e-30))
    assert rel[big].max() < 0.05


def test_partial_block_and_odd_shapes():
    x = jax.random.normal(jax.random.key(1), (7, 13))    # 91 elems, block 64
    q, s = _quant_m(x, 64)
    assert q.shape == x.shape and s.shape == (2,)
    np.testing.assert_allclose(np.asarray(_dequant_m(q, s, 64)),
                               np.asarray(x), atol=float(s.max()))


def test_adam8bit_tracks_fp32_adam():
    """On a quadratic, 8-bit AdamW's trajectory stays close to fp32 AdamW
    and reaches the same loss basin."""
    key = jax.random.key(2)
    target = jax.random.normal(key, (512,))
    loss_f = lambda p: jnp.sum(jnp.square(p["w"] - target))

    def run(tx, steps=200):
        p = {"w": jnp.zeros((512,))}
        st = tx.init(p)
        for _ in range(steps):
            g = jax.grad(loss_f)(p)
            up, st = tx.update(g, st, p)
            p = optax.apply_updates(p, up)
        return p, float(loss_f(p))

    kw = dict(b1=0.9, b2=0.95, eps=1e-8, weight_decay=1e-4)
    p8, l8 = run(adamw8bit(1e-1, block_size=256, **kw))
    p32, l32 = run(optax.adamw(1e-1, **kw))
    assert np.isfinite(l8)
    # same basin: both should be well below the initial loss and close
    assert l8 < 0.05 * float(jnp.sum(jnp.square(target)))
    np.testing.assert_allclose(np.asarray(p8["w"]), np.asarray(p32["w"]),
                               atol=0.15)


def test_state_is_8bit_and_param_shaped():
    p = {"a": jnp.zeros((300, 5)), "b": jnp.zeros((17,))}
    tx = scale_by_adam8bit(block_size=128)
    st = tx.init(p)
    assert isinstance(st, Adam8bitState)
    assert st.qm["a"].dtype == jnp.int8 and st.qm["a"].shape == (300, 5)
    assert st.qv["b"].dtype == jnp.uint8 and st.qv["b"].shape == (17,)
    assert st.sm["a"].shape == (12,) and st.sv["b"].shape == (1,)
    # one update keeps dtypes quantized (no silent fp32 promotion)
    g = jax.tree.map(jnp.ones_like, p)
    up, st2 = tx.update(g, st, p)
    assert st2.qm["a"].dtype == jnp.int8 and st2.qv["a"].dtype == jnp.uint8
    # bias-corrected first step: update == g / (|g| + eps) ~= 1
    np.testing.assert_allclose(np.asarray(up["a"]), 1.0, atol=1e-4)


def test_trainer_wiring():
    from bindyouravatar_tpu.config import TrainConfig
    from bindyouravatar_tpu.training.trainer import make_optimizer

    tx = make_optimizer(TrainConfig(optimizer="adamw", use_8bit_adam=True,
                                    lr_warmup_steps=1, max_train_steps=4))
    p = {"w": jnp.ones((64,))}
    st = tx.init(p)
    up, _ = tx.update({"w": jnp.full((64,), 0.1)}, st, p)
    assert np.isfinite(np.asarray(up["w"])).all()


def test_sft_flag():
    import scripts.sft as sft

    args = sft.get_args(["--use_8bit_adam"])
    assert args.use_8bit_adam
    assert not sft.get_args([]).use_8bit_adam
