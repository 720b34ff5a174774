"""Unit tests for the ops layer: RoPE, patchify, scheduler, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.config import SchedulerConfig
from bindyouravatar_tpu.ops.attention import sdpa
from bindyouravatar_tpu.ops.flash_attention import flash_attention, _fwd_impl, _chunked_bwd
from bindyouravatar_tpu.ops.patch import patchify, unpatchify
from bindyouravatar_tpu.ops.rope import (apply_rotary_emb, get_3d_rotary_pos_embed,
                                         get_resize_crop_region_for_grid,
                                         timestep_embedding)
from bindyouravatar_tpu.ops.scheduler import Schedule


# --------------------------------------------------------------------- rope
def test_crop_region_identity_for_base_grid():
    assert get_resize_crop_region_for_grid((30, 45), 45, 30) == ((0, 0), (30, 45))


def test_rope_tables_shape_and_range():
    cos, sin = get_3d_rotary_pos_embed(64, ((0, 0), (30, 45)), (30, 45), 13)
    assert cos.shape == (13 * 30 * 45, 64)
    assert sin.shape == cos.shape
    np.testing.assert_allclose(np.asarray(cos) ** 2 + np.asarray(sin) ** 2, 1.0,
                               atol=1e-5)
    # halves duplicated (rotate-half layout)
    np.testing.assert_allclose(cos[:, :32], cos[:, 32:], atol=0)


def test_rope_apply_preserves_norm_and_relative_phase():
    cos, sin = get_3d_rotary_pos_embed(16, ((0, 0), (4, 4)), (4, 4), 2)
    x = jax.random.normal(jax.random.key(0), (1, 2, 32, 16))
    y = apply_rotary_emb(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # dot products between equal positions unchanged
    q = jax.random.normal(jax.random.key(1), (1, 1, 32, 16))
    k = jax.random.normal(jax.random.key(2), (1, 1, 32, 16))
    qr, kr = apply_rotary_emb(q, cos, sin), apply_rotary_emb(k, cos, sin)
    same_pos = jnp.einsum("bhsd,bhsd->bhs", qr, kr)
    ref = jnp.einsum("bhsd,bhsd->bhs", q, k)
    np.testing.assert_allclose(np.asarray(same_pos), np.asarray(ref), atol=1e-4)


def test_rope_matches_interleaved_reference():
    """Rotate-half apply == torch-style interleaved apply after the channel
    permutation the checkpoint converter performs."""
    d = 8
    pos = np.arange(5, dtype=np.float64)
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = np.outer(pos, inv)  # [5, 4]

    x = np.random.RandomState(0).randn(5, d).astype(np.float32)
    # interleaved reference (diffusers use_real_unbind_dim=-1 with
    # repeat_interleave'd cos/sin)
    cos_i = np.repeat(np.cos(ang), 2, axis=1)
    sin_i = np.repeat(np.sin(ang), 2, axis=1)
    xr = x.reshape(5, d // 2, 2)
    rot = np.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(5, d)
    ref = x * cos_i + rot * sin_i

    # our rotate-half with permuted channels: perm maps interleaved -> halves
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    cos_h = np.concatenate([np.cos(ang), np.cos(ang)], axis=1)
    sin_h = np.concatenate([np.sin(ang), np.sin(ang)], axis=1)
    y = apply_rotary_emb(jnp.asarray(x[:, perm])[None, None],
                         jnp.asarray(cos_h), jnp.asarray(sin_h))[0, 0]
    np.testing.assert_allclose(np.asarray(y), ref[:, perm], atol=1e-5)


def test_timestep_embedding():
    emb = timestep_embedding(jnp.array([0.0, 999.0]), 64)
    assert emb.shape == (2, 64)
    # t=0: sin part zero, cos part one; flip_sin_to_cos puts cos first
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), 0.0, atol=1e-6)


# ------------------------------------------------------------------- patch
def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 3, 4, 8, 12))
    tok = patchify(x, 2)
    assert tok.shape == (2, 3 * 4 * 6, 4 * 4)
    y = unpatchify(tok, (3, 4, 6), 4, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)


def test_patchify_matches_conv_semantics():
    """Feature ordering must equal Conv2d(k=p,s=p) + flatten: c*p*p + dy*p + dx."""
    b, t, c, h, w, p = 1, 1, 2, 4, 4, 2
    x = jnp.arange(b * t * c * h * w, dtype=jnp.float32).reshape(b, t, c, h, w)
    tok = patchify(x, p)
    # token 0 = patch at (0,0); feature index c_*4 + dy*2 + dx
    expect = [x[0, 0, ci, dy, dx] for ci in range(c) for dy in range(p) for dx in range(p)]
    np.testing.assert_allclose(np.asarray(tok[0, 0]), np.asarray(jnp.stack(expect)))


# --------------------------------------------------------------- scheduler
def test_schedule_tables():
    s = Schedule.create(SchedulerConfig())
    ac = np.asarray(s.alphas_cumprod)
    assert ac.shape == (1000,)
    assert np.all(np.diff(ac) < 0)          # strictly decreasing
    assert abs(ac[-1]) < 1e-10              # zero terminal SNR
    assert 0.99 < ac[0] < 1.0


def test_timesteps_trailing():
    s = Schedule.create(SchedulerConfig())
    ts = s.timesteps(50)
    assert len(ts) == 50 and ts[0] == 999 and ts[-1] == 19
    assert np.all(np.diff(ts) == -20)


def test_add_noise_get_velocity_consistency():
    """x0 recovered from (noisy, v) must equal the original sample."""
    s = Schedule.create(SchedulerConfig())
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (2, 3, 4))
    noise = jax.random.normal(jax.random.key(1), (2, 3, 4))
    t = jnp.array([100, 500])
    noisy = s.add_noise(x0, noise, t)
    v = s.get_velocity(noise, x0, t)
    a = np.asarray(s.alphas_cumprod)[np.asarray(t)].reshape(2, 1, 1)
    x0_rec = np.sqrt(a) * np.asarray(noisy) - np.sqrt(1 - a) * np.asarray(v)
    np.testing.assert_allclose(x0_rec, np.asarray(x0), atol=1e-5)


def test_ddim_step_terminal_recovers_x0():
    """Stepping to prev_t=-1 (alpha=1) must return pred_x0 exactly."""
    s = Schedule.create(SchedulerConfig())
    x0 = jax.random.normal(jax.random.key(0), (1, 4))
    noise = jax.random.normal(jax.random.key(1), (1, 4))
    t = jnp.array(19)
    noisy = s.add_noise(x0, noise, t)
    v = s.get_velocity(noise, x0, t)
    out = s.ddim_step(v, t, jnp.array(-1), noisy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_dpm_step_first_and_second_order():
    s = Schedule.create(SchedulerConfig())
    x = jax.random.normal(jax.random.key(0), (1, 8))
    v = jax.random.normal(jax.random.key(1), (1, 8)) * 0.1
    out1, x0 = s.dpm_step(v, None, jnp.array(999), None, jnp.array(979), x)
    assert out1.shape == x.shape and x0.shape == x.shape
    out2, x0b = s.dpm_step(v, x0, jnp.array(979), jnp.array(999), jnp.array(959), out1)
    assert np.all(np.isfinite(np.asarray(out2)))
    # second-order with identical old_pred == x0 collapses to first order
    out_fo, _ = s.dpm_step(v, None, jnp.array(979), None, jnp.array(959), out1)
    out_so, _ = s.dpm_step(v, x0b, jnp.array(979), jnp.array(999), jnp.array(959), out1)
    d_self = np.abs(np.asarray(out_so) - np.asarray(out_fo)).max()
    assert np.isfinite(d_self)


# --------------------------------------------------------------- attention
def test_sdpa_matches_naive():
    q = jax.random.normal(jax.random.key(0), (1, 2, 16, 8))
    k = jax.random.normal(jax.random.key(1), (1, 2, 16, 8))
    v = jax.random.normal(jax.random.key(2), (1, 2, 16, 8))
    out = sdpa(q, k, v)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_flash_attention_interpret_matches_sdpa():
    """Pallas kernel (interpret mode on CPU) vs the XLA reference."""
    q = jax.random.normal(jax.random.key(0), (1, 2, 256, 64), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, 256, 64), jnp.float32)
    out = _fwd_impl(q, k, v, None, 64 ** -0.5, 256, block_q=128, block_k=128,
                    interpret=True)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_padding_mask():
    """kv_len < padded S: padded keys must not contribute."""
    s_valid = 200
    q = jax.random.normal(jax.random.key(0), (1, 1, 256, 64), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 1, 256, 64), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 1, 256, 64), jnp.float32)
    out = _fwd_impl(q, k, v, None, 64 ** -0.5, s_valid, block_q=128, block_k=128,
                    interpret=True)
    ref = sdpa(q[:, :, :s_valid], k[:, :, :s_valid], v[:, :, :s_valid])
    np.testing.assert_allclose(np.asarray(out[:, :, :s_valid]), np.asarray(ref),
                               atol=2e-5)


def test_flash_attention_backward_matches_sdpa_grad():
    q = jax.random.normal(jax.random.key(0), (1, 2, 128, 32), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, 128, 32), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, 128, 32), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) ** 2)

    o = sdpa(q, k, v)
    do = 2 * o
    dq, dk, dv = _chunked_bwd(q, k, v, o, do, 32 ** -0.5, 128, block_q=64)
    gq, gk, gv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), atol=1e-4)


def test_flash_attention_cpu_dispatch():
    """On CPU backend flash_attention transparently falls back to XLA."""
    q = jax.random.normal(jax.random.key(0), (1, 1, 2048, 64), jnp.float32)
    out = flash_attention(q, q, q)
    ref = sdpa(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_pallas_backward_matches_sdpa_grad():
    """Full custom_vjp path (Pallas fwd+bwd, interpret mode) vs XLA grads."""
    from bindyouravatar_tpu.ops.flash_attention import _flash

    q = jax.random.normal(jax.random.key(0), (1, 2, 256, 64), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, 256, 64), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, None, None, 64 ** -0.5, 256, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_pallas_backward_padded_kv():
    """Gradients with masked padding: padded kv/q positions get zero grad."""
    from bindyouravatar_tpu.ops.flash_attention import _flash

    s_valid = 200
    q = jax.random.normal(jax.random.key(0), (1, 1, 256, 64), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 1, 256, 64), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 1, 256, 64), jnp.float32)

    def loss_flash(q, k, v):
        out = _flash(q, k, v, None, None, 64 ** -0.5, s_valid, 128, 128, True)
        return jnp.sum(out[:, :, :s_valid] ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q[:, :, :s_valid], k[:, :, :s_valid],
                            v[:, :, :s_valid]) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q[:, :, :s_valid], k[:, :, :s_valid], v[:, :, :s_valid])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a[:, :, :s_valid]),
                                   np.asarray(b), atol=2e-4)
        np.testing.assert_allclose(np.asarray(a[:, :, s_valid:]), 0.0, atol=1e-5)


def test_flash_fused_rope_matches_external_rope():
    """RoPE fused into the Pallas kernel == rotate in XLA then attend
    (fwd, interpret mode).  Text positions (rope_start) stay unrotated."""
    from bindyouravatar_tpu.ops.flash_attention import _fwd_impl
    from bindyouravatar_tpu.ops.rope import (apply_rotary_emb,
                                             get_3d_rotary_pos_embed)

    text_len, d = 16, 64
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (12, 10)), (12, 10), 2)
    s = text_len + cos.shape[0]  # 16 + 240 = 256
    q = jax.random.normal(jax.random.key(0), (1, 2, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, s, d), jnp.float32)

    cos_j = jnp.concatenate([jnp.ones((text_len, d)), cos])
    sin_j = jnp.concatenate([jnp.zeros((text_len, d)), sin])
    out = _fwd_impl(q, k, v, (cos_j, sin_j), d ** -0.5, s,
                    block_q=128, block_k=128, interpret=True)

    rot = lambda x: jnp.concatenate(
        [x[:, :, :text_len], apply_rotary_emb(x[:, :, text_len:], cos, sin)],
        axis=2)
    ref = sdpa(rot(q), rot(k), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fused_qk_norm_matches_unfused():
    """Kernel-fused QK LayerNorm (inference path) == LN outside + kernel,
    interpret mode, incl. the kv-tail validity column."""
    from bindyouravatar_tpu.ops.flash_attention import flash_attention

    b, h, s, d = 1, 2, 256 + 64, 64   # non-dividing tail
    kv = s - 32
    ks_ = jax.random.split(jax.random.key(0), 7)
    q = jax.random.normal(ks_[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks_[2], (b, h, s, d), jnp.float32)
    qs = 1.0 + 0.1 * jax.random.normal(ks_[3], (d,))
    qb = 0.1 * jax.random.normal(ks_[4], (d,))
    ksc = 1.0 + 0.1 * jax.random.normal(ks_[5], (d,))
    kb = 0.1 * jax.random.normal(ks_[6], (d,))

    def ln(x, sc, bi):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * sc + bi

    want = flash_attention(ln(q, qs, qb), ln(k, ksc, kb), v, kv_len=kv,
                           block_q=128, block_k=128, interpret=True)
    got = flash_attention(q, k, v, kv_len=kv, block_q=128, block_k=128,
                          interpret=True, qk_norm=(qs, qb, ksc, kb))
    np.testing.assert_allclose(np.asarray(got[:, :, :kv]),
                               np.asarray(want[:, :, :kv]), atol=2e-5)


def test_flash_fused_rope_backward():
    """Fused-rope custom_vjp grads == XLA autodiff through rope+sdpa."""
    from bindyouravatar_tpu.ops.flash_attention import _flash
    from bindyouravatar_tpu.ops.rope import (apply_rotary_emb,
                                             get_3d_rotary_pos_embed)

    text_len, d = 8, 64
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (8, 10)), (8, 10), 3)
    s = text_len + cos.shape[0]  # 8 + 240 = 248 -> padded to 256 in-kernel
    q = jax.random.normal(jax.random.key(0), (1, 2, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 2, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 2, s, d), jnp.float32)

    cos_j = jnp.concatenate([jnp.ones((text_len, d)), cos])
    sin_j = jnp.concatenate([jnp.zeros((text_len, d)), sin])

    def loss_flash(q, k, v):
        out = _flash(q, k, v, cos_j, sin_j, d ** -0.5, s, 128, 128, True)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        rot = lambda x: jnp.concatenate(
            [x[:, :, :text_len],
             apply_rotary_emb(x[:, :, text_len:], cos, sin)], axis=2)
        return jnp.sum(sdpa(rot(q), rot(k), v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_joint_attention_seq_padding_equivalence():
    """JointSelfAttention pads the joint sequence to the flash block multiple
    before qkv; result must equal the unpadded non-flash path."""
    from bindyouravatar_tpu.models.layers import JointSelfAttention
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    text_len, d = 26, 64
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (30, 45)), (30, 45), 1)
    s_vid = cos.shape[0]   # 1350 -> joint 1376, padded to 2048 in-module
    hidden = jax.random.normal(jax.random.key(0), (2, s_vid, 128))
    enc = jax.random.normal(jax.random.key(1), (2, text_len, 128))

    kw = dict(heads=2, head_dim=d, dtype=jnp.float32, param_dtype=jnp.float32)
    flash = JointSelfAttention(use_flash=True, **kw)
    plain = JointSelfAttention(use_flash=False, **kw)
    params = plain.init(jax.random.key(2), hidden, enc, (cos, sin))

    h1, e1 = flash.apply(params, hidden, enc, (cos, sin))
    h2, e2 = plain.apply(params, hidden, enc, (cos, sin))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=2e-5)


def test_flash_bshd_layout_matches_bhsd():
    """[B,S,H,D]-layout kernel (fwd + bwd, interpret) == [B,H,S,D] path."""
    from bindyouravatar_tpu.ops.flash_attention import _flash

    b, s, h, d = 1, 200, 2, 64   # 200 -> padded to 256 in-kernel
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.float32)

    def loss_bshd(q, k, v):
        out = _flash(q, k, v, None, None, d ** -0.5, s, 128, 128, True, True)
        return jnp.sum(out ** 2), out

    def loss_bhsd(q, k, v):
        t = lambda x: x.transpose(0, 2, 1, 3)
        out = _flash(t(q), t(k), t(v), None, None, d ** -0.5, s, 128, 128,
                     True, False)
        return jnp.sum(out ** 2), t(out)

    (l1, o1), g1 = jax.value_and_grad(loss_bshd, argnums=(0, 1, 2),
                                      has_aux=True)(q, k, v)
    (l2, o2), g2 = jax.value_and_grad(loss_bhsd, argnums=(0, 1, 2),
                                      has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_flash_bshd_rope_grad_matches_xla():
    """bshd grads with fused rope route through the COMBINED flat backward
    kernel (rotate-once cache + adjoint back-rotation) — vs XLA autodiff
    through rope + sdpa."""
    from bindyouravatar_tpu.ops.flash_attention import _flash
    from bindyouravatar_tpu.ops.rope import (apply_rotary_emb,
                                             get_3d_rotary_pos_embed)

    text_len, d, h = 8, 64, 2
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (8, 10)), (8, 10), 3)
    s = text_len + cos.shape[0]                  # 248
    q = jax.random.normal(jax.random.key(3), (1, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(4), (1, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(5), (1, s, h, d), jnp.float32)
    cos_j = jnp.concatenate([jnp.ones((text_len, d)), cos])
    sin_j = jnp.concatenate([jnp.zeros((text_len, d)), sin])

    def loss_flash(q, k, v):
        out = _flash(q, k, v, cos_j, sin_j, d ** -0.5, s, 128, 128, True,
                     True)   # bshd=True -> combined flat bwd
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        t = lambda x: x.transpose(0, 2, 1, 3)
        rot = lambda x: jnp.concatenate(
            [x[:, :, :text_len],
             apply_rotary_emb(x[:, :, text_len:], cos, sin)], axis=2)
        return jnp.sum(sdpa(rot(t(q)), rot(t(k)), t(v)) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_flash_flat_layout_matches_bhsd():
    """Flat [B,S,H*D] kernel (in-kernel LN+RoPE, scratch-cached) ==
    LN outside + bhsd kernel, interpret mode, kv tail masked."""
    from bindyouravatar_tpu.ops.flash_attention import flash_attention
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, h, d = 1, 4, 64
    text_len = 8
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (8, 10)), (8, 10), 3)
    s_real = text_len + cos.shape[0]              # 248
    s = 256                                       # padded joint length
    kv = s_real
    ks_ = jax.random.split(jax.random.key(7), 7)
    q = jax.random.normal(ks_[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(ks_[2], (b, s, h * d), jnp.float32)
    qs = 1.0 + 0.1 * jax.random.normal(ks_[3], (d,))
    qb = 0.1 * jax.random.normal(ks_[4], (d,))
    ksc = 1.0 + 0.1 * jax.random.normal(ks_[5], (d,))
    kb = 0.1 * jax.random.normal(ks_[6], (d,))

    def ln(x, sc, bi):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * sc + bi

    split = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    want = flash_attention(ln(split(q), qs, qb), ln(split(k), ksc, kb),
                           split(v), kv_len=kv, rope=(cos, sin),
                           rope_start=text_len, block_q=128, block_k=128,
                           interpret=True)
    want = want.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    got = flash_attention(q, k, v, kv_len=kv, rope=(cos, sin),
                          rope_start=text_len, layout="flat", heads=h,
                          qk_norm=(qs, qb, ksc, kb),
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :kv]),
                               np.asarray(want[:, :kv]), atol=2e-5)


def test_flash_flat_transposed_v_matches_flat():
    """Transposed-PV flat kernel (v as [B, H*D, S], full-MXU-width PV,
    eye-matmul output rotate) == the regular flat kernel, interpret mode,
    kv tail masked, LN + RoPE fused."""
    from bindyouravatar_tpu.ops.flash_attention import flash_attention
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, h, d = 1, 4, 64
    text_len = 8
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (8, 10)), (8, 10), 3)
    s_real = text_len + cos.shape[0]              # 248
    s = 256
    kv = s_real
    ks_ = jax.random.split(jax.random.key(11), 7)
    q = jax.random.normal(ks_[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(ks_[2], (b, s, h * d), jnp.float32)
    qs = 1.0 + 0.1 * jax.random.normal(ks_[3], (d,))
    qb = 0.1 * jax.random.normal(ks_[4], (d,))
    ksc = 1.0 + 0.1 * jax.random.normal(ks_[5], (d,))
    kb = 0.1 * jax.random.normal(ks_[6], (d,))

    want = flash_attention(q, k, v, kv_len=kv, rope=(cos, sin),
                           rope_start=text_len, layout="flat", heads=h,
                           qk_norm=(qs, qb, ksc, kb),
                           block_q=128, block_k=128, interpret=True)
    got = flash_attention(q, k, jnp.swapaxes(v, 1, 2), kv_len=kv,
                          rope=(cos, sin), rope_start=text_len,
                          layout="flat", heads=h, v_transposed=True,
                          qk_norm=(qs, qb, ksc, kb),
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :kv]),
                               np.asarray(want[:, :kv]), atol=2e-5)
    # bare path (no LN/rope) + CPU dispatch of the v_transposed flag
    want2 = flash_attention(q, k, v, kv_len=kv, layout="flat", heads=h,
                            block_q=128, block_k=128, interpret=True)
    got2 = flash_attention(q, k, jnp.swapaxes(v, 1, 2), kv_len=kv,
                           layout="flat", heads=h, v_transposed=True,
                           block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got2[:, :kv]),
                               np.asarray(want2[:, :kv]), atol=2e-5)
    # non-dividing Q grid (ADVICE r4 high): s % block_q != 0 leaves the
    # boundary block's padded q rows as UNDEFINED loads; unmasked, the
    # _store eye-matmul rotate mixed 0*NaN into every valid row of that
    # block.  s=320 / blocks 128 reproduces it exactly.
    s3 = 320
    q3 = jax.random.normal(ks_[3], (b, s3, h * d), jnp.float32)
    k3 = jax.random.normal(ks_[4], (b, s3, h * d), jnp.float32)
    v3 = jax.random.normal(ks_[5], (b, s3, h * d), jnp.float32)
    want3 = flash_attention(q3, k3, v3, kv_len=s3, layout="flat", heads=h,
                            block_q=128, block_k=128, interpret=True)
    got3 = flash_attention(q3, k3, jnp.swapaxes(v3, 1, 2), kv_len=s3,
                           layout="flat", heads=h, v_transposed=True,
                           block_q=128, block_k=128, interpret=True)
    assert np.isfinite(np.asarray(got3)).all(), "NaN in transposed-PV output"
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3), atol=2e-5)
    # out_transposed: kernel emits [B, H*D, S] directly (no eye rotate) —
    # must equal the rotated output exactly, incl. LN/rope fused and the
    # non-dividing boundary block
    got_t = flash_attention(q, k, jnp.swapaxes(v, 1, 2), kv_len=kv,
                            rope=(cos, sin), rope_start=text_len,
                            layout="flat", heads=h, v_transposed=True,
                            out_transposed=True,
                            qk_norm=(qs, qb, ksc, kb),
                            block_q=128, block_k=128, interpret=True)
    assert got_t.shape == (b, h * d, s), got_t.shape
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got_t, 1, 2)[:, :kv]),
        np.asarray(want[:, :kv]), atol=2e-5)
    got3_t = flash_attention(q3, k3, jnp.swapaxes(v3, 1, 2), kv_len=s3,
                             layout="flat", heads=h, v_transposed=True,
                             out_transposed=True,
                             block_q=128, block_k=128, interpret=True)
    assert np.isfinite(np.asarray(got3_t)).all()
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got3_t, 1, 2)),
                               np.asarray(want3), atol=2e-5)


def test_flash_flat_t_static_max_matches_running_max():
    """static-max softmax (provable QK-LN logit bound instead of the
    online running max) == the running-max kernel: softmax is shift-
    invariant and fp32 exp2 keeps full relative precision at any shift
    within the bound, so fp32-V outputs agree to reduction noise."""
    from bindyouravatar_tpu.ops.flash_attention import (
        _fwd_flat_t_impl)
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, h, d = 1, 4, 64
    text_len = 8
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (8, 10)), (8, 10), 3)
    s_real = text_len + cos.shape[0]              # 248
    s = 320                                       # non-dividing q/kv grid
    kv = s_real
    ks_ = jax.random.split(jax.random.key(23), 7)
    q = jax.random.normal(ks_[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, s, h * d), jnp.float32)
    vt = jnp.swapaxes(jax.random.normal(ks_[2], (b, s, h * d), jnp.float32),
                      1, 2)
    # adversarially large affines: the bound must still hold
    qk_norm = (1.0 + 0.5 * jax.random.normal(ks_[3], (d,)),
               0.5 * jax.random.normal(ks_[4], (d,)),
               1.0 + 0.5 * jax.random.normal(ks_[5], (d,)),
               0.5 * jax.random.normal(ks_[6], (d,)))
    rope_t = (jnp.concatenate([jnp.ones((text_len, d)),
                               cos.astype(jnp.float32),
                               jnp.ones((s - s_real, d))]),
              jnp.concatenate([jnp.zeros((text_len, d)),
                               sin.astype(jnp.float32),
                               jnp.zeros((s - s_real, d))]))
    args = (q, k, vt, h, rope_t, d ** -0.5, kv, 128, 128, True)
    want = _fwd_flat_t_impl(*args, qk_norm=qk_norm, static_max=False)
    got = _fwd_flat_t_impl(*args, qk_norm=qk_norm, static_max=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got[:, :kv]),
                               np.asarray(want[:, :kv]),
                               atol=3e-5, rtol=1e-4)
    # transposed store composes with static max
    got_t = _fwd_flat_t_impl(*args, qk_norm=qk_norm, static_max=True,
                             out_transposed=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got_t, 1, 2)),
                               np.asarray(want), atol=3e-5, rtol=1e-4)
    # software-pipelined (head, q-chunk) schedule == staged schedule —
    # block_q=256 so each of the 2 chunks is a 128-lane slice, with a
    # non-dividing boundary block (s=320) exercising the q-row mask
    args256 = (q, k, vt, h, rope_t, d ** -0.5, kv, 256, 128, True)
    want_p = _fwd_flat_t_impl(*args256, qk_norm=qk_norm, static_max=True,
                              pipeline_chunks=1)
    got_p = _fwd_flat_t_impl(*args256, qk_norm=qk_norm, static_max=True,
                             pipeline_chunks=2)
    assert np.isfinite(np.asarray(got_p)).all()
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=3e-5, rtol=1e-4)
    got_pt = _fwd_flat_t_impl(*args256, qk_norm=qk_norm, static_max=True,
                              pipeline_chunks=2, out_transposed=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got_pt, 1, 2)),
                               np.asarray(want_p), atol=3e-5, rtol=1e-4)


def test_flash_flat_no_norm_no_rope():
    """Flat kernel bare path (no LN, no rope), non-dividing kv tail."""
    from bindyouravatar_tpu.ops.flash_attention import flash_attention

    b, h, d = 2, 2, 64
    s, kv = 320, 280
    ks_ = jax.random.split(jax.random.key(8), 3)
    q = jax.random.normal(ks_[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(ks_[2], (b, s, h * d), jnp.float32)
    split = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    want = flash_attention(split(q), split(k), split(v), kv_len=kv,
                           block_q=128, block_k=128, interpret=True)
    want = want.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    got = flash_attention(q, k, v, kv_len=kv, layout="flat", heads=h,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :kv]),
                               np.asarray(want[:, :kv]), atol=2e-5)


def test_flash_flat_grad_matches_sdpa():
    """The bare flat path is differentiable (custom_vjp: flat kernel fwd,
    chunked-recompute bwd on bhsd views) — value AND grads match SDPA."""
    from bindyouravatar_tpu.ops.attention import sdpa
    from bindyouravatar_tpu.ops.flash_attention import flash_attention

    b, h, d = 1, 2, 64
    s = 256
    ks_ = jax.random.split(jax.random.key(9), 3)
    q = jax.random.normal(ks_[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(ks_[2], (b, s, h * d), jnp.float32)
    split = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    merge = lambda x: x.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def ref_loss(q, k, v):
        return (merge(sdpa(split(q), split(k), split(v))) ** 2).sum()

    def flat_loss(q, k, v):
        o = flash_attention(q, k, v, layout="flat", heads=h,
                            block_q=128, block_k=128, interpret=True)
        return (o ** 2).sum()

    l1, g1 = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    l2, g2 = jax.value_and_grad(flat_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_joint_attention_fused_flat_matches_unfused():
    """JointSelfAttention(fuse_qk_norm=True) == default path (CPU fallback
    exercises the same math; param trees must coincide)."""
    import flax
    from bindyouravatar_tpu.models.layers import JointSelfAttention
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, s_vid, text_len, h, d = 1, 1080, 16, 4, 64
    rope = get_3d_rotary_pos_embed(d, ((0, 0), (12, 15)), (12, 15), 6)
    assert rope[0].shape[0] == s_vid
    key = jax.random.key(3)
    hid = jax.random.normal(key, (b, s_vid, h * d), jnp.float32) * 0.3
    enc = jax.random.normal(jax.random.key(4), (b, text_len, h * d),
                            jnp.float32) * 0.3
    base = JointSelfAttention(heads=h, head_dim=d, use_flash=True,
                              dtype=jnp.float32)
    fused = JointSelfAttention(heads=h, head_dim=d, use_flash=True,
                               fuse_qk_norm=True, dtype=jnp.float32)
    params = base.init(jax.random.key(5), hid, enc, rope)
    p2 = fused.init(jax.random.key(5), hid, enc, rope)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    o1, e1 = base.apply(params, hid, enc, rope)
    o2, e2 = fused.apply(params, hid, enc, rope)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               atol=2e-5, rtol=1e-4)


def test_sdpa_chunked_matches_sdpa():
    """Memory-bounded q-block-chunked SDPA (the CPU fallback for score
    tensors that would not fit, e.g. 48 x 17776^2 fp32 = 121 GB): forward
    AND grads match plain SDPA, incl. kv_len masking and non-dividing
    block_q."""
    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.ops.attention import sdpa, sdpa_chunked

    rng = np.random.default_rng(7)
    b, h, s, d = 2, 3, 70, 16
    q, k, v = (jnp.asarray(rng.normal(0, 1, (b, h, s, d)).astype(np.float32))
               for _ in range(3))

    for kv_len in (s, 61):
        want = sdpa(q, k, v, kv_len=kv_len)
        got = sdpa_chunked(q, k, v, kv_len=kv_len, block_q=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

        def loss(fn, kv_len=kv_len):
            return lambda q_, k_, v_: (fn(q_, k_, v_, kv_len=kv_len)
                                       ** 2).sum()

        gw = jax.grad(loss(sdpa), argnums=(0, 1, 2))(q, k, v)
        gc = jax.grad(lambda q_, k_, v_: (sdpa_chunked(
            q_, k_, v_, kv_len=kv_len, block_q=32) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gc, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4)


def test_ff_chunked_matches_dense_path():
    """ff_chunked (sequence-chunked custom-VJP FF) == the plain Dense FF:
    same outputs AND same grads (x, w0, b0, w2, b2), non-dividing S."""
    from bindyouravatar_tpu.models.layers import FeedForward

    b, s, dim, mult = 2, 37, 16, 4
    kx, kp = jax.random.split(jax.random.key(5))
    x = jax.random.normal(kx, (b, s, dim), jnp.float32)
    ff_a = FeedForward(dim, mult=mult, chunks=1,
                       dtype=jnp.float32, param_dtype=jnp.float32)
    ff_b = FeedForward(dim, mult=mult, chunks=3,
                       dtype=jnp.float32, param_dtype=jnp.float32)
    p = ff_a.init(kp, x)
    # identical param trees (checkpoint interchangeability)
    pb = ff_b.init(kp, x)
    assert jax.tree.all(jax.tree.map(lambda a_, b_: a_.shape == b_.shape,
                                     p, pb))

    la = lambda p_, x_: (ff_a.apply(p_, x_) ** 2).sum()
    lb = lambda p_, x_: (ff_b.apply(p_, x_) ** 2).sum()
    np.testing.assert_allclose(np.asarray(ff_b.apply(p, x)),
                               np.asarray(ff_a.apply(p, x)),
                               atol=1e-5, rtol=1e-5)
    ga = jax.grad(la, argnums=(0, 1))(p, x)
    gb = jax.grad(lb, argnums=(0, 1))(p, x)
    jax.tree.map(lambda a_, b_: np.testing.assert_allclose(
        np.asarray(b_), np.asarray(a_), atol=2e-4, rtol=2e-4), ga, gb)


def test_flash_flat_rope_grad_matches_xla():
    """The flat custom-VJP path WITH in-kernel rope (the round-5 flat
    TRAINING layout — no bhsd residual copies) — value and grads match an
    XLA reference that ropes outside, incl. a masked kv tail."""
    from bindyouravatar_tpu.ops.attention import sdpa
    from bindyouravatar_tpu.ops.flash_attention import flash_attention
    from bindyouravatar_tpu.ops.rope import (apply_rotary_emb,
                                             get_3d_rotary_pos_embed)

    b, h, d = 1, 2, 64
    text_len = 8
    cos, sin = get_3d_rotary_pos_embed(d, ((0, 0), (8, 10)), (8, 10), 3)
    s_real = text_len + cos.shape[0]              # 248
    s = 256
    ks_ = jax.random.split(jax.random.key(31), 3)
    q = jax.random.normal(ks_[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(ks_[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(ks_[2], (b, s, h * d), jnp.float32)
    split = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    merge = lambda x: x.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def rot(t):
        return jnp.concatenate(
            [t[:, :, :text_len],
             apply_rotary_emb(t[:, :, text_len:s_real], cos, sin),
             t[:, :, s_real:]], axis=2)

    def ref_loss(q, k, v):
        qh, kh, vh = split(q), split(k), split(v)
        qh, kh = rot(qh), rot(kh)
        mask = (jnp.arange(s) < s_real)[None, None, None, :]
        sc = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (d ** -0.5)
        sc = jnp.where(mask, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return ((merge(o)[:, :s_real]) ** 2).sum()

    def flat_loss(q, k, v):
        o = flash_attention(q, k, v, layout="flat", heads=h,
                            kv_len=s_real, rope=(cos, sin),
                            rope_start=text_len,
                            block_q=128, block_k=128, interpret=True)
        return (o[:, :s_real] ** 2).sum()

    l1, g1 = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    l2, g2 = jax.value_and_grad(flat_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a[:, :s_real]),
                                   np.asarray(b_[:, :s_real]), atol=2e-4)
