"""Fused single-pass LayerNorm Pallas kernel.

XLA lowers `LayerNorm(x.astype(f32)) -> bf16` over [B, S, 3072] as a
materialised fp32 convert (+216 MB), a stats pass, and a normalize epilogue
that gets FUSED INTO THE CONSUMING MATMUL — which then reads the fp32
convert instead of bf16 activations (measured: audio to_q at 145 TF/s /
184 GB/s vs 175 TF/s for the same matmul on bf16 input; r4 profile).  This
kernel does the whole LN in VMEM — read bf16 once, fp32 statistics, scale +
bias, write bf16 once (216 MB total traffic vs ~540 MB + the matmul tax).

Mirrors the reference's `nn.LayerNorm(dim, eps, elementwise_affine=True)`
uses (e.g. `/root/reference/models/audio_model.py:231`,
`models/router.py:205`); math identical to `models.layers.LayerNorm`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


def _ln_ref(x, scale, bias, eps):
    """Executable spec (CPU and backward path) — identical fp32 math."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last dim of `x` ([..., D], D % 128 == 0) with
    fp32 statistics, returning x.dtype.  Pallas single-pass kernel on TPU;
    XLA spec elsewhere.  Backward runs through the XLA spec (the fused
    forward matters on the 50-step inference loop; training keeps exact
    autodiff grads)."""
    return _ln_impl(x, scale, bias, eps)


def _ln_impl(x, scale, bias, eps):
    d = x.shape[-1]
    # dispatch on the process default backend at trace time (ADVICE r4 low:
    # this is a documented project invariant — every process here runs a
    # single platform, forced in conftest/bench; jax.default_backend() is
    # the canonical spelling and tracks the same config)
    if (jax.default_backend() != "tpu" or d % 128
            or x.ndim < 2 or x.dtype == jnp.float64):
        return _ln_ref(x, scale, bias, eps)
    shape = x.shape
    m = 1
    for v in shape[:-1]:
        m *= v
    xf = x.reshape(m, d)
    rows = min(512, max(8, m))
    spec = pl.BlockSpec((rows, d), lambda i: (i, 0))
    vspec = pl.BlockSpec((1, d), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(m, rows),),
        in_specs=[spec, vspec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xf, scale.astype(jnp.float32).reshape(1, d),
      bias.astype(jnp.float32).reshape(1, d))
    return out.reshape(shape)


def _ln_fwd(x, scale, bias, eps):
    return _ln_impl(x, scale, bias, eps), (x, scale, bias)


def _ln_closed_bwd(x, scale, g, eps, mu=None, r=None):
    """Closed-form LN backward (analytic vjp of `_ln_ref`):
        x̂ = (x - μ)·r,  gy = g·scale
        dx = r·(gy - mean(gy) - x̂·mean(gy·x̂))
        dscale = Σ g·x̂,  dbias = Σ g
    Emitting dx in x.dtype directly keeps the backward's live set bf16 —
    autodiff through the fp32 spec instead materialises several fp32
    [.., S, D] temps (sub/mul/broadcast), the depth-14 single-chip HBM
    limiter (runs/chip_r5/depth14_flat4.log: 9 x 216 MB)."""
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    if mu is None:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * r
    gy = g32 * scale.astype(jnp.float32)
    mg = jnp.mean(gy, axis=-1, keepdims=True)
    mgx = jnp.mean(gy * xhat, axis=-1, keepdims=True)
    dx = (r * (gy - mg - xhat * mgx)).astype(x.dtype)
    axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(g32 * xhat, axis=axes).astype(scale.dtype)
    dbias = jnp.sum(g32, axis=axes)
    return dx, dscale, dbias


def _ln_bwd(eps, res, g):
    x, scale, bias = res
    dx, dscale, dbias = _ln_closed_bwd(x, scale, g, eps)
    return dx, dscale, dbias.astype(bias.dtype)


fused_layernorm.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lean_layernorm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last dim with a MEMORY-LEAN vjp: the forward
    saves only the (bf16) input plus the squeezed fp32 stats ([...]-shaped
    μ and rsqrt — keepdims stats of a [.., H, 1] trailing dim would
    lane-pad 1 -> 128, a 453 MB write at the QK-norm shape), and the
    backward is the closed form above.  Used for the DiT training path's
    per-head QK norms where autodiff's fp32 temp chain was the single-chip
    depth limiter; math identical to `models.layers.LayerNorm`."""
    y, _, _ = _lean_fwd_math(x, scale, bias, eps)
    return y


def _lean_fwd_math(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    y = (xc * r * scale.astype(jnp.float32)
         + bias.astype(jnp.float32)).astype(x.dtype)
    return y, mu[..., 0], r[..., 0]


def _lean_fwd(x, scale, bias, eps):
    y, mu, r = _lean_fwd_math(x, scale, bias, eps)
    return y, (x, scale, bias, mu, r)


def _lean_bwd(eps, res, g):
    x, scale, bias, mu, r = res
    dx, dscale, dbias = _ln_closed_bwd(x, scale, g, eps,
                                       mu=mu[..., None], r=r[..., None])
    return dx, dscale, dbias.astype(bias.dtype)


lean_layernorm.defvjp(_lean_fwd, _lean_bwd)
