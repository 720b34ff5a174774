"""Prodigy optimizer (parameter-free Adam) as an optax transformation.

The reference trainer offers `--optimizer prodigy` via the `prodigyopt`
package (`/root/reference/train.py:281-307`); optax ships no equivalent, so
this implements the published algorithm (Mishchenko & Defazio, "Prodigy: An
Expeditiously Adaptive Parameter-Free Learner", arXiv 2306.06101) with the
same state recursion and defaults as `prodigyopt.Prodigy`:

  dlr_k   = d_k * lr_k * bias_correction_k
  num_k   = sqrt(beta3) * num_{k-1} + (d_k/d0) * dlr_k * <g_k, x0 - x_k>
  s_k     = sqrt(beta3) * s_{k-1} + (d_k/d0) * dlr_k * g_k     (per-coord)
            (safeguard_warmup uses (d_k/d0)*d_k instead of (d_k/d0)*dlr_k)
  m_k     = beta1 * m_{k-1} + (1-beta1) * d_k * g_k
  v_k     = beta2 * v_{k-1} + (1-beta2) * d_k^2 * g_k^2
  d_hat   = d_coef * num_k / ||s_k||_1
  d_{k+1} = min(max(d_k, d_hat), d_k * growth_rate)
  x_{k+1} = x_k - dlr_k * m_k / (sqrt(v_k) + d_{k+1} * eps)
            [- dlr_k * weight_decay * x_k when decoupled]

All d/numerator bookkeeping is global (scalar) across the pytree, exactly
as prodigyopt aggregates across param groups.  TPU-friendly: the whole
update is elementwise + two global reductions, fully jittable.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    count: jnp.ndarray          # int32 step counter k
    d: jnp.ndarray              # current distance estimate (f32 scalar)
    d_max: jnp.ndarray
    d_numerator: jnp.ndarray
    exp_avg: Any                # m
    exp_avg_sq: Any             # v
    s: Any                      # per-coordinate denominator accumulator
    p0: Any                     # initial params (distance anchor)


def prodigy(
    learning_rate: Union[float, optax.Schedule] = 1.0,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    beta3: Optional[float] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decouple: bool = True,
    use_bias_correction: bool = False,
    safeguard_warmup: bool = False,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    growth_rate: float = float("inf"),
) -> optax.GradientTransformation:
    """Prodigy with the prodigyopt flag surface the reference exposes
    (`/root/reference/train.py:296-307`: betas, beta3, weight_decay, eps,
    decouple, use_bias_correction, safeguard_warmup)."""

    def init_fn(params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return ProdigyState(
            count=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.zeros([], jnp.float32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.copy, zeros),
            s=jax.tree.map(jnp.copy, zeros),
            # copy=True: astype on an f32 param is a no-op ALIAS, and the
            # train step donates state while passing params separately —
            # shared buffers trip XLA's donation check
            p0=jax.tree.map(
                lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("prodigy requires params (pass to tx.update)")
        k = state.count
        d = state.d
        b3 = jnp.sqrt(b2) if beta3 is None else beta3
        sqrt_b3 = jnp.sqrt(jnp.asarray(b3, jnp.float32))

        lr = learning_rate(k) if callable(learning_rate) else learning_rate
        if use_bias_correction:
            bc = jnp.sqrt(1.0 - b2 ** (k + 1).astype(jnp.float32)) / (
                1.0 - b1 ** (k + 1).astype(jnp.float32))
        else:
            bc = 1.0
        dlr = d * lr * bc

        g32 = jax.tree.map(lambda g: g.astype(jnp.float32), updates)

        # global numerator increment: <g, x0 - x>
        dots = jax.tree.map(
            lambda g, p, q0: jnp.sum(g * (q0 - p.astype(jnp.float32))),
            g32, params, state.p0)
        d_numerator = (state.d_numerator * sqrt_b3
                       + (d / d0) * dlr * sum(jax.tree.leaves(dots)))

        s_coef = (d / d0) * (d if safeguard_warmup else dlr)
        new_s = jax.tree.map(lambda s, g: s * sqrt_b3 + s_coef * g,
                             state.s, g32)
        d_denom = sum(jax.tree.leaves(
            jax.tree.map(lambda s: jnp.sum(jnp.abs(s)), new_s)))

        new_m = jax.tree.map(lambda m, g: m * b1 + (1.0 - b1) * d * g,
                             state.exp_avg, g32)
        new_v = jax.tree.map(
            lambda v, g: v * b2 + (1.0 - b2) * d * d * g * g,
            state.exp_avg_sq, g32)

        # d update, prodigyopt order: d_hat from the fresh accumulators;
        # `if d == d0: d = max(d, d_hat); d_max = max(d_max, d_hat);
        #  d = min(d_max, d * growth_rate)` — skipped when lr == 0 or the
        # denominator is still empty.  The NEW d enters this step's eps
        # term while dlr keeps the old d.
        live = (d_denom > 0.0) & (jnp.asarray(lr, jnp.float32) > 0.0)
        d_hat = jnp.where(live, d_coef * d_numerator / jnp.where(
            d_denom > 0.0, d_denom, 1.0), d)
        d_b = jnp.where(d == d0, jnp.maximum(d, d_hat), d)
        new_d_max = jnp.where(live, jnp.maximum(state.d_max, d_hat),
                              state.d_max)
        gr = jnp.asarray(growth_rate, jnp.float32)
        new_d = jnp.where(live, jnp.minimum(new_d_max, d_b * gr), d)

        def step(m, v, p):
            denom = jnp.sqrt(v) + new_d * eps
            upd = -dlr * m / denom
            if weight_decay != 0.0 and decouple:
                upd = upd - dlr * weight_decay * p.astype(jnp.float32)
            return upd.astype(p.dtype)

        out = jax.tree.map(step, new_m, new_v, params)
        new_state = ProdigyState(
            count=k + 1, d=new_d, d_max=new_d_max, d_numerator=d_numerator,
            exp_avg=new_m, exp_avg_sq=new_v, s=new_s, p0=state.p0)
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)
