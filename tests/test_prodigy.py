"""Prodigy optimizer parity + behavior tests.

The optax implementation (`training/prodigy.py`) is checked against an
independent numpy mirror of the `prodigyopt.Prodigy` step recursion (the
library the reference trainer uses, `/root/reference/train.py:281-307`;
prodigyopt itself is not installed in this environment, so the mirror
re-derives the published algorithm step-for-step).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class NumpyProdigy:
    """Mirror of prodigyopt.Prodigy (single param group, Adam variant)."""

    def __init__(self, params, lr=1.0, betas=(0.9, 0.999), beta3=None,
                 eps=1e-8, weight_decay=0.0, decouple=True,
                 use_bias_correction=False, safeguard_warmup=False,
                 d0=1e-6, d_coef=1.0, growth_rate=float("inf")):
        self.p = [np.array(p, np.float64) for p in params]
        self.p0 = [p.copy() for p in self.p]
        self.m = [np.zeros_like(p) for p in self.p]
        self.v = [np.zeros_like(p) for p in self.p]
        self.s = [np.zeros_like(p) for p in self.p]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.b3 = beta3 if beta3 is not None else np.sqrt(betas[1])
        self.eps, self.wd, self.decouple = eps, weight_decay, decouple
        self.bias_corr, self.safeguard = use_bias_correction, safeguard_warmup
        self.d = self.d0 = d0
        self.d_coef, self.growth = d_coef, growth_rate
        self.d_max = d0
        self.d_numerator = 0.0
        self.k = 0

    def step(self, grads):
        grads = [np.array(g, np.float64) for g in grads]
        if self.bias_corr:
            bc = ((1 - self.b2 ** (self.k + 1)) ** 0.5) / (
                1 - self.b1 ** (self.k + 1))
        else:
            bc = 1.0
        dlr = self.d * self.lr * bc
        d_numerator = self.d_numerator * np.sqrt(self.b3)
        d_denom = 0.0
        for i, g in enumerate(grads):
            d_numerator += (self.d / self.d0) * dlr * float(
                np.sum(g * (self.p0[i] - self.p[i])))
            self.m[i] = self.m[i] * self.b1 + g * (self.d * (1 - self.b1))
            self.v[i] = self.v[i] * self.b2 + g * g * (
                self.d * self.d * (1 - self.b2))
            coef = (self.d / self.d0) * (
                self.d if self.safeguard else dlr)
            self.s[i] = self.s[i] * np.sqrt(self.b3) + g * coef
            d_denom += float(np.sum(np.abs(self.s[i])))
        if self.lr > 0.0 and d_denom > 0.0:
            d_hat = self.d_coef * d_numerator / d_denom
            d = self.d
            if d == self.d0:
                d = max(d, d_hat)
            self.d_max = max(self.d_max, d_hat)
            self.d = min(self.d_max, d * self.growth)
        self.d_numerator = d_numerator
        for i in range(len(self.p)):
            denom = np.sqrt(self.v[i]) + self.d * self.eps
            if self.wd != 0.0 and self.decouple:
                self.p[i] = self.p[i] - dlr * self.wd * self.p[i]
            self.p[i] = self.p[i] - dlr * self.m[i] / denom
        self.k += 1


def _run_pair(steps=6, wd=0.0, bias_corr=False, safeguard=False, lr=1.0):
    from bindyouravatar_tpu.training.prodigy import prodigy

    rng = np.random.default_rng(0)
    shapes = [(3, 4), (5,)]
    params = [rng.normal(0, 1, s).astype(np.float32) for s in shapes]
    grads = [[rng.normal(0, 1, s).astype(np.float32) for s in shapes]
             for _ in range(steps)]

    ref = NumpyProdigy(params, lr=lr, weight_decay=wd,
                       use_bias_correction=bias_corr,
                       safeguard_warmup=safeguard)
    for g in grads:
        ref.step(g)

    tx = prodigy(lr, weight_decay=wd, use_bias_correction=bias_corr,
                 safeguard_warmup=safeguard)
    tree = {"a": jnp.asarray(params[0]), "b": jnp.asarray(params[1])}
    state = tx.init(tree)
    for g in grads:
        gt = {"a": jnp.asarray(g[0]), "b": jnp.asarray(g[1])}
        upd, state = tx.update(gt, state, tree)
        tree = jax.tree.map(lambda p, u: p + u, tree, upd)
    return ref, tree, state


@pytest.mark.parametrize("wd,bias_corr,safeguard", [
    (0.0, False, False),
    (1e-2, False, False),
    (0.0, True, False),
    (0.0, False, True),
])
def test_prodigy_matches_numpy_mirror(wd, bias_corr, safeguard):
    ref, tree, state = _run_pair(wd=wd, bias_corr=bias_corr,
                                 safeguard=safeguard)
    np.testing.assert_allclose(np.asarray(tree["a"]), ref.p[0],
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(tree["b"]), ref.p[1],
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(state.d), ref.d, rtol=1e-4)


def test_prodigy_d_grows_and_quadratic_converges():
    """d escapes d0 and a quadratic objective converges without any
    hand-set learning rate (the optimizer's whole point)."""
    from bindyouravatar_tpu.training.prodigy import prodigy

    target = jnp.asarray([3.0, -2.0, 0.5])
    x = {"x": jnp.zeros(3)}
    tx = prodigy(1.0)
    state = tx.init(x)
    loss = lambda p: 0.5 * jnp.sum((p["x"] - target) ** 2)
    g = jax.grad(loss)

    @jax.jit
    def step(x, state):
        upd, state = tx.update(g(x), state, x)
        return jax.tree.map(lambda p, u: p + u, x, upd), state

    for _ in range(300):
        x, state = step(x, state)
    assert float(state.d) > 1e-6 * 10       # escaped d0
    assert float(loss(x)) < 1e-3


def test_prodigy_reachable_from_trainer():
    from bindyouravatar_tpu.config import TrainConfig
    from bindyouravatar_tpu.training.trainer import make_optimizer

    tx = make_optimizer(TrainConfig(optimizer="prodigy", learning_rate=1.0))
    params = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    upd, _ = tx.update({"w": jnp.full((2, 2), 0.1)}, state, params)
    assert upd["w"].shape == (2, 2)
    assert np.isfinite(np.asarray(upd["w"])).all()
