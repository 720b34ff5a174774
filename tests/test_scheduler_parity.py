"""Cross-implementation parity: ops/scheduler.Schedule vs the numpy mirror
of diffusers' CogVideoX schedulers (tests/torch_mirror_sched.py) — VERDICT
r2 item 1b: the DPM++ two-sample recursion and DDIM step previously had
only self-generated goldens.

The full multi-step recursions are driven exactly like the pipeline wires
them (`pipeline/pipeline.py` scan xs vs reference
`pipeline_bindyouravatar.py:936-947`: t_back = timesteps[i-1], first step
first-order, shared per-step noise).
"""

import numpy as np

from torch_mirror_sched import MirrorCogVideoXScheduler

from bindyouravatar_tpu.config import SchedulerConfig
from bindyouravatar_tpu.ops.scheduler import Schedule

import jax.numpy as jnp


def _pair():
    return Schedule.create(SchedulerConfig()), MirrorCogVideoXScheduler()


def test_alphas_cumprod_table_parity():
    """scaled-linear betas -> SNR shift -> zero-terminal-SNR rescale."""
    sched, mirror = _pair()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod),
                               mirror.alphas_cumprod, atol=1e-7)
    assert sched.final_alpha_cumprod == mirror.final_alpha_cumprod == 1.0


def test_trailing_timesteps_parity():
    sched, mirror = _pair()
    for steps in (4, 8, 50):
        np.testing.assert_array_equal(sched.timesteps(steps),
                                      mirror.set_timesteps(steps))


def test_add_noise_and_velocity_parity():
    sched, mirror = _pair()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 3, 4)).astype(np.float32)
    n = rng.normal(0, 1, (2, 3, 4)).astype(np.float32)
    for t in (0, 321, 999):
        got = np.asarray(sched.add_noise(jnp.asarray(x), jnp.asarray(n),
                                         jnp.asarray([t])))
        np.testing.assert_allclose(got, mirror.add_noise(x, n, t).astype(
            np.float32), atol=2e-6)
        got_v = np.asarray(sched.get_velocity(jnp.asarray(n), jnp.asarray(x),
                                              jnp.asarray([t])))
        np.testing.assert_allclose(got_v, mirror.get_velocity(n, x, t).astype(
            np.float32), atol=2e-6)


def test_ddim_recursion_parity():
    """Full 8-step DDIM denoise == the mirror recursion (CogVideoX a_t/b_t
    form; reference scheduler_type branch pipeline:936-937)."""
    sched, mirror = _pair()
    steps = 8
    ts = sched.timesteps(steps)
    mirror.set_timesteps(steps)
    rng = np.random.default_rng(1)
    lat_j = lat_m = rng.normal(0, 1, (1, 2, 4, 6, 8)).astype(np.float32)
    lat_j = jnp.asarray(lat_j)
    for i, t in enumerate(ts):
        mo = rng.normal(0, 1, lat_m.shape).astype(np.float32)
        prev_t = int(t) - 1000 // steps
        lat_j = sched.ddim_step(jnp.asarray(mo), jnp.asarray(int(t)),
                                jnp.asarray(prev_t), lat_j)
        lat_m = mirror.ddim_step(mo.astype(np.float64), int(t), lat_m)
        np.testing.assert_allclose(np.asarray(lat_j), lat_m, atol=5e-5,
                                   err_msg=f"step {i} (t={t})")


def test_dpm_recursion_parity():
    """Full 8-step SDE-DPM-Solver++(2M) denoise with the two-sample carry
    == the mirror recursion (reference pipeline_bindyouravatar.py:936-947:
    first step first-order, t_back = timesteps[i-1], stochastic noise)."""
    sched, mirror = _pair()
    steps = 8
    ts = sched.timesteps(steps)
    mirror.set_timesteps(steps)
    rng = np.random.default_rng(2)
    init = rng.normal(0, 1, (1, 2, 4, 6, 8)).astype(np.float32)
    lat_j = jnp.asarray(init)
    old_j = jnp.zeros_like(lat_j)
    lat_m, old_m = init.astype(np.float64), None
    for i, t in enumerate(ts):
        mo = rng.normal(0, 1, init.shape).astype(np.float32)
        noise = rng.normal(0, 1, init.shape).astype(np.float32)
        prev_t = int(t) - 1000 // steps
        t_back = int(ts[i - 1]) if i > 0 else int(ts[0])
        lat_j, old_j = sched.dpm_step_scan(
            jnp.asarray(mo), old_j, jnp.asarray(int(t)), jnp.asarray(t_back),
            jnp.asarray(prev_t), lat_j, jnp.asarray(i > 0),
            jnp.asarray(noise))
        lat_m, old_m = mirror.dpm_step(
            mo.astype(np.float64), old_m, int(t),
            int(ts[i - 1]) if i > 0 else None, lat_m,
            noise.astype(np.float64))
        np.testing.assert_allclose(np.asarray(lat_j), lat_m, atol=5e-5,
                                   err_msg=f"step {i} (t={t})")
        np.testing.assert_allclose(np.asarray(old_j), old_m, atol=5e-5)


def test_dpm_last_step_first_order():
    """prev_t < 0 (final step) falls back to first order even with a carry
    (the mirror's `prev_t < 0` branch == dpm_step's jnp.where)."""
    sched, mirror = _pair()
    steps = 4
    ts = sched.timesteps(steps)
    mirror.set_timesteps(steps)
    t_last = int(ts[-1])
    assert t_last - 1000 // steps < 0
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 3)).astype(np.float32)
    mo = rng.normal(0, 1, (2, 3)).astype(np.float32)
    old = rng.normal(0, 1, (2, 3)).astype(np.float32)
    noise = rng.normal(0, 1, (2, 3)).astype(np.float32)
    got, _ = sched.dpm_step(jnp.asarray(mo), jnp.asarray(old),
                            jnp.asarray(t_last), jnp.asarray(int(ts[-2])),
                            jnp.asarray(t_last - 1000 // steps),
                            jnp.asarray(x), jnp.asarray(noise))
    want, _ = mirror.dpm_step(mo.astype(np.float64), old.astype(np.float64),
                              t_last, int(ts[-2]), x.astype(np.float64),
                              noise.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-6)
