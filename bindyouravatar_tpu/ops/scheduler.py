"""CogVideoX diffusion schedules as pure JAX functions.

Re-derivation of diffusers' `CogVideoXDDIMScheduler` / `CogVideoXDPMScheduler`
semantics (the reference wires them at `infer.py:281-289` and trains with
`add_noise`/`get_velocity`, `train.py:1395,1509`).  Tables are computed in
float64 numpy at setup for fidelity, stored as fp32 device constants; all
step functions are stateless and jit/scan-friendly (timesteps enter as traced
int32 indices into the tables).

Key CogVideoX quirks preserved:
  * scaled-linear betas: linspace(beta_start**0.5, beta_end**0.5)**2
  * SNR shift:  a' = a / (s + (1-s)*a)  with s = snr_shift_scale
  * zero-terminal-SNR rescale of sqrt(alphas_cumprod)
  * DDIM step uses the CogVideoX a_t/b_t re-parameterisation
  * DPM step is the SDE-DPM-Solver++(2M) two-sample recursion carrying
    `old_pred_original_sample` across steps
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig


def _compute_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule {cfg.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)

    # SNR shift (CogVideoX)
    s = cfg.snr_shift_scale
    alphas_cumprod = alphas_cumprod / (s + (1.0 - s) * alphas_cumprod)

    if cfg.rescale_betas_zero_snr:
        ab_sqrt = np.sqrt(alphas_cumprod)
        a0, aT = ab_sqrt[0], ab_sqrt[-1]
        ab_sqrt = (ab_sqrt - aT) * (a0 / (a0 - aT))
        alphas_cumprod = ab_sqrt ** 2
    return alphas_cumprod


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Immutable schedule tables. `alphas_cumprod`: [num_train_timesteps]."""
    config: SchedulerConfig
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: float

    @classmethod
    def create(cls, config: SchedulerConfig = SchedulerConfig()) -> "Schedule":
        ac = _compute_alphas_cumprod(config)
        final = 1.0 if config.set_alpha_to_one else float(ac[0])
        return cls(config=config, alphas_cumprod=jnp.asarray(ac, jnp.float32),
                   final_alpha_cumprod=final)

    # ------------------------------------------------------------------ #
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending int timestep sequence (static, host-side)."""
        n = self.config.num_train_timesteps
        spacing = self.config.timestep_spacing
        if spacing == "trailing":
            step = n / num_inference_steps
            ts = (np.arange(n, 0, -step).round().astype(np.int64) - 1)
        elif spacing == "linspace":
            ts = np.linspace(0, n - 1, num_inference_steps).round().astype(np.int64)[::-1]
        elif spacing == "leading":
            step = n // num_inference_steps
            ts = (np.arange(num_inference_steps) * step).round().astype(np.int64)[::-1]
            ts = ts + getattr(self.config, "steps_offset", 0)
        else:
            raise ValueError(spacing)
        return ts.copy()

    def _alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod[t] with t==-1 (or any negative) -> final_alpha."""
        safe = jnp.clip(t, 0, self.config.num_train_timesteps - 1)
        a = self.alphas_cumprod[safe]
        return jnp.where(t < 0, jnp.float32(self.final_alpha_cumprod), a)

    # --------------------------- training ----------------------------- #
    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        a = self._alpha(t).astype(jnp.float32)
        a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        return (jnp.sqrt(a) * sample.astype(jnp.float32)
                + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)).astype(sample.dtype)

    def get_velocity(self, model_output_or_noise: jnp.ndarray,
                     sample: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v = sqrt(a)*noise - sqrt(1-a)*sample (v-prediction target/transform).

        The reference calls `scheduler.get_velocity(model_output,
        noisy_latents, t)` (`train.py:1509`) to map the network output into
        x0-comparable space; the math is symmetric so one function serves both.
        """
        a = self._alpha(t).astype(jnp.float32)
        a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        return (jnp.sqrt(a) * model_output_or_noise.astype(jnp.float32)
                - jnp.sqrt(1.0 - a) * sample.astype(jnp.float32))

    def loss_weight(self, t: jnp.ndarray) -> jnp.ndarray:
        """Reference SNR-style weight 1/(1 - alphas_cumprod[t]) (`train.py:1511`)."""
        return 1.0 / (1.0 - self._alpha(t))

    # --------------------------- inference ---------------------------- #
    def _pred_x0_v(self, sample: jnp.ndarray, model_output: jnp.ndarray,
                   alpha_prod_t: jnp.ndarray) -> jnp.ndarray:
        """x0 from a v-prediction output (the only mode the reference uses)."""
        return (jnp.sqrt(alpha_prod_t) * sample
                - jnp.sqrt(1.0 - alpha_prod_t) * model_output)

    def ddim_step(self, model_output: jnp.ndarray, t: jnp.ndarray,
                  prev_t: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
        """CogVideoX DDIM update (a_t/b_t form, eta=0)."""
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        a_t_ = self._alpha(t)
        a_prev = self._alpha(prev_t)
        x0 = self._pred_x0_v(sample, model_output, a_t_)
        a_t = jnp.sqrt((1.0 - a_prev) / (1.0 - a_t_))
        b_t = jnp.sqrt(a_prev) - jnp.sqrt(a_t_) * a_t
        return a_t * sample + b_t * x0

    def dpm_step(
        self,
        model_output: jnp.ndarray,
        old_pred_original_sample: Optional[jnp.ndarray],
        t: jnp.ndarray,
        t_back: Optional[jnp.ndarray],
        prev_t: jnp.ndarray,
        sample: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """SDE-DPM-Solver++(2M) step.

        Returns (prev_sample, pred_original_sample).  The caller carries
        `pred_original_sample` into the next step as
        `old_pred_original_sample` and passes the previous loop timestep as
        `t_back` (reference `pipeline_bindyouravatar.py:936-947`).

        Scan-friendly variant: when `t_back`/`old_pred` are provided but the
        step is logically first-order (first iteration), pass `t_back=None`
        by giving `old_pred_original_sample=None`, or use `first` masking via
        `jnp.where` outside.
        """
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        a_t = self._alpha(t)
        a_prev = self._alpha(prev_t)
        x0 = self._pred_x0_v(sample, model_output, a_t)

        lamb = jnp.log(jnp.sqrt(a_t / (1.0 - a_t)))
        lamb_next = jnp.log(jnp.sqrt(a_prev / (1.0 - a_prev)))
        h = lamb_next - lamb

        mult1 = jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) * jnp.exp(-h)
        mult2 = jnp.expm1(-2.0 * h) * jnp.sqrt(a_prev)
        mult_noise = jnp.sqrt(1.0 - a_prev) * jnp.sqrt(1.0 - jnp.exp(-2.0 * h))
        if noise is None:
            noise = jnp.zeros_like(sample)

        prev_first = mult1 * sample - mult2 * x0 + mult_noise * noise

        if old_pred_original_sample is None or t_back is None:
            return prev_first, x0

        a_back = self._alpha(t_back)
        lamb_prev = jnp.log(jnp.sqrt(a_back / (1.0 - a_back)))
        h_last = lamb - lamb_prev
        r = h_last / h
        mult3 = 1.0 + 1.0 / (2.0 * r)
        mult4 = 1.0 / (2.0 * r)
        denoised_d = mult3 * x0 - mult4 * old_pred_original_sample.astype(jnp.float32)
        prev_second = mult1 * sample - mult2 * denoised_d + mult_noise * noise

        # prev_t < 0 (last step) falls back to first-order (reference behavior)
        prev = jnp.where(prev_t < 0, prev_first, prev_second)
        return prev, x0

    def dpm_step_scan(
        self,
        model_output: jnp.ndarray,
        old_pred: jnp.ndarray,
        t: jnp.ndarray,
        t_back: jnp.ndarray,
        prev_t: jnp.ndarray,
        sample: jnp.ndarray,
        second_order: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """`dpm_step` for use inside `lax.scan`: `old_pred` is always an
        array (zeros on the first step) and `second_order` (bool scalar)
        masks the multistep branch on step 0."""
        prev2, x0 = self.dpm_step(model_output, old_pred, t, t_back, prev_t,
                                  sample, noise)
        prev1, _ = self.dpm_step(model_output, None, t, None, prev_t,
                                 sample, noise)
        return jnp.where(second_order, prev2, prev1), x0
