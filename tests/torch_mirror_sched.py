"""Numpy mirror of diffusers' CogVideoXDDIMScheduler / CogVideoXDPMScheduler.

The reference wires CogVideoXDPMScheduler at `infer.py:289` and steps it with
the two-sample carry at `models/pipeline_bindyouravatar.py:936-947`; training
uses `add_noise` / `get_velocity` (`train.py:1395,1509`).  diffusers is not
installed in this image, so this mirror re-implements those recursions
literally (float64, stateless) for cross-implementation parity tests against
`bindyouravatar_tpu.ops.scheduler.Schedule`.
"""

from __future__ import annotations

import numpy as np


class MirrorCogVideoXScheduler:
    """Shared tables + both step rules (v-prediction only, eta=0)."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, snr_shift_scale=3.0,
                 rescale_betas_zero_snr=True, set_alpha_to_one=True):
        self.num_train_timesteps = num_train_timesteps
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        ac = ac / (snr_shift_scale + (1.0 - snr_shift_scale) * ac)
        if rescale_betas_zero_snr:
            s = np.sqrt(ac)
            s0, sT = s[0].copy(), s[-1].copy()
            s = (s - sT) * (s0 / (s0 - sT))
            ac = s ** 2
        self.alphas_cumprod = ac
        self.final_alpha_cumprod = 1.0 if set_alpha_to_one else float(ac[0])

    # ------------------------------------------------------------ utils
    def set_timesteps(self, num_inference_steps):
        """timestep_spacing='trailing' (CogVideoX config)."""
        step = self.num_train_timesteps / num_inference_steps
        self.num_inference_steps = num_inference_steps
        self.timesteps = (np.round(np.arange(self.num_train_timesteps, 0,
                                             -step)).astype(np.int64) - 1)
        return self.timesteps

    def _alpha(self, t):
        return (self.alphas_cumprod[t] if t >= 0
                else self.final_alpha_cumprod)

    def _pred_x0(self, sample, model_output, a_t):
        return (a_t ** 0.5) * sample - ((1.0 - a_t) ** 0.5) * model_output

    # ------------------------------------------------------------ train
    def add_noise(self, original, noise, t):
        a = self._alpha(int(t))
        return (a ** 0.5) * original + ((1.0 - a) ** 0.5) * noise

    def get_velocity(self, noise, sample, t):
        a = self._alpha(int(t))
        return (a ** 0.5) * noise - ((1.0 - a) ** 0.5) * sample

    # ------------------------------------------------------------- DDIM
    def ddim_step(self, model_output, timestep, sample):
        """CogVideoXDDIMScheduler.step (a_t/b_t form, v-prediction)."""
        prev_t = timestep - self.num_train_timesteps // self.num_inference_steps
        a_t = self._alpha(timestep)
        a_prev = self._alpha(prev_t)
        x0 = self._pred_x0(sample, model_output, a_t)
        a_coef = ((1.0 - a_prev) / (1.0 - a_t)) ** 0.5
        b_coef = a_prev ** 0.5 - a_t ** 0.5 * a_coef
        return a_coef * sample + b_coef * x0

    # ------------------------------------------------------------- DPM
    def dpm_step(self, model_output, old_pred_original_sample, timestep,
                 timestep_back, sample, noise):
        """CogVideoXDPMScheduler.step: SDE-DPM-Solver++(2M) with the
        two-sample carry; `noise` passed explicitly (generator mirror)."""
        prev_t = timestep - self.num_train_timesteps // self.num_inference_steps
        a_t = np.float64(self._alpha(timestep))
        # terminal step: a_prev = 1.0 -> lamb_next = +inf; keep everything in
        # np.float64 so the infs propagate to 0-multipliers like torch does
        a_prev = np.float64(self._alpha(prev_t))
        x0 = self._pred_x0(sample, model_output, a_t)

        with np.errstate(divide="ignore"):
            lamb = np.log((a_t / (1.0 - a_t)) ** 0.5)
            lamb_next = np.log((a_prev / (1.0 - a_prev)) ** 0.5)
        h = lamb_next - lamb

        mult1 = ((1.0 - a_prev) / (1.0 - a_t)) ** 0.5 * np.exp(-h)
        mult2 = np.expm1(-2.0 * h) * a_prev ** 0.5
        mult_noise = (1.0 - a_prev) ** 0.5 * (1.0 - np.exp(-2.0 * h)) ** 0.5

        prev_sample = mult1 * sample - mult2 * x0 + mult_noise * noise

        if old_pred_original_sample is None or prev_t < 0:
            return prev_sample, x0

        a_back = np.float64(self._alpha(timestep_back))
        with np.errstate(divide="ignore"):
            lamb_back = np.log((a_back / (1.0 - a_back)) ** 0.5)
        r = (lamb - lamb_back) / h
        mult3 = 1.0 + 1.0 / (2.0 * r)
        mult4 = 1.0 / (2.0 * r)
        denoised_d = mult3 * x0 - mult4 * old_pred_original_sample
        prev_sample = mult1 * sample - mult2 * denoised_d + mult_noise * noise
        return prev_sample, x0
