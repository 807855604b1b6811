"""EDM DPM-Solver++ (2M) scheduler — playground-v2.5's default sampler.

Parity target: diffusers EDMDPMSolverMultistepScheduler, needed for the
playground-v2.5 checkpoint exercised by the reference SDXL trial notebook
(reference play_sdxl_trial.ipynb; the EDM latents mean/std denormalization
lives in pipeline_interpolated_sdxl.py:2359-2385 and is handled by
engine.decode_latents).

EDM preconditioning (Karras et al., arXiv:2206.00364):
  c_in  = 1 / sqrt(sigma^2 + sigma_data^2)        (scale_model_input)
  c_skip = sigma_data^2 / (sigma^2 + sigma_data^2)
  c_out  = sigma * sigma_data / sqrt(sigma^2 + sigma_data^2)
  x0_hat = c_skip * x + c_out * F(c_in * x, c_noise)

DPM-Solver++ 2M in sigma space (alpha == 1, lambda = -log sigma), midpoint
second-order update, first-order on the first and final steps. Branch-free
order selection like aid_tpu.schedulers.unipc.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class EDMDPMState(NamedTuple):
    timesteps: jnp.ndarray  # (n,) c_noise values fed to the model
    sigmas: jnp.ndarray  # (n+1,) descending, final ~0
    m_prev: jnp.ndarray  # previous x0 prediction
    num_inference_steps: int
    init_noise_sigma: float


@dataclasses.dataclass(frozen=True)
class EDMDPMSolverScheduler:
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction" (EDM F-pred forms)

    def init(self, num_inference_steps: int, latent_shape=None) -> EDMDPMState:
        if latent_shape is None:
            latent_shape = (1,)
        n = num_inference_steps
        ramp = np.linspace(0, 1, n)
        smin_r, smax_r = self.sigma_min ** (1 / self.rho), self.sigma_max ** (1 / self.rho)
        sigmas = (smax_r + ramp * (smin_r - smax_r)) ** self.rho
        c_noise = 0.25 * np.log(sigmas)
        sigmas = np.concatenate([sigmas, [1e-10]])  # final boundary (clamped 0)
        return EDMDPMState(
            timesteps=jnp.asarray(c_noise, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            m_prev=jnp.zeros(latent_shape, jnp.float32),
            num_inference_steps=n,
            init_noise_sigma=float((sigmas[0] ** 2 + 1.0) ** 0.5),
        )

    def scale_model_input(self, state: EDMDPMState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        sigma = state.sigmas[step_index]
        return sample / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def _x0(self, state, model_output, i, sample):
        sigma = state.sigmas[i]
        sd = self.sigma_data
        if self.prediction_type == "epsilon":
            c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
            c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        elif self.prediction_type == "v_prediction":
            c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
            c_out = -sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        else:
            raise ValueError(self.prediction_type)
        return c_skip * sample + c_out * model_output

    def step(
        self,
        state: EDMDPMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float = 0.0,
        noise_rng: Optional[jax.Array] = None,
    ):
        i = step_index
        x = sample.astype(jnp.float32)
        m0 = self._x0(state, model_output.astype(jnp.float32), i, x)

        sig = state.sigmas
        lam = -jnp.log(sig)  # alpha == 1 in sigma space
        s_t, s_s0 = sig[i + 1], sig[i]
        h = lam[i + 1] - lam[i]
        ratio = s_t / s_s0
        phi = jnp.expm1(-h)

        # first order: x_t = ratio * x - phi * m0
        first = ratio * x - phi * m0
        # 2M midpoint: D1 = (m0 - m1)/r0, r0 = h_0/h
        h_0 = lam[i] - lam[jnp.maximum(i - 1, 0)]
        r0 = h_0 / jnp.where(jnp.abs(h) < 1e-12, 1e-12, h)
        r0 = jnp.where(jnp.abs(r0) < 1e-12, 1e-12, r0)
        D1 = (m0 - state.m_prev) / r0
        second = first - 0.5 * phi * D1

        n = state.num_inference_steps
        use_second = (i >= 1) & (i < n - 1)
        prev = jnp.where(use_second, second, first)

        return prev.astype(sample.dtype), state._replace(m_prev=m0)

    def add_noise(self, state: EDMDPMState, original, noise, step_index):
        sigma = state.sigmas[step_index]
        return original + noise * sigma
