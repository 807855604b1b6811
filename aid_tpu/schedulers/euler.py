"""Euler discrete scheduler (sigma parameterization), functional.

Parity target: diffusers EulerDiscreteScheduler — the default scheduler of
the SDXL checkpoints the reference supports (README.md:175-184). Karras
sigmas optional. Deterministic Euler step (the reference never uses
ancestral noise).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.schedulers.base import SchedulerConfig, make_betas, spaced_timesteps


class EulerState(NamedTuple):
    timesteps: jnp.ndarray  # (n,)
    sigmas: jnp.ndarray  # (n+1,) descending, final 0
    num_inference_steps: int
    init_noise_sigma: float


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    config: SchedulerConfig = SchedulerConfig(timestep_spacing="leading")
    use_karras_sigmas: bool = False

    def init(self, num_inference_steps: int, latent_shape=None) -> EulerState:
        cfg = self.config
        betas = make_betas(cfg)
        acp = np.cumprod(1.0 - betas)
        all_sigmas = np.sqrt((1.0 - acp) / acp)
        ts = spaced_timesteps(cfg, num_inference_steps).astype(np.float64)
        sigmas = np.interp(ts, np.arange(len(all_sigmas)), all_sigmas)
        if self.use_karras_sigmas:
            rho = 7.0
            smin, smax = sigmas[-1], sigmas[0]
            ramp = np.linspace(0, 1, num_inference_steps)
            sigmas = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
            ts = np.array([self._sigma_to_t(s, np.log(all_sigmas)) for s in sigmas])
        sigmas = np.concatenate([sigmas, [0.0]])
        # diffusers EulerDiscreteScheduler.init_noise_sigma: max_sigma for
        # "linspace"/"trailing"; sqrt(max^2 + 1) only for "leading"
        init_sigma = float(np.sqrt(sigmas[0] ** 2 + 1)) if cfg.timestep_spacing == "leading" else float(sigmas.max())
        return EulerState(
            timesteps=jnp.asarray(ts, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            num_inference_steps=num_inference_steps,
            init_noise_sigma=init_sigma,
        )

    @staticmethod
    def _sigma_to_t(sigma, log_sigmas):
        log_sigma = np.log(max(sigma, 1e-10))
        dists = log_sigma - log_sigmas
        low_idx = np.clip((dists >= 0).cumsum(0).argmax(), 0, len(log_sigmas) - 2)
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        return (1 - w) * low_idx + w * high_idx

    def scale_model_input(self, state: EulerState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        sigma = state.sigmas[step_index]
        return sample / jnp.sqrt(sigma ** 2 + 1.0)

    def step(
        self,
        state: EulerState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float = 0.0,
        noise_rng: Optional[jax.Array] = None,
    ):
        cfg = self.config
        sigma = state.sigmas[step_index]
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        if cfg.prediction_type == "epsilon":
            pred_x0 = x - sigma * out
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = out * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + (x / (sigma ** 2 + 1))
        elif cfg.prediction_type == "sample":
            pred_x0 = out
        else:
            raise ValueError(cfg.prediction_type)
        derivative = (x - pred_x0) / sigma
        dt = state.sigmas[step_index + 1] - sigma
        prev = x + derivative * dt
        return prev.astype(sample.dtype), state

    def add_noise(self, state: EulerState, original, noise, step_index):
        sigma = state.sigmas[step_index]
        return original + noise * sigma
