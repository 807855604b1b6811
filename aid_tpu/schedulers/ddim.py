"""DDIM scheduler, functional, scan-friendly.

Parity target: diffusers DDIMScheduler as used by the reference (SD default
scheduler; gradio_src/pipeline_interpolated_stable_diffusion.py:60-63).
Deterministic (eta=0) path only — the reference pipelines always use
eta=0.0 (pipeline_interpolated_sd.py:1429 default) — plus optional eta
noise for completeness.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.schedulers.base import SchedulerConfig, make_betas, spaced_timesteps


class DDIMState(NamedTuple):
    timesteps: jnp.ndarray  # (n,) int32 descending
    alphas_cumprod: jnp.ndarray  # (T,) float32
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_inference_steps: int  # static
    init_noise_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    config: SchedulerConfig = SchedulerConfig()

    def init(self, num_inference_steps: int, latent_shape=None) -> DDIMState:
        cfg = self.config
        betas = make_betas(cfg)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if cfg.set_alpha_to_one else alphas_cumprod[0]
        ts = spaced_timesteps(cfg, num_inference_steps)
        return DDIMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            final_alpha_cumprod=jnp.asarray(final, jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: DDIMState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        return sample

    def step(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float = 0.0,
        noise_rng: Optional[jax.Array] = None,
    ):
        """One denoise step x_t -> x_{t-1}. step_index is a traced loop index."""
        cfg = self.config
        t = state.timesteps[step_index]
        prev_t = t - cfg.num_train_timesteps // state.num_inference_steps

        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)

        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)],
                                    state.final_alpha_cumprod)
        beta_prod_t = 1.0 - alpha_prod_t

        if cfg.prediction_type == "epsilon":
            pred_x0 = (x - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(alpha_prod_t)
            pred_eps = eps
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(alpha_prod_t) * x - jnp.sqrt(beta_prod_t) * eps
            pred_eps = jnp.sqrt(alpha_prod_t) * eps + jnp.sqrt(beta_prod_t) * x
        elif cfg.prediction_type == "sample":
            pred_x0 = eps
            pred_eps = (x - jnp.sqrt(alpha_prod_t) * pred_x0) / jnp.sqrt(beta_prod_t)
        else:
            raise ValueError(cfg.prediction_type)

        if cfg.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -cfg.clip_sample_range, cfg.clip_sample_range)
            pred_eps = (x - jnp.sqrt(alpha_prod_t) * pred_x0) / jnp.sqrt(beta_prod_t)

        if eta > 0.0:
            variance = (1 - alpha_prod_prev) / (1 - alpha_prod_t) * (1 - alpha_prod_t / alpha_prod_prev)
            std = eta * jnp.sqrt(variance)
        else:
            std = jnp.float32(0.0)

        dir_xt = jnp.sqrt(1.0 - alpha_prod_prev - std ** 2) * pred_eps
        prev = jnp.sqrt(alpha_prod_prev) * pred_x0 + dir_xt
        if eta > 0.0:
            assert noise_rng is not None, "eta > 0 requires noise_rng"
            prev = prev + std * jax.random.normal(noise_rng, prev.shape, jnp.float32)
        return prev.astype(sample.dtype), state

    def add_noise(self, state: DDIMState, original: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        a = state.alphas_cumprod[t]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise
