"""PNDM (PLMS) scheduler, functional, scan-friendly.

Parity target: diffusers PNDMScheduler with ``skip_prk_steps=True`` — the
configuration every Stable-Diffusion-family checkpoint ships (including the
reference's own notebook checkpoints: play_sd.ipynb loads
SG161222/Realistic_Vision_V4.0_noVAE and Yntec/YiffyMix, whose scheduler
configs pin PNDMScheduler; the reference pipeline accepts whatever
from_pretrained instantiates, pipeline_interpolated_sd.py:334).

Algorithm (Liu et al., "Pseudo Numerical Methods for Diffusion Models",
ICLR 2022): linear-multistep (Adams–Bashforth) epsilon extrapolation over
the last <=4 model outputs, transferred with the DDIM update rule. The
skip-PRK variant replaces the Runge–Kutta warmup with one Heun-style
corrector at the first step, so ``n`` nominal inference steps run ``n+1``
UNet evaluations: the timestep array duplicates its second entry and the
second evaluation re-advances the STASHED first sample with the average of
the first two epsilons.

TPU redesign: diffusers keeps the multistep history in a Python list and
the warmup in data-dependent branches; here the history is a fixed-shape
(4, *latent) ring buffer carried through the scheduler state and the
order/warmup selection is a chain of traced ``jnp.where`` on the loop
index, so the whole denoise loop jits and scans (the loop index doubles as
the PLMS counter — it is global across chunked ``denoise_steps`` segments,
which is exactly the semantics the stateful counter had).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.schedulers.base import SchedulerConfig, make_betas, spaced_timesteps


class PNDMState(NamedTuple):
    timesteps: jnp.ndarray  # (n+1,) int32 descending, second entry duplicated
    alphas_cumprod: jnp.ndarray  # (T,) float32
    final_alpha_cumprod: jnp.ndarray  # scalar
    ets: jnp.ndarray  # (4, *latent) f32 epsilon history, newest at index 3
    cur_sample: jnp.ndarray  # (*latent) f32 stash for the first-step corrector
    num_inference_steps: int  # static: the NOMINAL step count n (loop runs n+1)
    init_noise_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class PNDMScheduler:
    config: SchedulerConfig = SchedulerConfig()
    skip_prk_steps: bool = True

    def init(self, num_inference_steps: int, latent_shape=None) -> PNDMState:
        if not self.skip_prk_steps:
            raise NotImplementedError(
                "PNDM Runge-Kutta warmup (skip_prk_steps=False) is not "
                "implemented: every SD-family checkpoint config pins "
                "skip_prk_steps=True, and the reference never exercises PRK")
        if latent_shape is None:
            latent_shape = (1,)
        cfg = self.config
        betas = make_betas(cfg)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if cfg.set_alpha_to_one else alphas_cumprod[0]
        ds = spaced_timesteps(cfg, num_inference_steps)
        # skip-PRK timestep array: duplicate the SECOND descending entry —
        # the corrector evaluates the model once more at t_1 before
        # re-advancing the stashed first sample from t_0 to t_1
        ts = np.concatenate([ds[:1], ds[1:2], ds[1:]])
        zeros = jnp.zeros(latent_shape, jnp.float32)
        return PNDMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            final_alpha_cumprod=jnp.asarray(final, jnp.float32),
            ets=jnp.zeros((4,) + tuple(latent_shape), jnp.float32),
            cur_sample=zeros,
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: PNDMState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        return sample

    def step(
        self,
        state: PNDMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float = 0.0,  # accepted for engine-signature parity; PNDM is ODE-only
        noise_rng: Optional[jax.Array] = None,
    ):
        """One PLMS step. ``step_index`` is the global loop index over the
        (n+1)-length timestep array; it doubles as the PLMS counter."""
        cfg = self.config
        i = step_index
        t = state.timesteps[i]
        dt = cfg.num_train_timesteps // state.num_inference_steps

        x = sample.astype(jnp.float32)
        eps_in = model_output.astype(jnp.float32)

        # epsilon history: appended every step EXCEPT the corrector (i == 1)
        is_fix = i == 1
        appended = jnp.roll(state.ets, -1, axis=0).at[3].set(eps_in)
        ets = jnp.where(is_fix, state.ets, appended)
        e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
        # history length after the (conditional) append, derived from i:
        # i=0 -> 1, i=1 -> 1 (no append), i>=2 -> min(i, 4)
        count = jnp.clip(jnp.maximum(i, 1), 1, 4)

        # Adams–Bashforth extrapolation by order (warmup ramp):
        c1 = (eps_in + e1) / 2.0  # corrector: average with the stashed eps
        c2 = (3.0 * e1 - e2) / 2.0
        c3 = (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0
        c4 = (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0
        mo = jnp.where(
            i == 0, e1,
            jnp.where(is_fix, c1,
                      jnp.where(count == 2, c2,
                                jnp.where(count == 3, c3, c4))))

        # the corrector re-advances the stashed first sample over the SAME
        # (t_0 -> t_1) interval; every other step advances t -> t - dt
        x_eff = jnp.where(is_fix, state.cur_sample, x)
        t_eff = jnp.where(is_fix, t + dt, t)
        prev_t = jnp.where(is_fix, t, t - dt)
        cur_sample = jnp.where(i == 0, x, state.cur_sample)

        a_t = state.alphas_cumprod[t_eff]
        a_prev = jnp.where(prev_t >= 0,
                           state.alphas_cumprod[jnp.maximum(prev_t, 0)],
                           state.final_alpha_cumprod)
        b_t = 1.0 - a_t
        if cfg.prediction_type == "v_prediction":
            mo = jnp.sqrt(a_t) * mo + jnp.sqrt(b_t) * x_eff
        elif cfg.prediction_type != "epsilon":
            raise ValueError(
                f"PNDM supports epsilon/v_prediction, got {cfg.prediction_type}")
        # DDIM transfer in the PNDM paper's denominator form (equation 9;
        # algebraically identical to sqrt(a_prev)*x0 + sqrt(1-a_prev)*eps)
        denom = a_t * jnp.sqrt(1.0 - a_prev) + jnp.sqrt(a_t * b_t * a_prev)
        prev = jnp.sqrt(a_prev / a_t) * x_eff - (a_prev - a_t) * mo / denom

        new_state = state._replace(ets=ets, cur_sample=cur_sample)
        return prev.astype(sample.dtype), new_state

    def add_noise(self, state: PNDMState, original: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        a = state.alphas_cumprod[t]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise
