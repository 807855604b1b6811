"""UniPC multistep predictor-corrector scheduler, functional & scan-friendly.

Parity target: diffusers UniPCMultistepScheduler (reference
gradio_src/pipeline_interpolated_stable_diffusion.py:64-67 offers
scheduler_name="unipc"), solver bh2, solver_order 2, predict_x0,
lower_order_final — the defaults the reference exercises.

TPU redesign: the per-step order selection and warmup bookkeeping of the
torch implementation are data-dependent Python; here they become traced
index predicates (order-1 vs order-2 results blended by jnp.where), and
the model-output history is two fixed-shape slots carried through the
scheduler state, so the whole loop jits.

Note: the final boundary sigma is 1e-10 instead of exactly 0 (diffusers
final_sigmas_type="zero") to keep lambda = log(alpha/sigma) finite inside
branch-free arithmetic; the effect on the final step is O(1e-10).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.schedulers.base import SchedulerConfig, make_betas


class UniPCState(NamedTuple):
    timesteps: jnp.ndarray  # (n,)
    lambdas: jnp.ndarray  # (n+1,) log(alpha/sigma) per boundary
    alphas: jnp.ndarray  # (n+1,) alpha_t = sqrt(acp)
    sigmas: jnp.ndarray  # (n+1,) sigma_t = sqrt(1-acp)
    m_prev: jnp.ndarray  # x0 prediction at step i-1
    m_prev2: jnp.ndarray  # x0 prediction at step i-2
    last_sample: jnp.ndarray  # sample fed to the previous predictor
    num_inference_steps: int
    init_noise_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class UniPCScheduler:
    config: SchedulerConfig = SchedulerConfig(timestep_spacing="linspace")
    solver_order: int = 2  # order-2 bh2 (diffusers default)

    def init(self, num_inference_steps: int, latent_shape=None) -> UniPCState:
        if latent_shape is None:
            latent_shape = (1,)
        cfg = self.config
        betas = make_betas(cfg)
        acp = np.cumprod(1.0 - betas)
        T = cfg.num_train_timesteps
        n = num_inference_steps
        # diffusers UniPC spacing: linspace over [0, T-1] with n+1 points,
        # drop the first (t=0) boundary after reversing.
        ts = np.linspace(0, T - 1, n + 1).round()[::-1][:-1].astype(np.int64)
        alpha = np.sqrt(acp[ts])
        sigma = np.sqrt(1.0 - acp[ts])
        # final boundary: sigma -> 0 (clamped, see module docstring)
        alpha = np.concatenate([alpha, [1.0]])
        sigma = np.concatenate([sigma, [1e-10]])
        lam = np.log(alpha) - np.log(sigma)
        zeros = jnp.zeros(latent_shape, jnp.float32)
        return UniPCState(
            timesteps=jnp.asarray(ts, jnp.int32),
            lambdas=jnp.asarray(lam, jnp.float32),
            alphas=jnp.asarray(alpha, jnp.float32),
            sigmas=jnp.asarray(sigma, jnp.float32),
            m_prev=zeros,
            m_prev2=zeros,
            last_sample=zeros,
            num_inference_steps=n,
        )

    def scale_model_input(self, state: UniPCState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        return sample

    def _x0(self, state: UniPCState, model_output, i, sample):
        a, s = state.alphas[i], state.sigmas[i]
        if self.config.prediction_type == "epsilon":
            return (sample - s * model_output) / a
        if self.config.prediction_type == "v_prediction":
            return a * sample - s * model_output
        if self.config.prediction_type == "sample":
            return model_output
        raise ValueError(self.config.prediction_type)

    @staticmethod
    def _bh_coeffs(h):
        """(h_phi_1, B_h, b0, b1) for bh2, predict_x0 (hh = -h)."""
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        B_h = h_phi_1  # bh2
        # loop i=1..order: b_i = h_phi_k * factorial / B_h
        h_phi_2 = h_phi_1 / hh - 1.0
        b0 = h_phi_2 * 1.0 / B_h  # i=1
        h_phi_3 = h_phi_2 / hh - 0.5
        b1 = h_phi_3 * 2.0 / B_h  # i=2
        return h_phi_1, B_h, b0, b1

    def step(
        self,
        state: UniPCState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float = 0.0,
        noise_rng: Optional[jax.Array] = None,
    ):
        i = step_index
        x = sample.astype(jnp.float32)
        m_t = self._x0(state, model_output.astype(jnp.float32), i, x)

        lam = state.lambdas
        safe = lambda d: jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

        # ---- corrector (uni_c) over [i-1 -> i], order 1 at i==1 else 2 ----
        ic = jnp.maximum(i, 1)
        h_c = lam[ic] - lam[ic - 1]
        a_t_c, s_t_c = state.alphas[ic], state.sigmas[ic]
        s_s0_c = state.sigmas[ic - 1]
        h_phi_1_c, B_h_c, b0_c, b1_c = self._bh_coeffs(h_c)
        m0_c = state.m_prev
        x_t_base = s_t_c / s_s0_c * state.last_sample.astype(jnp.float32) - a_t_c * h_phi_1_c * m0_c
        D1_t = m_t - m0_c
        # order 1: rhos_c = [0.5] -> x_t_base - a*B_h*(0.5*D1_t)
        corr1 = x_t_base - a_t_c * B_h_c * (0.5 * D1_t)
        # order 2: rks = [r1, 1]; solve [[1,1],[r1,1]] rho = [b0, b1]
        r1_c = (lam[jnp.maximum(ic - 2, 0)] - lam[ic - 1]) / safe(h_c)
        r1_c = safe(r1_c)
        rho0 = (b0_c - b1_c) / (1.0 - r1_c)
        rho1 = b0_c - rho0
        D1_0_c = (state.m_prev2 - m0_c) / r1_c
        corr2 = x_t_base - a_t_c * B_h_c * (rho0 * D1_0_c + rho1 * D1_t)
        corrected = jnp.where(i >= 2, corr2, corr1)
        x = jnp.where(i >= 1, corrected, x)

        # ---- predictor (uni_p) over [i -> i+1] ----
        h = lam[i + 1] - lam[i]
        a_t, s_t = state.alphas[i + 1], state.sigmas[i + 1]
        s_s0 = state.sigmas[i]
        h_phi_1, B_h, b0, b1 = self._bh_coeffs(h)
        x_t_ = s_t / s_s0 * x - a_t * h_phi_1 * m_t
        # order 2 correction: rhos_p = [0.5], D1_0 = (m_prev - m_t)/r1
        r1 = (lam[jnp.maximum(i - 1, 0)] - lam[i]) / safe(h)
        r1 = safe(r1)
        D1_0 = (state.m_prev - m_t) / r1
        pred2 = x_t_ - a_t * B_h * 0.5 * D1_0
        n = state.num_inference_steps
        use_order2 = (i >= 1) & (i < n - 1)  # first step and final step: order 1
        prev = jnp.where(use_order2, pred2, x_t_)

        new_state = state._replace(m_prev=m_t, m_prev2=state.m_prev, last_sample=x)
        return prev.astype(sample.dtype), new_state

    def add_noise(self, state: UniPCState, original, noise, t):
        # t is a train timestep value; recompute alpha/sigma directly
        betas = make_betas(self.config)
        acp = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
        a = jnp.sqrt(acp[t])
        return a * original + jnp.sqrt(1.0 - acp[t]) * noise
