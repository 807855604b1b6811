"""DDIM scheduler tests vs an independent numpy oracle of the DDIM paper
equations (arXiv:2010.02502 eq. 12, eta=0)."""

import jax.numpy as jnp
import numpy as np

from aid_tpu.schedulers.base import SchedulerConfig, make_betas, spaced_timesteps
from aid_tpu.schedulers.ddim import DDIMScheduler


def test_timesteps_leading_spacing():
    cfg = SchedulerConfig()
    ts = spaced_timesteps(cfg, 25)
    assert len(ts) == 25
    assert ts[0] == 960 + 1 and ts[-1] == 0 + 1  # leading spacing + steps_offset
    assert np.all(np.diff(ts) < 0)


def test_ddim_step_matches_numpy_oracle():
    sch = DDIMScheduler()
    n = 10
    state = sch.init(n)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)

    betas = make_betas(sch.config)
    acp = np.cumprod(1 - betas)
    ts = spaced_timesteps(sch.config, n)

    for i in [0, 4, 9]:
        t = int(ts[i])
        prev_t = t - sch.config.num_train_timesteps // n
        a_t = acp[t]
        a_prev = acp[prev_t] if prev_t >= 0 else acp[0]  # set_alpha_to_one=False
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps

        got, _ = sch.step(state, jnp.asarray(eps), jnp.asarray(i), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_full_denoise_converges_for_known_target():
    """With a perfect eps model (knows the true x0), DDIM must recover x0.

    set_alpha_to_one=True so the final step maps exactly onto x0 (with the
    SD default False, alpha_prod_final = alphas_cumprod[0] < 1 and the
    output intentionally keeps ~sqrt(1-acp[0]) noise)."""
    sch = DDIMScheduler(SchedulerConfig(set_alpha_to_one=True))
    n = 20
    state = sch.init(n)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))

    t0 = state.timesteps[0]
    x = sch.add_noise(state, x0, noise, t0)
    for i in range(n):
        t = state.timesteps[i]
        a_t = state.alphas_cumprod[t]
        eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)  # oracle model
        x, _ = sch.step(state, eps, jnp.asarray(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_v_prediction_roundtrip():
    cfg = SchedulerConfig(prediction_type="v_prediction", set_alpha_to_one=True)
    sch = DDIMScheduler(cfg)
    n = 20
    state = sch.init(n)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    t0 = state.timesteps[0]
    x = sch.add_noise(state, x0, noise, t0)
    for i in range(n):
        t = state.timesteps[i]
        a_t = state.alphas_cumprod[t]
        eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        # v := sqrt(a) * eps - sqrt(1-a) * x0
        v = jnp.sqrt(a_t) * eps - jnp.sqrt(1 - a_t) * x0
        x, _ = sch.step(state, v, jnp.asarray(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


class TestEulerInitNoiseSigma:
    """diffusers parity (review r3c): init_noise_sigma is max_sigma for
    linspace/trailing and sqrt(max^2+1) only for leading."""

    def _sigma0(self, spacing):
        import dataclasses

        from aid_tpu.schedulers import EulerDiscreteScheduler, SchedulerConfig

        s = EulerDiscreteScheduler(SchedulerConfig(timestep_spacing=spacing))
        st = s.init(10)
        return float(st.sigmas[0]), st.init_noise_sigma

    def test_leading_uses_sqrt(self):
        s0, init = self._sigma0("leading")
        assert abs(init - (s0 ** 2 + 1) ** 0.5) < 1e-5

    def test_trailing_uses_max(self):
        s0, init = self._sigma0("trailing")
        assert abs(init - s0) < 1e-5

    def test_linspace_uses_max(self):
        s0, init = self._sigma0("linspace")
        assert abs(init - s0) < 1e-5


def test_loader_reads_use_karras_sigmas(tmp_path):
    import json as _json

    from aid_tpu.models.loader import load_scheduler

    (tmp_path / "scheduler").mkdir()
    with open(tmp_path / "scheduler" / "scheduler_config.json", "w") as f:
        _json.dump({"_class_name": "EulerDiscreteScheduler",
                    "use_karras_sigmas": True}, f)
    s = load_scheduler(str(tmp_path), "auto")
    assert s.use_karras_sigmas is True
