"""UniPC and Euler scheduler tests (perfect-model convergence oracles)."""

import jax.numpy as jnp
import numpy as np

from aid_tpu.schedulers import EulerDiscreteScheduler, SchedulerConfig, UniPCScheduler


def _perfect_denoise(sch, n, shape=(1, 4, 4, 4), seed=0, sigma_param=False):
    """Run a full loop with a perfect epsilon model; return (final, x0)."""
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    state = sch.init(n, latent_shape=shape)

    if sigma_param:
        x = x0 + noise * state.sigmas[0]
    else:
        a0 = state.alphas[0] if hasattr(state, "alphas") else None
        x = a0 * x0 + jnp.sqrt(1 - a0 ** 2) * noise

    for i in range(n):
        if sigma_param:
            sigma = state.sigmas[i]
            x_in = sch.scale_model_input(state, x, i)
            eps = (x - x0) / sigma
            x, state = sch.step(state, eps, jnp.asarray(i), x)
        else:
            a, s = state.alphas[i], state.sigmas[i]
            eps = (x - a * x0) / s
            x, state = sch.step(state, eps, jnp.asarray(i), x)
    return np.asarray(x), np.asarray(x0)


def test_unipc_perfect_model_recovers_x0():
    sch = UniPCScheduler()
    final, x0 = _perfect_denoise(sch, 10)
    np.testing.assert_allclose(final, x0, rtol=1e-3, atol=1e-3)


def test_unipc_few_steps_still_converges():
    sch = UniPCScheduler()
    final, x0 = _perfect_denoise(sch, 5)
    np.testing.assert_allclose(final, x0, rtol=5e-3, atol=5e-3)


def test_unipc_in_pipeline():
    import dataclasses
    from helpers import tiny_pipeline

    pipe = tiny_pipeline()
    pipe = dataclasses.replace(pipe, scheduler=UniPCScheduler())
    out = pipe.interpolate_single(0.5, prompt_start="a", prompt_end="b", num_inference_steps=4)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_euler_perfect_model_recovers_x0():
    sch = EulerDiscreteScheduler()
    final, x0 = _perfect_denoise(sch, 50, sigma_param=True)
    # Euler is first-order; tolerance is loose but must be in the ballpark
    np.testing.assert_allclose(final, x0, rtol=0.05, atol=0.05)


def test_euler_in_pipeline():
    import dataclasses
    from helpers import tiny_pipeline

    pipe = tiny_pipeline()
    pipe = dataclasses.replace(pipe, scheduler=EulerDiscreteScheduler())
    out = pipe.interpolate_single(0.5, prompt_start="a", prompt_end="b", num_inference_steps=4)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_euler_init_noise_sigma():
    sch = EulerDiscreteScheduler()
    state = sch.init(10)
    # leading/trailing spacing: init sigma = sqrt(sigma_0^2 + 1)
    want = float(np.sqrt(float(state.sigmas[0]) ** 2 + 1.0))
    assert abs(state.init_noise_sigma - want) < 1e-6
    # linspace spacing reaches t=999 -> SD sigma_max ~ 14.6
    sch2 = EulerDiscreteScheduler(SchedulerConfig(timestep_spacing="linspace"))
    state2 = sch2.init(10)
    assert 14.0 < state2.init_noise_sigma < 15.0


class TestEDMDPM:
    def test_perfect_model_recovers_x0(self):
        from aid_tpu.schedulers import EDMDPMSolverScheduler

        sch = EDMDPMSolverScheduler()
        n = 15
        shape = (1, 4, 4, 4)
        state = sch.init(n, latent_shape=shape)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.5
        noise = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        x = x0 + noise * state.sigmas[0]
        sd = sch.sigma_data
        for i in range(n):
            sigma = state.sigmas[i]
            # perfect EDM F: x0 = c_skip*x + c_out*F  =>  F = (x0 - c_skip*x)/c_out
            c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
            c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
            F = (x0 - c_skip * x) / c_out
            x, state = sch.step(state, F, jnp.asarray(i), x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)

    def test_in_pipeline(self):
        import dataclasses
        from helpers import tiny_pipeline
        from aid_tpu.schedulers import EDMDPMSolverScheduler

        pipe = tiny_pipeline()
        pipe = dataclasses.replace(pipe, scheduler=EDMDPMSolverScheduler())
        out = pipe.interpolate_single(0.5, prompt_start="a", prompt_end="b", num_inference_steps=4)
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()
