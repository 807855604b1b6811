"""Unit tests for lerp/slerp/beta schedules (SURVEY.md §4 'Unit')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import beta as beta_dist

from aid_tpu.ops import (
    lerp,
    slerp,
    linear_interpolation,
    spherical_interpolation,
    generate_beta_schedule,
)


def _np_slerp_row(v0, v1, t, threshold=0.9995):
    """Independent numpy oracle for guarded slerp on a single 1-D vector."""
    n0, n1 = np.linalg.norm(v0), np.linalg.norm(v1)
    dot = np.dot(v0 / n0, v1 / n1)
    if np.isnan(abs(dot)) or abs(dot) > threshold:
        return v0 + t * (v1 - v0)
    theta0 = np.arccos(np.clip(dot, -1, 1))
    s0 = np.sin(theta0 - theta0 * t) / np.sin(theta0)
    s1 = np.sin(theta0 * t) / np.sin(theta0)
    return s0 * v0 + s1 * v1


class TestLerp:
    def test_endpoints(self):
        a = jnp.arange(6.0).reshape(2, 3)
        b = a + 10.0
        np.testing.assert_allclose(lerp(a, b, 0.0), a)
        np.testing.assert_allclose(lerp(a, b, 1.0), b)
        np.testing.assert_allclose(lerp(a, b, 0.25), a + 2.5)


class TestSlerp:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        v0 = rng.normal(size=(4, 16)).astype(np.float32)
        v1 = rng.normal(size=(4, 16)).astype(np.float32)
        for t in [0.0, 0.3, 0.5, 0.9, 1.0]:
            got = np.asarray(slerp(jnp.asarray(v0), jnp.asarray(v1), t))
            want = np.stack([_np_slerp_row(v0[i], v1[i], t) for i in range(4)])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_colinear_falls_back_to_lerp(self):
        v0 = jnp.ones((2, 8))
        v1 = 2.0 * jnp.ones((2, 8))  # same direction -> dot == 1 -> lerp
        got = slerp(v0, v1, 0.5)
        np.testing.assert_allclose(got, 1.5 * jnp.ones((2, 8)), rtol=1e-6)

    def test_zero_vector_falls_back_to_lerp(self):
        v0 = jnp.zeros((1, 4))
        v1 = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        got = slerp(v0, v1, 0.5)
        assert not np.any(np.isnan(np.asarray(got)))
        np.testing.assert_allclose(got, 0.5 * v1, rtol=1e-6)

    def test_jit_and_grad_safe(self):
        v0 = jnp.array([[1.0, 0.0]])
        v1 = jnp.array([[0.0, 1.0]])
        out = jax.jit(slerp)(v0, v1, 0.5)
        # 90-degree slerp at t=0.5 is the normalized diagonal.
        np.testing.assert_allclose(np.asarray(out), np.ones((1, 2)) / np.sqrt(2), rtol=1e-5)

    def test_orthogonal_preserves_norm(self):
        rng = np.random.default_rng(1)
        v0 = rng.normal(size=(32,)).astype(np.float32)
        v1 = rng.normal(size=(32,)).astype(np.float32)
        v1 -= v0 * (v1 @ v0) / (v0 @ v0)
        v0 /= np.linalg.norm(v0)
        v1 /= np.linalg.norm(v1)
        for t in [0.2, 0.5, 0.8]:
            out = np.asarray(slerp(jnp.asarray(v0), jnp.asarray(v1), t))
            np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-5)


class TestBatchedInterp:
    def test_linear_interpolation_uniform(self):
        l1 = jnp.zeros((1, 3))
        l2 = jnp.ones((1, 3)) * 4
        out = linear_interpolation(l1, l2, size=5)
        assert out.shape == (5, 3)
        np.testing.assert_allclose(out[:, 0], [0, 1, 2, 3, 4], rtol=1e-6)

    def test_linear_interpolation_custom_ts(self):
        l1 = jnp.zeros((1, 2))
        l2 = jnp.ones((1, 2))
        out = linear_interpolation(l1, l2, ts=jnp.array([0.1, 0.9]))
        assert out.shape == (2, 2)
        np.testing.assert_allclose(out[:, 0], [0.1, 0.9], rtol=1e-6)

    def test_spherical_interpolation_shape_and_endpoints(self):
        rng = np.random.default_rng(2)
        l1 = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        l2 = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        out = spherical_interpolation(l1, l2, size=5)
        assert out.shape == (5, 4, 8)
        np.testing.assert_allclose(out[0], l1[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[-1], l2[0], rtol=1e-5, atol=1e-6)


class TestBetaSchedule:
    def test_uniform_when_alpha_beta_one(self):
        ts = generate_beta_schedule(5, 1.0, 1.0)
        np.testing.assert_allclose(ts, [0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)

    def test_cdf_inverse_property(self):
        size, a, b = 7, 3.0, 5.0
        ts = generate_beta_schedule(size, a, b)
        qs = beta_dist.cdf(ts, a, b)
        np.testing.assert_allclose(qs, np.linspace(0, 1, size), atol=1e-5)

    def test_endpoints(self):
        ts = generate_beta_schedule(9, 2.5, 7.0, force_endpoints=True)
        assert ts[0] == 0.0 and ts[-1] == 1.0
        assert np.all(np.diff(ts) > 0)

    def test_symmetry(self):
        ts = generate_beta_schedule(9, 4.0, 4.0)
        np.testing.assert_allclose(ts, 1.0 - ts[::-1], atol=1e-6)
