"""Interpolation math: lerp, numerically-guarded slerp, Beta-PPF schedules.

Behavioral parity targets (reference, /root/reference):
  * interpolation.py:807-835  linear_interpolation
  * interpolation.py:838-858  spherical_interpolation
  * interpolation.py:861-918  slerp (colinear / NaN fallback to lerp)
  * prior.py:481-503          generate_beta_tensor (Beta inverse-CDF schedule)

All tensor functions are pure jnp and jit/vmap-safe. The Beta PPF schedule is
computed on host with scipy (it parameterizes a compiled program; it is never
needed inside jit) and returned as a numpy array that callers close over as a
constant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.stats import beta as _beta_dist

#: |dot| above this means the vectors are treated as colinear and lerped.
SLERP_COLINEAR_THRESHOLD = 0.9995


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Linear interpolation ``a + t * (b - a)`` (torch.lerp semantics)."""
    return a + t * (b - a)


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t, threshold: float = SLERP_COLINEAR_THRESHOLD) -> jnp.ndarray:
    """Spherical linear interpolation over the last axis.

    Matches reference interpolation.py:861-918: rows whose normalized dot
    product is NaN (zero vectors) or has magnitude above ``threshold`` fall
    back to lerp; the rest take the great-circle path. Branch-free
    (jnp.where), so it is jit/vmap safe.
    """
    v0 = jnp.asarray(v0)
    v1 = jnp.asarray(v1)

    v0_norm = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1_norm = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v0_normed = v0 / v0_norm
    v1_normed = v1 / v1_norm

    dot = jnp.sum(v0_normed * v1_normed, axis=-1, keepdims=True)
    dot_mag = jnp.abs(dot)
    gotta_lerp = jnp.isnan(dot_mag) | (dot_mag > threshold)

    lerped = lerp(v0, v1, t)

    # Slerp path. Clamp dot into arccos domain and keep sin(theta_0) away
    # from zero so the unselected branch never poisons the output with NaNs.
    dot_safe = jnp.clip(dot, -1.0, 1.0)
    theta_0 = jnp.arccos(dot_safe)
    sin_theta_0 = jnp.sin(theta_0)
    sin_theta_0_safe = jnp.where(jnp.abs(sin_theta_0) < 1e-12, 1.0, sin_theta_0)
    theta_t = theta_0 * t
    s0 = jnp.sin(theta_0 - theta_t) / sin_theta_0_safe
    s1 = jnp.sin(theta_t) / sin_theta_0_safe
    slerped = s0 * v0 + s1 * v1

    return jnp.where(gotta_lerp, lerped, slerped)


def linear_interpolation(l1: jnp.ndarray, l2: jnp.ndarray, ts=None, size: int = 5) -> jnp.ndarray:
    """Batched lerp between two ``(1, *)`` arrays -> ``(size, *)``.

    If ``ts`` is given it is the coefficient schedule; otherwise uniform
    ``i/(size-1)``. Reference: interpolation.py:807-835.
    """
    assert l1.shape == l2.shape, "shapes of l1 and l2 must match"
    if ts is None:
        ts = jnp.linspace(0.0, 1.0, size)
    else:
        ts = jnp.asarray(ts)
    ts = ts.reshape((-1,) + (1,) * (l1.ndim - 1))
    return lerp(l1, l2, ts).reshape((ts.shape[0],) + l1.shape[1:])


def spherical_interpolation(l1: jnp.ndarray, l2: jnp.ndarray, size: int = 5, ts=None) -> jnp.ndarray:
    """Batched slerp between two ``(1, *)`` arrays -> ``(size, *)``.

    If ``ts`` is given it is the coefficient schedule (like
    ``linear_interpolation``); otherwise uniform ``i/(size-1)``.
    Reference: interpolation.py:838-858.
    """
    assert l1.shape == l2.shape, "shapes of l1 and l2 must match"
    if ts is None:
        ts = jnp.linspace(0.0, 1.0, size)
    else:
        ts = jnp.asarray(ts, jnp.float32)
        size = int(ts.shape[0])
    ts = ts.reshape((-1,) + (1,) * (l1.ndim - 1))
    out = slerp(l1[None], l2[None], ts[:, None])
    return out.reshape((size,) + l1.shape[1:])


def beta_ppf(q, alpha: float, beta: float) -> np.ndarray:
    """Host-side Beta(alpha, beta) inverse CDF (percent point function)."""
    return _beta_dist.ppf(q, alpha, beta)


def beta_cdf(x, alpha: float, beta: float) -> np.ndarray:
    """Host-side Beta(alpha, beta) CDF."""
    return _beta_dist.cdf(x, alpha, beta)


def generate_beta_schedule(size: int, alpha: float = 3.0, beta: float = 3.0, force_endpoints: bool = False) -> np.ndarray:
    """Coefficient schedule x_i with Beta-CDF F(x_i) = i/(size-1).

    Reference: prior.py:481-503 (generate_beta_tensor). ``force_endpoints``
    replicates interpolation.py:20-22 where the caller overwrites
    ``ts[0], ts[-1] = 0, 1`` (Beta PPF already yields 0 and 1 at the
    endpoints for finite alpha/beta, but forcing protects against NaN for
    degenerate parameters).

    Returned as float32 numpy: this parameterizes compiled programs and is
    computed on host.
    """
    qs = np.array([i / (size - 1) for i in range(size)])
    ts = _beta_dist.ppf(qs, alpha, beta).astype(np.float32)
    if force_endpoints:
        ts[0], ts[-1] = 0.0, 1.0
    return ts
