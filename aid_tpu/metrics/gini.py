"""Smoothness / consistency metrics (reference utils.py:108-188).

``compute_gini`` is the O(n log n) closed form of the reference's O(n^2)
double loop (utils.py:142-168) — identical value, sorted-index formula.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def compute_gini(distances: Sequence[float]) -> float:
    """Gini index of a distance vector (reference utils.py:142-168)."""
    d = np.asarray(distances, np.float64)
    n = d.size
    if n < 2:
        return 0.0
    d = np.sort(d)
    # sum_{i,j} |d_i - d_j| = 2 * sum_i (2i - n + 1) d_(i)  for sorted d
    idx = np.arange(n)
    sum_diff = 2.0 * np.sum((2 * idx - n + 1) * d)
    mean = d.mean()
    if mean <= 0.0:
        # all-zero distances (identical frames): perfectly equal
        # distribution -> Gini 0, not 0/0 = NaN (which would poison the
        # GP-UCB smoothness search downstream)
        return 0.0
    return float(sum_diff / (2 * n * n * mean))


def compute_smoothness_and_consistency(distances: Sequence[float]) -> Tuple[float, float, float]:
    """(smoothness, consistency, max distance) from adjacent perceptual
    distances (reference utils.py:171-188: smoothness = 1 - Gini of LPIPS,
    consistency = mean LPIPS, max 'inception distance' = max LPIPS)."""
    d = np.asarray(distances, np.float64)
    return 1.0 - compute_gini(d), float(d.mean()), float(d.max())


def separate_source_and_interpolated_images(images: np.ndarray):
    """Split [first, last] sources from the middles (reference utils.py:191-212)."""
    if len(images) < 2:
        raise ValueError("The input array should have at least two elements.")
    source = np.array([images[0], images[-1]])
    return source, images[1:-1]
