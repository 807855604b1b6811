"""Golden regression: pinned statistics of fixed-seed tiny-pipeline outputs
(SURVEY.md §4 'Golden parity' — the reference has no tests; these pin OUR
numerics so kernel/engine refactors can't silently change results).

The pins are summary statistics (mean/std/corner pixels) with loose-enough
tolerances to survive XLA version drift but tight enough to catch real
numerical changes. Regenerate with REGEN=1 python -m pytest tests/test_golden.py -s
"""

import json
import os

import numpy as np
import pytest

from helpers import tiny_pipeline

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "tiny_pipeline.json")


def _stats(images: np.ndarray) -> dict:
    x = images.astype(np.float64)
    return {
        "shape": list(x.shape),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "frame_means": [float(m) for m in x.mean(axis=(1, 2, 3))],
        # spatially-structured pin: an 8x8 corner crop (channel 0) per frame
        # catches drift that summary statistics average away
        "corner_patches": x[:, :8, :8, 0].tolist(),
    }


def _generate():
    pipe = tiny_pipeline()
    out = {}
    out["interpolate_single"] = _stats(
        pipe.interpolate_single(0.5, prompt_start="a cat", prompt_end="a dog",
                                num_inference_steps=4, seed=3))
    l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
    out["interpolate_seq5"] = _stats(
        pipe.interpolate(l0, l1, "a cat", "a dog", size=5, num_inference_steps=4))
    out["paid"] = _stats(
        pipe.interpolate_single(0.5, prompt_start="a cat", prompt_end="a dog",
                                guide_prompt="an animal", num_inference_steps=4, seed=3))
    return out


def test_golden_regression():
    if os.environ.get("REGEN") == "1" or not os.path.exists(GOLDEN_PATH):
        golden = _generate()
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(golden, f, indent=1)
        print(f"\nwrote goldens to {GOLDEN_PATH}")
        return

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    current = _generate()
    for name, want in golden.items():
        got = current[name]
        assert got["shape"] == want["shape"], name
        assert abs(got["mean"] - want["mean"]) < 0.5, (name, got["mean"], want["mean"])
        assert abs(got["std"] - want["std"]) < 0.5, (name, got["std"], want["std"])
        for a, b in zip(got["frame_means"], want["frame_means"]):
            assert abs(a - b) < 1.0, (name, got["frame_means"], want["frame_means"])
        if "corner_patches" in want:
            np.testing.assert_allclose(
                np.asarray(got["corner_patches"]),
                np.asarray(want["corner_patches"]),
                atol=3.0,  # uint8 scale; tolerates XLA drift, catches real change
                err_msg=name,
            )
