"""Parity harness: import reference-exported tensors for fixed-seed runs.

The reference draws initial latents with torch CUDA RNG (randn_tensor,
reference pipeline_interpolated_sd.py:904-913; generate_latent,
pipeline_interpolated_sdxl.py:411-438), which no JAX RNG reproduces
bit-for-bit. The parity recipe (PARITY.md) therefore EXPORTS the
reference's latents/embeddings once on the torch side and IMPORTS them
here, so both frameworks denoise the identical starting state and the
images can be compared directly.

Accepted formats: .npy / .npz (numpy), .safetensors, torch .pt/.bin.
Torch image/latent tensors are NCHW; everything here is NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def _load_array(path: str, key: Optional[str] = None) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        z = np.load(path)
        return z[key] if key else z[list(z.files)[0]]
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="numpy") as f:
            keys = list(f.keys())
            return f.get_tensor(key if key else keys[0])
    # torch .pt / .bin
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "numpy"):
        return obj.float().numpy()
    entry = obj[key] if key else next(iter(obj.values()))
    if hasattr(entry, "numpy"):
        # dict-of-tensors export: same .float() upcast as the bare-tensor
        # branch (np.asarray would raise on bf16 entries)
        return entry.float().numpy()
    return np.asarray(entry)


def load_reference_latents(path: str, key: Optional[str] = None) -> jnp.ndarray:
    """Reference-exported latents (N,C,H,W) or (C,H,W) -> (N,H,W,C) fp32.

    Feed the result to ``interpolate_single(latent_start=..., latent_end=...)``
    or ``interpolate(latent_start, latent_end, ...)`` — the channel count
    (4) vs spatial size disambiguates layouts already in NHWC."""
    x = np.asarray(_load_array(path, key), np.float32)
    if x.ndim == 3:
        x = x[None]
    if x.ndim != 4:
        raise ValueError(f"latents must be 3D/4D, got {x.shape}")
    # NCHW -> NHWC when the channel-like axis (small, smaller than the
    # trailing spatial dim) is in front
    if x.shape[1] <= 8 and x.shape[1] < x.shape[-1]:
        x = x.transpose(0, 2, 3, 1)
    return jnp.asarray(x)


def load_reference_embeds(path: str, key: Optional[str] = None) -> jnp.ndarray:
    """Reference-exported prompt/image embeddings -> (N, ..., D) fp32 jnp.

    Text embeds (N,77,dim) and CLIP image embeds (N,dim) keep torch layout."""
    x = np.asarray(_load_array(path, key), np.float32)
    if x.ndim == 1:
        x = x[None]
    return jnp.asarray(x)


def image_stats(images: np.ndarray) -> dict:
    """Summary statistics for offline cross-framework comparison."""
    x = np.asarray(images, np.float64)
    return {
        "shape": list(x.shape),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "frame_means": [float(m) for m in x.mean(axis=tuple(range(1, x.ndim)))],
        "corner_patches": x[:, :8, :8, 0].tolist() if x.ndim == 4 else None,
    }
