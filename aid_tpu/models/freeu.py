"""FreeU (arXiv:2309.11497): free-lunch UNet quality boost.

Parity target: the diffusers StableDiffusionMixin enable_freeu/disable_freeu
surface the reference inherits (reference pipeline_interpolated_sd.py:157-280,
specifically the FreeU part of the mixin). Scales the backbone features and
Fourier-low-pass-filters the skip features of the first two up blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FreeUConfig:
    """Stage-0/1 parameters (diffusers enable_freeu(s1, s2, b1, b2)).

    Recommended values — SD1.x: s1=0.9 s2=0.2 b1=1.2 b2=1.4;
    SDXL: s1=0.6 s2=0.4 b1=1.1 b2=1.2.
    """

    s1: float = 0.9
    s2: float = 0.2
    b1: float = 1.2
    b2: float = 1.4


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the low-frequency block of the 2D spectrum (NHWC input)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    freq = jnp.fft.fftn(x32, axes=(1, 2))
    freq = jnp.fft.fftshift(freq, axes=(1, 2))
    B, H, W, C = x.shape
    ch, cw = H // 2, W // 2
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    # diffusers fourier_filter slices [c-threshold : c+threshold) — a
    # 2t x 2t block (half-open), NOT |.| <= t (which would scale one extra
    # frequency row/column per axis and deviate from the parity target)
    low = ((row >= ch - threshold) & (row < ch + threshold)
           & (col >= cw - threshold) & (col < cw + threshold))
    mask = jnp.where(low, scale, 1.0)[None, :, :, None]
    freq = freq * mask
    freq = jnp.fft.ifftshift(freq, axes=(1, 2))
    return jnp.fft.ifftn(freq, axes=(1, 2)).real.astype(dtype)


def apply_freeu(up_idx: int, hidden: jnp.ndarray, skip: jnp.ndarray, cfg: Optional[FreeUConfig]):
    """Apply FreeU to (backbone hidden, skip) at up-block ``up_idx``.

    diffusers apply_freeu semantics: stage 0 uses (b1, s1), stage 1 (b2, s2);
    the backbone's first half of channels is scaled by b, the skip is
    low-pass rescaled by s.
    """
    if cfg is None or up_idx > 1:
        return hidden, skip
    b = cfg.b1 if up_idx == 0 else cfg.b2
    s = cfg.s1 if up_idx == 0 else cfg.s2
    half = hidden.shape[-1] // 2
    hidden = jnp.concatenate([hidden[..., :half] * b, hidden[..., half:]], axis=-1)
    skip = fourier_filter(skip, threshold=1, scale=s)
    return hidden, skip
