"""LPIPS perceptual distance in JAX (VGG16 backbone + linear heads).

Parity target: the ``lpips.LPIPS(net='vgg')`` model the reference uses for
smoothness scoring (reference prior.py:343-478, utils.py:108-139). The
architecture is implemented from the LPIPS paper (arXiv:1801.03924):
VGG16 features at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, unit-normalized
per channel, squared differences, learned 1x1 linear heads, spatial mean,
summed across stages.

Weights: convert a torch LPIPS checkpoint with
aid_tpu.models.params.convert_lpips_state_dict, or use random init for
plumbing tests. The reference normalizes inputs with ImageNet mean/std
before calling LPIPS (utils.py:126-127) — compute_lpips replicates that.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; maxpool between stages.
VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# LPIPS's internal input scaling (ScalingLayer shift/scale)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the 5 LPIPS feature stages. NHWC."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        for si, (ch, n_convs) in enumerate(VGG16_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            feats.append(x)
            if si < len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """Full LPIPS head: returns (B,) perceptual distances for image pairs."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(LPIPS_SHIFT, self.dtype)
        scale = jnp.asarray(LPIPS_SCALE, self.dtype)
        trunk = VGG16Features(dtype=self.dtype, name="vgg")
        f0 = trunk((x0 - shift) / scale)
        f1 = trunk((x1 - shift) / scale)
        total = 0.0
        for si, (a, b) in enumerate(zip(f0, f1)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{si}")
            total = total + jnp.mean(head(diff), axis=(1, 2, 3))
        return total


def compute_lpips(images: np.ndarray, lpips_apply) -> np.ndarray:
    """Adjacent-pair LPIPS distances of an image sequence.

    ``images``: (N, H, W, 3) float in [0, 1] or uint8.
    ``lpips_apply``: callable (x0, x1) -> (B,) distances (e.g.
    ``functools.partial(model.apply, params)``).

    Reference utils.py:108-139: ImageNet-normalize then pairwise LPIPS.
    All N-1 pairs are evaluated in ONE batched call (the reference loops
    pair by pair on GPU).
    """
    x = np.asarray(images)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    x = (x - mean) / std
    x = jnp.asarray(x)
    d = lpips_apply(x[:-1], x[1:])
    return np.asarray(d)
