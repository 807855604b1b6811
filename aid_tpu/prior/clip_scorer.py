"""CLIP image-feature scorer for the dynamic-selection prior.

Parity target: reference prior.py:13-33 (CLIPModel.get_image_features with
CLIPImageProcessor preprocessing on openai/clip-vit-base-patch32). Device
side: one jitted batched forward; preprocessing (resize + normalize) is
jnp too, so scoring a candidate frame is a single device call.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# CLIPImageProcessor constants (openai/clip-vit-base-patch32)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """uint8/float (N,H,W,3) -> CLIP-normalized (N,S,S,3).

    Bilinear resize directly to (S, S) — the reference's processor resizes
    the short side then center-crops; for the square frames produced by the
    pipelines these coincide.
    """
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3), "bilinear")
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def make_clip_feature_fn(vision_model: Any, vision_params: Any):
    """Returns images(N,H,W,3)->(N,proj_dim) numpy feature fn for
    BetaPriorPipeline."""

    @jax.jit
    def run(px):
        embeds, _ = vision_model.apply(vision_params, px)
        return embeds

    def feature_fn(images: np.ndarray) -> np.ndarray:
        px = preprocess(images, vision_model.config.image_size)
        return np.asarray(run(px))

    return feature_fn
