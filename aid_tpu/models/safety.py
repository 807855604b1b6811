"""Safety checker (diffusers StableDiffusionSafetyChecker equivalent).

Parity target: run_safety_checker (reference pipeline_interpolated_sd.py:753-770,
:1939-1941): a CLIP vision tower + projection scores images against learned
concept embeddings; flagged images are blacked out and reported.

Weights come from a checkpoint's safety_checker/ directory via
convert_safety_checker_state_dict; without weights the pipelines simply
skip the check (matching the reference's safety_checker=None path).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from aid_tpu.models.clip import CLIPVisionModel
from aid_tpu.models.configs import CLIPVisionConfig


class SafetyChecker(nn.Module):
    config: CLIPVisionConfig
    num_concepts: int = 17
    num_special: int = 3

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, adjustment: float = 0.0):
        """pixel_values: CLIP-preprocessed (B, S, S, 3). Returns (B,) bool."""
        image_embeds, _ = CLIPVisionModel(self.config, name="vision_model")(pixel_values)
        dim = image_embeds.shape[-1]
        concepts = self.param("concept_embeds", nn.initializers.normal(0.02),
                              (self.num_concepts, dim))
        specials = self.param("special_care_embeds", nn.initializers.normal(0.02),
                              (self.num_special, dim))
        c_thresh = self.param("concept_embeds_weights", nn.initializers.ones,
                              (self.num_concepts,))
        s_thresh = self.param("special_care_embeds_weights", nn.initializers.ones,
                              (self.num_special,))

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return a @ b.T

        # diffusers semantics: the caller ``adjustment`` applies ONLY to the
        # special-care scores; concept scores get just the 0.01 stricter
        # threshold for images that triggered special care
        special_scores = cos(image_embeds, specials) - s_thresh + adjustment
        has_special = jnp.any(special_scores > 0, axis=-1)
        adj = jnp.where(has_special, 0.01, 0.0)[:, None]
        concept_scores = cos(image_embeds, concepts) - c_thresh + adj
        return jnp.any(concept_scores > 0, axis=-1)


def convert_safety_checker_state_dict(sd) -> dict:
    """diffusers safety_checker state dict -> SafetyChecker params."""
    from aid_tpu.models.params import convert_clip_vision_state_dict, _to_numpy

    vision_sd = {k: v for k, v in sd.items() if k.startswith("vision_model.")}
    vision = convert_clip_vision_state_dict(
        {k.replace("vision_model.", "", 1): v for k, v in vision_sd.items()}
    )["params"]
    # the projection lives at top level in the checker
    if "visual_projection.weight" in sd:
        vision["visual_projection"] = {
            "kernel": _to_numpy(sd["visual_projection.weight"]).transpose(1, 0)
        }
    params = {
        "vision_model": vision,
        "concept_embeds": _to_numpy(sd["concept_embeds"]),
        "special_care_embeds": _to_numpy(sd["special_care_embeds"]),
        "concept_embeds_weights": _to_numpy(sd["concept_embeds_weights"]),
        "special_care_embeds_weights": _to_numpy(sd["special_care_embeds_weights"]),
    }
    return {"params": params}


def run_safety_checker(images: np.ndarray, checker, checker_params) -> Tuple[np.ndarray, np.ndarray]:
    """Blacken flagged images (reference run_safety_checker behavior).

    images: (N, H, W, 3) uint8. Returns (images, has_nsfw (N,) bool).
    """
    from aid_tpu.prior.clip_scorer import preprocess

    px = preprocess(jnp.asarray(images), checker.config.image_size)
    flags = np.asarray(checker.apply(checker_params, px))
    out = images.copy()
    out[flags] = 0
    return out, flags
