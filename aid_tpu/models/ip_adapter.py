"""IP-Adapter components: image-prompt projection into cross-attention tokens.

Parity target: the diffusers IP-Adapter stack the reference loads via
load_aid_ip_adapter (pipeline_interpolated_sd.py:973-1010) — h94/IP-Adapter
and ostris/ip-composition-adapter checkpoints (play_sd.ipynb cells 8-12).
The per-layer to_k_ip/to_v_ip projections live inside the UNet
(models.layers.CrossAttention has_ip=True); this module provides the image
projection that turns CLIP image embeds into the ``ip_num_tokens``
cross-attention tokens, and the container tying scale/num_tokens together.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ImageProjection(nn.Module):
    """Standard IP-Adapter projection: CLIP image embed (B, D) ->
    (B, num_tokens, cross_attention_dim). diffusers ImageProjection:
    Linear(D, tokens * cross_dim) + LayerNorm."""

    cross_attention_dim: int
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(self.num_tokens * self.cross_attention_dim, dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


@dataclasses.dataclass
class IPAdapter:
    """Loaded IP-Adapter state attached to a pipeline."""

    proj: ImageProjection
    proj_params: Any
    scale: float = 1.0
    num_tokens: int = 4
