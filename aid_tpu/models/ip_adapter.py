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
import jax
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


class PerceiverAttention(nn.Module):
    """Resampler attention: latent queries attend over [image feats; latents]
    (original IP-Adapter resampler.py; diffusers IPAdapterPlusImageProjection)."""

    dim: int
    dim_head: int = 64
    heads: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(latents)
        b, nq, _ = latents.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # original resampler scales q AND k by dim_head**-0.25 each
        scale = self.dim_head ** -0.5
        # f32 MXU accumulation BEFORE the cast (like clip.py / ops.attention)
        # — casting a bf16-rounded product cannot recover the mantissa
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class Resampler(nn.Module):
    """IP-Adapter-Plus image projection (perceiver resampler): CLIP vision
    PENULTIMATE hidden states (B, S, embed_dim) -> (B, num_queries,
    cross_attention_dim). Checkpoint detection: 'latents' in image_proj."""

    cross_attention_dim: int
    embed_dim: int
    hidden_dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    ffn_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_hidden: jnp.ndarray) -> jnp.ndarray:
        b = image_hidden.shape[0]
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (1, self.num_queries, self.hidden_dim), self.dtype)
        latents = jnp.broadcast_to(latents, (b, self.num_queries, self.hidden_dim))
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_in")(image_hidden)
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.hidden_dim, self.dim_head, self.heads, dtype=self.dtype,
                name=f"layers_{i}_attn")(x, latents)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(self.hidden_dim * self.ffn_mult, use_bias=False,
                         dtype=self.dtype, name=f"layers_{i}_ff_fc1")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_ff_fc2")(h)
            latents = latents + h
        out = nn.Dense(self.cross_attention_dim, dtype=self.dtype, name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(out)


@dataclasses.dataclass
class IPAdapter:
    """Loaded IP-Adapter state attached to a pipeline."""

    proj: ImageProjection
    proj_params: Any
    scale: float = 1.0
    num_tokens: int = 4
