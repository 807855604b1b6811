"""CLIP text and vision towers in flax.linen.

Parity targets: the transformers CLIPTextModel / CLIPTextModelWithProjection
the reference uses for prompt encoding (pipeline_interpolated_sd.py:472-660
encode_prompt, incl. clip_skip) and the CLIPVisionModelWithProjection used
for IP-Adapter image embeds (encode_image, pipeline_interpolated_sd.py:661-692)
and the BetaPrior CLIP scorer (prior.py:24-33).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aid_tpu.models.configs import CLIPTextConfig, CLIPVisionConfig


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask: Optional[jnp.ndarray] = None):
        b, s, c = x.shape
        head_dim = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)

        def heads(t):
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (head_dim ** -0.5)
        if causal_mask is not None:
            logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    hidden_act: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state_after_clip_skip, pooled, all_hidden_states).

    clip_skip semantics match transformers/diffusers: ``clip_skip=n`` takes
    hidden states n layers before the end, then applies final_layer_norm
    (reference pipeline_interpolated_sd.py:597-610).
    """

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, clip_skip: int = 0):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(s)[None, :])
        x = tok + pos

        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg.num_attention_heads, cfg.intermediate_size,
                                 cfg.hidden_act, dtype=self.dtype, name=f"layers_{i}")(x, causal)
            hidden_states.append(x)

        selected = hidden_states[-1 - clip_skip] if clip_skip > 0 else x
        final_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")
        out = final_ln(selected)

        # pooled: final-layer-normed last hidden at the EOS position.
        # transformers semantics: legacy configs with eos_token_id == 2 use
        # argmax(ids) (valid only while EOS is the largest id); otherwise
        # take the FIRST occurrence of the configured EOS id, which stays
        # correct when textual-inversion tokens (ids > EOS) are present.
        final_normed = final_ln(x) if clip_skip > 0 else out
        if cfg.eos_token_id == 2:
            eos_idx = jnp.argmax(input_ids, axis=-1)
        else:
            is_eos = input_ids == cfg.eos_token_id
            eos_idx = jnp.where(is_eos.any(axis=-1),
                                jnp.argmax(is_eos.astype(jnp.int32), axis=-1),
                                jnp.argmax(input_ids, axis=-1))
        pooled = final_normed[jnp.arange(b), eos_idx]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection")(pooled)
        return out, pooled, hidden_states


class CLIPVisionModel(nn.Module):
    """Vision tower with projection: returns (image_embeds, penultimate_hidden).

    The penultimate hidden states feed IP-Adapter-Plus style projections;
    image_embeds (projected pooled CLS) feed standard IP-Adapter and the
    BetaPrior scorer (reference prior.py:32 get_image_features).
    """

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                          dtype=self.dtype, name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,), self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (b, 1, cfg.hidden_size)), patches], axis=1)
        n = x.shape[1]
        pos = nn.Embed(n, cfg.hidden_size, dtype=self.dtype, name="position_embedding")(jnp.arange(n)[None])
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layrnorm")(x)
        hidden = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg.num_attention_heads, cfg.intermediate_size,
                                 cfg.hidden_act, dtype=self.dtype, name=f"layers_{i}")(x)
            hidden.append(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        image_embeds = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                                name="visual_projection")(pooled)
        return image_embeds, hidden[-2]
