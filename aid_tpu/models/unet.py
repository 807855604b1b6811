"""UNet2DCondition (SD1.x / SD2.x / SDXL) in flax.linen, NHWC, config-driven.

Architectural parity target: the diffusers UNet2DConditionModel the reference
pipelines drive (reference pipeline_interpolated_sd.py:333, :1859-1889), with
the attention-processor family replaced by the built-in AID attention
(aid_tpu.models.layers.CrossAttention). Supports:
  * SD1.x/2.x: CrossAttnDownBlock2D x3 + DownBlock2D and mirror up path
  * SDXL: 3-level layout, per-level transformer depth, text_time additional
    conditioning (pooled text embeds + micro-conditioning time_ids,
    reference pipeline_interpolated_sdxl.py:992-1014, :2132-2133)
  * IP-Adapter K/V projections on every cross-attention when
    config.ip_num_tokens > 0

Inputs are NHWC (TPU-native conv layout); the pipelines convert at the
NCHW boundary when exchanging latents with reference-format checkpoints.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from aid_tpu.models.configs import UNetConfig
from aid_tpu.models.freeu import FreeUConfig, apply_freeu
from aid_tpu.models.layers import (
    AidContext,
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"  # "auto" | "flash" (Pallas) | "xla" (jnp)
    # "auto" | "xla": "xla" keeps convs free of pallas_call so the program
    # can be GSPMD-partitioned (see layers.Conv3x3.conv_backend)
    conv_backend: str = "auto"
    # mesh axis name the frame dim is sharded over (shard_map mode)
    frame_axis: Optional[object] = None  # str or tuple of mesh axis names

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C) noisy latents
        timestep: jnp.ndarray,  # scalar or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, S, cross_attention_dim)
        aid: Optional[AidContext] = None,
        added_cond: Optional[dict] = None,  # SDXL: {"text_embeds": (B,P), "time_ids": (B,6)}
        freeu: Optional[FreeUConfig] = None,  # enable_freeu equivalent
    ) -> jnp.ndarray:
        cfg = self.config
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))

        # 1. time (+ additional SDXL conditioning) embedding
        t_emb = timestep_embedding(
            timestep, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL config requires added_cond (text_embeds, time_ids)"
            time_ids = added_cond["time_ids"].reshape(-1)
            time_embeds = timestep_embedding(
                time_ids, cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
            )
            time_embeds = time_embeds.reshape(sample.shape[0], -1)
            add_embeds = jnp.concatenate(
                [added_cond["text_embeds"], time_embeds], axis=-1
            ).astype(self.dtype)
            emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="add_embedding")(add_embeds)

        # 2. conv_in
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        def make_transformer(level: int, name: str) -> Transformer2D:
            return Transformer2D(
                num_heads=cfg.num_attention_heads[level],
                head_dim=cfg.block_out_channels[level] // cfg.num_attention_heads[level],
                num_layers=max(cfg.transformer_layers_per_block[level], 1),
                norm_num_groups=cfg.norm_num_groups,
                use_linear_projection=cfg.use_linear_projection,
                has_ip=cfg.ip_num_tokens > 0,
                dtype=self.dtype,
                attention_backend=self.attention_backend,
                frame_axis=self.frame_axis,
                name=name,
            )

        # 3. down path
        skips = [h]
        for level, out_ch in enumerate(cfg.block_out_channels):
            is_final = level == cfg.num_levels - 1
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  conv_backend=self.conv_backend,
                                  name=f"down_blocks_{level}_resnets_{j}")(h, emb)
                if cfg.cross_attention_levels[level]:
                    h = make_transformer(level, f"down_blocks_{level}_attentions_{j}")(
                        h, encoder_hidden_states, aid)
                skips.append(h)
            if not is_final:
                h = Downsample2D(out_ch, dtype=self.dtype,
                                 name=f"down_blocks_{level}_downsamplers_0")(h)
                skips.append(h)

        # 4. mid block (resnet -> [attn -> resnet]); attention-free configs
        # (UNet2DModel-style) skip the mid transformer entirely
        top = cfg.num_levels - 1
        has_any_cross = any(cfg.cross_attention_levels)
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          conv_backend=self.conv_backend,
                          name="mid_block_resnets_0")(h, emb)
        if has_any_cross:
            mid_level = top if cfg.cross_attention_levels[top] else next(
                i for i in reversed(range(cfg.num_levels)) if cfg.cross_attention_levels[i]
            )
            h = Transformer2D(
                num_heads=cfg.num_attention_heads[mid_level],
                head_dim=mid_ch // cfg.num_attention_heads[mid_level],
                num_layers=max(cfg.transformer_layers_per_block[mid_level], 1),
                norm_num_groups=cfg.norm_num_groups,
                use_linear_projection=cfg.use_linear_projection,
                has_ip=cfg.ip_num_tokens > 0,
                dtype=self.dtype,
                attention_backend=self.attention_backend,
                frame_axis=self.frame_axis,
                name="mid_block_attentions_0",
            )(h, encoder_hidden_states, aid)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          conv_backend=self.conv_backend,
                          name="mid_block_resnets_1")(h, emb)

        # 5. up path (reversed levels, layers_per_block+1 resnets, skip concat)
        for up_idx, level in enumerate(reversed(range(cfg.num_levels))):
            out_ch = cfg.block_out_channels[level]
            is_final = up_idx == cfg.num_levels - 1
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h, skip = apply_freeu(up_idx, h, skip, freeu)
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  conv_backend=self.conv_backend,
                                  name=f"up_blocks_{up_idx}_resnets_{j}")(h, emb)
                if cfg.cross_attention_levels[level]:
                    h = make_transformer(level, f"up_blocks_{up_idx}_attentions_{j}")(
                        h, encoder_hidden_states, aid)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, conv_backend=self.conv_backend,
                               name=f"up_blocks_{up_idx}_upsamplers_0")(h)

        # 6. out
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(h)
        return h
