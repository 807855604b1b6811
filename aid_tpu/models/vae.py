"""AutoencoderKL (encoder + decoder) in flax.linen, NHWC.

Parity target: the diffusers AutoencoderKL used by the reference pipelines
(vae.decode at pipeline_interpolated_sd.py:1934-1938; SDXL fp32 upcast +
latents mean/std denormalization at pipeline_interpolated_sdxl.py:2347-2385).
Decode is the hot path; encode exists for image-conditioned workflows.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aid_tpu.models.configs import VAEConfig


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"  # "auto" | "flash" | "xla"; "xla" is
    # required under GSPMD-partitioned decode (pallas_call is opaque to the
    # partitioner) — plumbed from AutoencoderKL like the UNet does.

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        # At 1024px this is a 16384-token single-head attention: the XLA
        # path materializes a (hw, hw) f32 logit tensor (~1 GB/frame), so
        # route through the flash kernel (C=512 is lane-aligned; one head).
        from aid_tpu.ops.attention import AttnMode, dispatch_attention

        out = dispatch_attention(
            q[:, None], k[:, None], v[:, None],
            jnp.zeros((b,), jnp.float32), AttnMode.SELF,
            backend=self.attention_backend)[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return res + out.reshape(b, h, w, c)


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, self.norm_num_groups, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.norm_num_groups, dtype=self.dtype,
                         attention_backend=self.attention_backend, name="attentions_0")(x)
        x = VAEResnetBlock(self.channels, self.norm_num_groups, dtype=self.dtype, name="resnets_1")(x)
        return x


class VAEEncoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(x)
        for level, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"down_blocks_{level}_resnets_{j}")(h)
            if level != len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample uses asymmetric (0,1) padding
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                            name=f"down_blocks_{level}_downsamplers_0")(h)
        h = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups, dtype=self.dtype,
                        attention_backend=self.attention_backend, name="mid_block")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        return h  # (B, H/8, W/8, 2*latent) mean/logvar


class VAEDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = list(reversed(cfg.block_out_channels))
        h = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z)
        h = VAEMidBlock(ch[0], cfg.norm_num_groups, dtype=self.dtype,
                        attention_backend=self.attention_backend, name="mid_block")(h)
        for level, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"up_blocks_{level}_resnets_{j}")(h)
            if level != len(ch) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"up_blocks_{level}_upsamplers_0")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    """Full VAE with quant convs. ``decode`` / ``encode`` via method= apply."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    def setup(self):
        self.encoder = VAEEncoder(self.config, dtype=self.dtype,
                                  attention_backend=self.attention_backend)
        self.decoder = VAEDecoder(self.config, dtype=self.dtype,
                                  attention_backend=self.attention_backend)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = False):
        """Image (B,H,W,3) in [-1,1] -> latent moments; optionally sample."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if not sample:
            return mean
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Latent (B,h,w,latent_channels), already divided by scaling_factor."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng=rng, sample=rng is not None)
        return self.decode(z)
