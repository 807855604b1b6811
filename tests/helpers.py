"""Shared test fixtures: tiny random-weight pipelines (SURVEY.md §4)."""

import jax
import jax.numpy as jnp

from aid_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DCondition, configs
from aid_tpu.pipelines import InterpolationPipeline
from aid_tpu.schedulers.ddim import DDIMScheduler
from aid_tpu.utils.tokenizer import HashTokenizer


def tiny_pipeline(seed: int = 0, unet_cfg=None) -> InterpolationPipeline:
    unet_cfg = unet_cfg or configs.TINY_UNET
    vae_cfg = configs.TINY_VAE
    text_cfg = configs.TINY_CLIP_TEXT
    assert text_cfg.hidden_size == unet_cfg.cross_attention_dim

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    unet = UNet2DCondition(unet_cfg)
    s = unet_cfg.sample_size
    unet_params = unet.init(
        k1,
        jnp.zeros((1, s, s, unet_cfg.in_channels)),
        jnp.array(0),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
    )

    vae = AutoencoderKL(vae_cfg)
    f = 2 ** (len(vae_cfg.block_out_channels) - 1)
    img = s * f
    vae_params = vae.init(k2, jnp.zeros((1, img, img, 3)))

    text = CLIPTextModel(text_cfg)
    text_params = text.init(k3, jnp.zeros((1, 77), jnp.int32))

    return InterpolationPipeline(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text,
        text_params=text_params,
        tokenizer=HashTokenizer(text_cfg.vocab_size),
        scheduler=DDIMScheduler(),
        vae_scale_factor=f,
    )
