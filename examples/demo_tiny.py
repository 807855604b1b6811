"""Demo: end-to-end attention-interpolation with a tiny random-weight model.

Runs entirely on CPU in a few seconds — exercises the full public API the
way a user would (pipeline construction, AID/PAID interpolation, baseline),
writing PNG strips to ./out/. With converted real SD checkpoints the same
code produces real interpolations (see aid_tpu.models.params converters).

Usage: JAX_PLATFORM_NAME=cpu python examples/demo_tiny.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

import jax.numpy as jnp
from aid_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DCondition, configs
from aid_tpu.pipelines import InterpolationPipeline
from aid_tpu.schedulers.ddim import DDIMScheduler
from aid_tpu.utils.tokenizer import HashTokenizer


def build_pipeline(seed=0):
    unet_cfg, vae_cfg, text_cfg = configs.TINY_UNET, configs.TINY_VAE, configs.TINY_CLIP_TEXT
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    unet = UNet2DCondition(unet_cfg)
    s = unet_cfg.sample_size
    unet_params = unet.init(k1, jnp.zeros((1, s, s, 4)), jnp.array(0),
                            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)))
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)))
    text = CLIPTextModel(text_cfg)
    text_params = text.init(k3, jnp.zeros((1, 77), jnp.int32))
    return InterpolationPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=HashTokenizer(text_cfg.vocab_size), scheduler=DDIMScheduler(),
        vae_scale_factor=2,
    )


def save_strip(images: np.ndarray, path: str, upscale: int = 8):
    n, h, w, _ = images.shape
    strip = Image.new("RGB", (n * w * upscale, h * upscale))
    for i in range(n):
        im = Image.fromarray(images[i]).resize((w * upscale, h * upscale), Image.NEAREST)
        strip.paste(im, (i * w * upscale, 0))
    strip.save(path)
    print(f"wrote {path}  ({n} frames)")


def main():
    os.makedirs("out", exist_ok=True)
    pipe = build_pipeline()

    print("== full-sequence AID interpolation (one jitted program) ==")
    l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
    seq = pipe.interpolate(l0, l1, "a photo of a cat", "a photo of a dog",
                           size=7, num_inference_steps=8)
    save_strip(seq, "out/aid_sequence.png")

    print("== PAID (guide prompt) ==")
    paid = pipe.interpolate(l0, l1, "a photo of a cat", "a photo of a dog",
                            guide_prompt="an animal portrait", size=5,
                            num_inference_steps=8)
    save_strip(paid, "out/paid_sequence.png")

    print("== 3-frame interpolate_single ==")
    tri = pipe.interpolate_single(0.5, l0, l1, "a cat", "a dog",
                                  num_inference_steps=8)
    save_strip(tri, "out/single.png")

    print("== denoising-interpolation baseline ==")
    base = pipe.denoising_interpolate(pipe.generate_latent(5), "a cat", "a dog",
                                      interpolated_ratio=0.5, timesteps=8)
    save_strip(base, "out/denoising_baseline.png")

    print("done.")


if __name__ == "__main__":
    main()
