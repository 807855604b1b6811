"""SDXL attention interpolation — the play_sdxl_trial.ipynb workflow on TPU.

Reference play_sdxl_trial.ipynb: SDXL-family checkpoint (e.g.
playground-v2.5), 28 steps, warmup_ratio=1.0, dynamic-selection trial.

Usage:
    python examples/interpolate_sdxl.py /path/to/sdxl-checkpoint \
        [--steps 28] [--size 7] [--warmup 1.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--prompt-a", default="A painting of a mountain lake at dawn")
    ap.add_argument("--prompt-b", default="A painting of a desert canyon at dusk")
    ap.add_argument("--guide", default=None)
    ap.add_argument("--negative", default="")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--size", type=int, default=7)
    ap.add_argument("--warmup", type=float, default=1.0)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="out/sdxl_interpolation.png")
    args = ap.parse_args()

    from aid_tpu.models.loader import load_interpolation_xl_pipeline
    from aid_tpu.utils.images import show_images_horizontally

    pipe = load_interpolation_xl_pipeline(args.checkpoint)
    l0 = pipe.generate_latent(args.seed)
    l1 = pipe.generate_latent(args.seed + 1)
    images = pipe.interpolate(
        l0, l1, args.prompt_a, args.prompt_b, guide_prompt=args.guide,
        negative_prompt=args.negative, size=args.size,
        num_inference_steps=args.steps, warmup_ratio=args.warmup,
        guidance_scale=args.guidance,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    show_images_horizontally(images, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
