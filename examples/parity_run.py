"""Fixed-seed parity run against a real checkpoint (BASELINE.json config #1).

Given a local diffusers-layout SD checkpoint directory, runs the SD-1.5
512px AID fused-outer 3-frame interpolate_single at 25 DDIM steps and dumps
the frames plus JSON stats for offline comparison against the reference
(see PARITY.md for the full export/compare recipe).

Usage:
  python examples/parity_run.py --checkpoint /path/to/sd15 \
      [--latent-start start.npy --latent-end end.npy] \
      [--prompt-start "..."] [--prompt-end "..."] [--steps 25] [--out out/parity]

SDXL checkpoints are auto-detected (dual text encoders); pass --sdxl to
assert the detection and supply the SDXL embeds-bypass set
(--pooled-embeds-start/end, --neg-pooled-embeds in addition to the SD trio)
exported from the reference pipeline (sdxl:449-452, 1191-1192).
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="diffusers-layout SD dir")
    ap.add_argument("--latent-start", default=None, help="reference-exported latents (.npy/.pt/.safetensors)")
    ap.add_argument("--latent-end", default=None)
    ap.add_argument("--embeds-start", default=None,
                    help="reference-exported cond text embeds (1,77,D); with "
                    "--embeds-end and --neg-embeds, bypasses tokenizer+CLIP "
                    "entirely so parity isolates the UNet/scheduler stack")
    ap.add_argument("--embeds-end", default=None)
    ap.add_argument("--neg-embeds", default=None)
    ap.add_argument("--guide-embeds", default=None, help="optional PAID guide embeds")
    ap.add_argument("--sdxl", action="store_true",
                    help="assert an SDXL checkpoint; enables the pooled-embeds args")
    ap.add_argument("--pooled-embeds-start", default=None,
                    help="SDXL pooled cond embeds (1,1280) for the start prompt")
    ap.add_argument("--pooled-embeds-end", default=None)
    ap.add_argument("--neg-pooled-embeds", default=None)
    ap.add_argument("--guide-pooled-embeds", default=None)
    ap.add_argument("--prompt-start", default="A photo of dog, best quality, extremely detailed")
    ap.add_argument("--prompt-end", default="A photo of car, best quality, extremely detailed")
    ap.add_argument("--it", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--warmup-ratio", type=float, default=0.5)
    ap.add_argument("--guidance", type=float, default=None,
                    help="default: the family default (SD 7.5, SDXL 5.0)")
    ap.add_argument("--scheduler", default="auto",
                    help="default 'auto' = the checkpoint-pinned scheduler "
                         "class, exactly like the reference's from_pretrained; "
                         "override (ddim/unipc/euler/edm) only if the torch-"
                         "side export overrode it too")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="out/parity")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from aid_tpu.models.loader import load_interpolation_pipeline
    from aid_tpu.utils.images import show_images_horizontally
    from aid_tpu.utils.parity import (
        image_stats,
        load_reference_embeds,
        load_reference_latents,
    )

    pipe = load_interpolation_pipeline(args.checkpoint,
                                       scheduler_name=args.scheduler,
                                       guidance_scale=args.guidance)
    is_xl = hasattr(pipe, "text_encoder_2") and pipe.text_encoder_2 is not None
    if args.sdxl and not is_xl:
        raise SystemExit("--sdxl given but the checkpoint loaded as SD (no text_encoder_2)")
    kw = {}
    if args.latent_start:
        kw["latent_start"] = load_reference_latents(args.latent_start)
        kw["latent_end"] = load_reference_latents(args.latent_end)
    if args.embeds_start:
        assert args.embeds_end and args.neg_embeds, (
            "--embeds-start needs --embeds-end and --neg-embeds")
        kw["prompt_embeds_start"] = load_reference_embeds(args.embeds_start)
        kw["prompt_embeds_end"] = load_reference_embeds(args.embeds_end)
        kw["negative_prompt_embeds"] = load_reference_embeds(args.neg_embeds)
        if args.guide_embeds:
            kw["guide_prompt_embeds"] = load_reference_embeds(args.guide_embeds)
        if is_xl:
            assert (args.pooled_embeds_start and args.pooled_embeds_end
                    and args.neg_pooled_embeds), (
                "SDXL embeds bypass needs --pooled-embeds-start/end and "
                "--neg-pooled-embeds (reference pooled prompt conditioning)")
            kw["pooled_prompt_embeds_start"] = load_reference_embeds(args.pooled_embeds_start)
            kw["pooled_prompt_embeds_end"] = load_reference_embeds(args.pooled_embeds_end)
            kw["negative_pooled_prompt_embeds"] = load_reference_embeds(args.neg_pooled_embeds)
            if args.guide_pooled_embeds:
                kw["guide_pooled_prompt_embeds"] = load_reference_embeds(args.guide_pooled_embeds)
    images = pipe.interpolate_single(
        args.it, prompt_start=args.prompt_start, prompt_end=args.prompt_end,
        num_inference_steps=args.steps, warmup_ratio=args.warmup_ratio,
        early="fused_outer", late="self", seed=args.seed, **kw,
    )

    os.makedirs(args.out, exist_ok=True)
    show_images_horizontally(images, os.path.join(args.out, "frames.png"))
    from PIL import Image

    for i, frame in enumerate(images):
        Image.fromarray(frame).save(os.path.join(args.out, f"frame_{i}.png"))
    stats = image_stats(images)
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps({k: v for k, v in stats.items() if k != "corner_patches"}))


if __name__ == "__main__":
    main()
