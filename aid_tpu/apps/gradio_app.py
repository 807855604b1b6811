"""Gradio web UI for attention interpolation.

Feature parity with the reference app (reference gradio_src/app.py):
  * model switcher with per-model defaults applied on switch (app.py:65-87:
    SD pipelines rebuild with guidance 10/unipc/fp32, SDXL fp16)
  * Beta-PPF coefficient-schedule preview plot (app.py:105-112, 320-339)
  * examples gallery (app.py:115-186)
  * ENABLE_CPU_OFFLOAD env toggle (app.py:53) — here it selects the CPU
    backend (the TPU analog of cpu-offload: keep the chip free)
  * generate() stitches interpolate_single over the Beta schedule middles
    (app.py:202-269) — here it instead runs ONE batched interpolate() call
    (all frames in a single device program)
  * controls: size 3-15, alpha, beta, warmup ratio, guidance scale, steps,
    early/late method, seed, same_latent (app.py:294-429)

gradio is not bundled in this image; the pure-python pieces (examples,
defaults, beta plot data) are importable and unit-tested without it, and
build_app() raises a clear error where gradio is unavailable.
Run: python -m aid_tpu.apps.gradio_app /path/to/ckpt
"""

from __future__ import annotations

import os
import sys

from aid_tpu.ops.interp import generate_beta_schedule

EARLY_CHOICES = ["fused_outer", "pure_outer", "fused_inner", "pure_inner"]
LATE_CHOICES = ["self"] + EARLY_CHOICES

ENABLE_CPU_OFFLOAD = os.getenv("ENABLE_CPU_OFFLOAD") == "1"

# Per-model defaults applied when the switcher changes (reference
# change_model_fn app.py:65-87: SD variants rebuild at fp32/unipc/guidance 10,
# SDXL at fp16 with its pipeline defaults).
MODEL_DEFAULTS = {
    "sd15": {"guidance": 10.0, "steps": 25, "scheduler": "unipc", "size_px": 512},
    "sd21": {"guidance": 10.0, "steps": 25, "scheduler": "unipc", "size_px": 768},
    "sdxl": {"guidance": 5.0, "steps": 28, "scheduler": "auto", "size_px": 1024},
}


def model_defaults(name: str) -> dict:
    return MODEL_DEFAULTS.get(name, MODEL_DEFAULTS["sd15"])


def get_examples():
    """Reference examples gallery (gradio_src/app.py:115-186), columns:
    [prompt1, prompt2, guide_prompt, negative_prompt, model, size, alpha,
    beta, warmup_ratio, guidance, steps, early, late, seed, same_latent]."""
    neg = "monochrome, lowres, bad anatomy, worst quality, low quality"
    neg_xl = "photo, photorealistic, realism, ugly, messy background"
    return [
        ["A photo of dog, best quality, extremely detailed",
         "A photo of car, best quality, extremely detailed",
         "A car with dog furry texture, best quality, extremely detailed",
         neg, "sd15", 3, 6.0, 3.0, 6.1 / 50, 10.0, 50, "fused_inner", "self", 1002, True],
        ["A photo of dog, best quality, extremely detailed",
         "A photo of car, best quality, extremely detailed",
         "A toy named dog-car, best quality, extremely detailed",
         neg, "sd15", 7, 8.0, 8.0, 8.1 / 50, 10.0, 50, "fused_inner", "self", 1002, True],
        ["anime artwork a Pikachu sitting on the grass, dramatic, anime style, "
         "key visual, vibrant, studio anime, highly detailed",
         "anime artwork a beautiful girl, dramatic, anime style, key visual, "
         "vibrant, studio anime, highly detailed",
         None, neg_xl, "sdxl", 7, 10.0, 6.0, 0.5, 10.0, 50, "fused_outer", "self", 1002, False],
        ["vaporwave synthwave style Los Angeles street. cyberpunk, neon, vibes, "
         "stunningly beautiful, crisp, detailed, sleek, ultramodern, high "
         "contrast, cinematic composition",
         "cinematic film still, stormtrooper taking aim. shallow depth of "
         "field, vignette, highly detailed, high budget Hollywood movie, "
         "bokeh, cinemascope, moody, epic, gorgeous, film grain",
         None, neg_xl, "sdxl", 7, 530.0, 602.0, 0.5, 10.0, 50, "fused_outer", "self", 1002, False],
    ]


def beta_plot_data(size: int, alpha: float, beta: float):
    ts = generate_beta_schedule(int(size), float(alpha), float(beta), force_endpoints=True)
    return {"x": list(range(len(ts))), "y": [float(t) for t in ts]}


def build_app(pipeline_factory):
    """pipeline_factory(model_name) -> InterpolationPipeline."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - gradio not in the image
        raise ImportError(
            "gradio is not installed in this environment; the app module is "
            "provided for feature parity and runs where gradio is available"
        ) from e

    from aid_tpu.utils.images import to_pil

    state = {"name": None, "pipe": None}

    def get_pipe(model_name):
        if state["name"] != model_name:
            state["pipe"] = pipeline_factory(model_name)
            state["name"] = model_name
        return state["pipe"]

    def generate(
        model_name, prompt1, prompt2, guide_prompt, negative_prompt,
        size, alpha, beta, warmup_ratio, guidance, steps, early, late,
        seed, same_latent,
    ):
        pipe = get_pipe(model_name)
        l0 = pipe.generate_latent(int(seed))
        l1 = l0 if same_latent else pipe.generate_latent(int(seed) + 1)
        images = pipe.interpolate(
            l0, l1, prompt1, prompt2,
            guide_prompt=guide_prompt or None,
            negative_prompt=negative_prompt or "",
            size=int(size), num_inference_steps=int(steps),
            warmup_ratio=float(warmup_ratio), early=early, late=late,
            alpha=float(alpha), beta=float(beta),
            guidance_scale=float(guidance),
        )
        return to_pil(images)

    with gr.Blocks(title="AID/PAID on TPU") as demo:
        gr.Markdown("# Attention Interpolation (AID/PAID) — TPU-native")
        model = gr.Dropdown(list(MODEL_DEFAULTS), value="sd15", label="Model")
        with gr.Row():
            prompt1 = gr.Textbox(label="Prompt A")
            prompt2 = gr.Textbox(label="Prompt B")
        guide = gr.Textbox(label="Guidance prompt (PAID, optional)")
        negative = gr.Textbox(label="Negative prompt")
        with gr.Row():
            size = gr.Slider(3, 15, value=7, step=1, label="Interpolation size")
            alpha = gr.Slider(0.1, 700, value=25, label="alpha")  # examples go up to 602
            beta = gr.Slider(0.1, 700, value=25, label="beta")
        with gr.Row():
            warmup = gr.Slider(0.0, 1.0, value=0.5, label="Warmup ratio")
            guidance = gr.Slider(1.0, 15.0, value=10.0, label="Guidance scale")
            steps = gr.Slider(5, 50, value=25, step=1, label="Inference steps")
        with gr.Row():
            early = gr.Dropdown(EARLY_CHOICES, value="fused_outer", label="Early method")
            late = gr.Dropdown(LATE_CHOICES, value="self", label="Late method")
            seed = gr.Number(value=0, label="Seed")
            same_latent = gr.Checkbox(value=False, label="Same latent")
        plot = gr.LinePlot(x="x", y="y", label="Beta schedule preview")
        for ctl in (size, alpha, beta):
            ctl.change(beta_plot_data, [size, alpha, beta], plot)

        def on_model_change(name):
            d = model_defaults(name)
            return gr.update(value=d["guidance"]), gr.update(value=d["steps"])

        model.change(on_model_change, [model], [guidance, steps])

        gallery = gr.Gallery(label="Interpolation sequence")
        btn = gr.Button("Generate")
        inputs = [model, prompt1, prompt2, guide, negative, size, alpha, beta,
                  warmup, guidance, steps, early, late, seed, same_latent]
        btn.click(generate, inputs, gallery)
        gr.Examples(
            examples=[[e[0], e[1], e[2], e[3], e[4], e[5], e[6], e[7], e[8],
                       e[9], e[10], e[11], e[12], e[13], e[14]] for e in get_examples()],
            inputs=[prompt1, prompt2, guide, negative, model, size, alpha,
                    beta, warmup, guidance, steps, early, late, seed, same_latent],
            label="Examples (reference gallery)",
        )
    return demo


def main():  # pragma: no cover
    if ENABLE_CPU_OFFLOAD:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from aid_tpu.models.loader import load_interpolation_pipeline, load_interpolation_xl_pipeline

    root = sys.argv[1]

    def factory(name):
        d = model_defaults(name)
        if name == "sdxl":
            return load_interpolation_xl_pipeline(root, scheduler_name=d["scheduler"])
        return load_interpolation_pipeline(
            root, scheduler_name=d["scheduler"], guidance_scale=d["guidance"])

    build_app(factory).launch()


if __name__ == "__main__":  # pragma: no cover
    main()
