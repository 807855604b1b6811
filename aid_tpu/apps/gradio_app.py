"""Gradio web UI for attention interpolation.

Feature parity with the reference app (reference gradio_src/app.py):
  * model switcher (app.py:65-87)
  * Beta-PPF coefficient-schedule preview plot (app.py:105-112, 320-339)
  * generate() stitches interpolate_single over the Beta schedule middles
    (app.py:202-269) — here it instead runs ONE batched interpolate() call
    (all frames in a single device program)
  * controls: size 3-15, alpha, beta, warmup ratio, guidance scale, steps,
    early/late method, seed, same_latent (app.py:294-429)

gradio is not bundled in this image; importing this module without gradio
raises a clear error. Run: python -m aid_tpu.apps.gradio_app /path/to/ckpt
"""

from __future__ import annotations

import sys

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - gradio not in the image
    raise ImportError(
        "gradio is not installed in this environment; the app module is "
        "provided for feature parity and runs where gradio is available"
    ) from e

from aid_tpu.ops.interp import generate_beta_schedule
from aid_tpu.utils.images import to_pil

EARLY_CHOICES = ["fused_outer", "pure_outer", "fused_inner", "pure_inner"]
LATE_CHOICES = ["self"] + EARLY_CHOICES


def beta_plot_data(size: int, alpha: float, beta: float):
    ts = generate_beta_schedule(int(size), float(alpha), float(beta), force_endpoints=True)
    return {"x": list(range(len(ts))), "y": [float(t) for t in ts]}


def build_app(pipeline_factory):
    """pipeline_factory(model_name) -> InterpolationPipeline."""
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
        model = gr.Dropdown(
            ["sd15", "sd21", "sdxl"], value="sd15", label="Model",
        )
        with gr.Row():
            prompt1 = gr.Textbox(label="Prompt A")
            prompt2 = gr.Textbox(label="Prompt B")
        guide = gr.Textbox(label="Guidance prompt (PAID, optional)")
        negative = gr.Textbox(label="Negative prompt")
        with gr.Row():
            size = gr.Slider(3, 15, value=7, step=1, label="Interpolation size")
            alpha = gr.Slider(0.1, 50, value=25, label="alpha")
            beta = gr.Slider(0.1, 50, value=25, label="beta")
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
        gallery = gr.Gallery(label="Interpolation sequence")
        btn = gr.Button("Generate")
        btn.click(
            generate,
            [model, prompt1, prompt2, guide, negative, size, alpha, beta,
             warmup, guidance, steps, early, late, seed, same_latent],
            gallery,
        )
    return demo


def main():  # pragma: no cover
    from aid_tpu.models.loader import load_interpolation_pipeline, load_interpolation_xl_pipeline

    root = sys.argv[1]

    def factory(name):
        if name == "sdxl":
            return load_interpolation_xl_pipeline(root)
        return load_interpolation_pipeline(root)

    build_app(factory).launch()


if __name__ == "__main__":  # pragma: no cover
    main()
