"""Benchmark: interpolation frames/sec/chip on the headline workload.

Workload (BASELINE.json metric): SDXL-architecture UNet, 1024px (128x128
latents), 28 steps, 3-frame [A, interp, B] fused-outer AID interpolation
with the reference's exact CFG structure (cond pass with AID + uncond pass
vanilla, warmup_ratio 0.5), Euler scheduler. Random bf16 weights —
identical FLOPs/memory behavior to converted checkpoints. Pallas flash
interpolated-attention kernels on the hot path.

Baseline: the reference publishes no numbers (BASELINE.md). ``vs_baseline``
is measured against an ESTIMATED A100 torch/diffusers reference of 0.21
frames/sec for this exact workload: SDXL fp16 UNet forward at 1024px is
~80-100 ms/image on A100 => batch-3 ~260 ms; 28 steps x 2 sequential
forwards => ~14.5 s per 3-frame sequence (plus VAE) => ~0.21 frames/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

NOTE (axon): block_until_ready() is a no-op over the tunnel; execution is
forced by pulling a scalar checksum to host.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the cold Mosaic/XLA compile of the full loop
# takes minutes; repeat runs become seconds
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/aid_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


A100_BASELINE_FRAMES_PER_SEC = 0.21  # estimated; see module docstring

NUM_STEPS = 28
FRAMES = 3
LATENT = 128  # 1024px / 8


def main():
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler

    dtype = jnp.bfloat16
    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=dtype)

    sample = jax.random.normal(jax.random.PRNGKey(0), (FRAMES, LATENT, LATENT, cfg.in_channels), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, 77, cfg.cross_attention_dim), dtype)
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(2), (FRAMES, 1280), dtype),
        "time_ids": jnp.broadcast_to(
            jnp.array([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]), (FRAMES, 6)
        ),
    }
    params = jax.eval_shape(
        lambda r: unet.init(r, sample[:1], jnp.array(0), ehs[:1], None,
                            {k: v[:1] for k, v in added.items()}),
        jax.random.PRNGKey(3),
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, dtype if s.dtype == jnp.float32 else s.dtype),
        params,
    )

    scheduler = EulerDiscreteScheduler()
    state = scheduler.init(NUM_STEPS)
    coef = jnp.array([0.0, 0.5, 1.0])
    uncond = jax.random.normal(jax.random.PRNGKey(4), ehs.shape, dtype)

    def run(latents):
        return engine.denoise_sequence(
            unet, scheduler, params,
            latents, ehs, uncond, coef, state, jnp.float32(5.0),
            early=AidMode.from_name("fused_outer"),
            late=AidMode.vanilla(),
            num_steps=NUM_STEPS, warmup_steps=NUM_STEPS // 2,
            added_cond=added,
        )

    def force(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    force(run(sample * state.init_noise_sigma))  # compile + warmup

    times = []
    for _ in range(3):
        latents = sample * state.init_noise_sigma
        t0 = time.perf_counter()
        force(run(latents))
        times.append(time.perf_counter() - t0)

    frames_per_sec = FRAMES / min(times)
    print(json.dumps({
        "metric": "interpolation_frames_per_sec_per_chip_sdxl_1024px_28steps",
        "value": round(frames_per_sec, 4),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / A100_BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
