"""Benchmark: interpolation frames/sec/chip on the flagship workload.

Workload (BASELINE.md config #1 scaled to the headline metric): SD-1.5
architecture UNet, 512px (64x64 latents), 25 DDIM steps, 3-frame
[A, interp, B] fused-outer AID interpolation with the reference's exact CFG
structure (cond pass with AID + uncond pass vanilla, two forwards per
step). Random bf16 weights — identical FLOPs/memory behavior to converted
checkpoints.

Baseline: the reference publishes no numbers (BASELINE.md). ``vs_baseline``
is measured against an ESTIMATED A100 torch/diffusers reference of 1.5
frames/sec for this exact workload (batch-3 fp16 SD1.5 UNet ~40 ms/forward
on A100 => 25 steps x 2 forwards x 40 ms = 2.0 s per 3-frame sequence).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


A100_BASELINE_FRAMES_PER_SEC = 1.5  # estimated; see module docstring

NUM_STEPS = 25
FRAMES = 3
LATENT = 64  # 512px / 8


def main():
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.ddim import DDIMScheduler

    dtype = jnp.bfloat16
    cfg = configs.SD15_UNET
    unet = UNet2DCondition(cfg, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (FRAMES, LATENT, LATENT, cfg.in_channels), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, 77, cfg.cross_attention_dim), dtype)
    params = unet.init(jax.random.PRNGKey(2), sample[:1], jnp.array(0), ehs[:1])
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    scheduler = DDIMScheduler()
    state = scheduler.init(NUM_STEPS)
    coef = jnp.array([0.0, 0.5, 1.0])
    uncond = jax.random.normal(jax.random.PRNGKey(3), ehs.shape, dtype)

    def run(latents):
        return engine.denoise_sequence(
            unet, scheduler, params,
            latents, ehs, uncond, coef, state, jnp.float32(7.5),
            early=AidMode.from_name("fused_outer"),
            late=AidMode.vanilla(),
            num_steps=NUM_STEPS, warmup_steps=NUM_STEPS // 2,
        )

    # NOTE: on the axon TPU platform block_until_ready() does not block;
    # force execution by pulling a scalar checksum to host.
    def force(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    # warmup/compile
    force(run(sample * state.init_noise_sigma))

    reps = 3
    times = []
    for _ in range(reps):
        latents = sample * state.init_noise_sigma
        t0 = time.perf_counter()
        force(run(latents))
        times.append(time.perf_counter() - t0)

    best = min(times)
    frames_per_sec = FRAMES / best
    print(json.dumps({
        "metric": "interpolation_frames_per_sec_per_chip_sd15_512px_25steps",
        "value": round(frames_per_sec, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / A100_BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
