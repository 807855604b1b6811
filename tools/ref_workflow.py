"""Same-chip reference-workflow measurement (BASELINE.md primary metric).

Runs the reference's own 7-frame sequence recipe on THIS engine and chip:
``interpolate_save_gpu`` = five independent 3-frame ``interpolate_single``
runs (gradio_src/pipeline_interpolated_stable_diffusion.py:306-392), each
28 Euler steps, fused-outer warmup + vanilla CFG — against which bench.py's
full-sequence batched number isolates the value of the one-program
redesign on identical hardware and identical kernels.

Prints one JSON line; writes tools/opt3_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/aid_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NUM_STEPS = 28
LATENT = 128
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "opt3_results.jsonl")


def main():
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler

    dtype = jnp.bfloat16
    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=dtype)
    B = 3
    sample = jax.random.normal(jax.random.PRNGKey(0), (B, LATENT, LATENT, cfg.in_channels), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (B, 77, cfg.cross_attention_dim), dtype)
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(2), (B, 1280), dtype),
        "time_ids": jnp.broadcast_to(
            jnp.array([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]), (B, 6)),
    }
    params = jax.eval_shape(
        lambda r: unet.init(r, sample[:1], jnp.array(0), ehs[:1], None,
                            {k: v[:1] for k, v in added.items()}),
        jax.random.PRNGKey(3))
    import bench
    params = bench._random_params(params, dtype)  # finite activations (see bench.py)

    scheduler = EulerDiscreteScheduler()
    state = scheduler.init(NUM_STEPS)
    coef = jnp.array([0.0, 0.5, 1.0])
    uncond = jax.random.normal(jax.random.PRNGKey(4), ehs.shape, dtype)

    def run(latents):
        return engine.denoise_sequence(
            unet, scheduler, params, latents, ehs, uncond, coef, state,
            jnp.float32(5.0), early=AidMode.from_name("fused_outer"),
            late=AidMode.vanilla(), num_steps=NUM_STEPS,
            warmup_steps=NUM_STEPS // 2, added_cond=added)

    def force(out):
        val = float(jnp.sum(out.astype(jnp.float32)))
        assert val == val, f"non-finite reference-workflow checksum: {val}"
        return val

    force(run(sample * state.init_noise_sigma))  # compile
    times = []
    for _ in range(3):
        latents = sample * state.init_noise_sigma
        t0 = time.perf_counter()
        force(run(latents))
        times.append(time.perf_counter() - t0)
    per_run = min(times)
    seq_s = 5 * per_run  # interpolate_save_gpu: five 3-frame runs per 7-frame sequence
    rec = json.dumps({
        "probe": "r3_same_chip_reference_workflow",
        "per_3frame_run_s": round(per_run, 2),
        "seq_s_5runs": round(seq_s, 2),
        "frames_per_sec": round(7 / seq_s, 4),
    })
    print(rec, flush=True)
    with open(RESULTS, "a") as f:
        f.write(rec + "\n")


if __name__ == "__main__":
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    main()
