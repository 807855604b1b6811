"""Round-4 perf probes on the real chip.

1. Batched vs sequential CFG at the headline workload (VERDICT r3 next #3a):
   the only A/B still standing on round-1 numbers. cfg_mode="batched" runs
   ONE 2N-batch forward per step (uncond rows reduce to vanilla by the
   duplicated-KV identity) vs the reference's two sequential N-batch
   forwards — halves weight HBM traffic per step, doubles activation batch.
2. Same A/B at the SD1.5 7-frame workload (smaller model = weight traffic
   matters relatively more).

Writes tools/opt4_results.jsonl; prints one JSON line per probe.
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

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "opt4_results.jsonl")


def log(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def run_workload(tag, cfgname, latent, steps, frames, guidance):
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.ops.interp import generate_beta_schedule
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler

    dtype = jnp.bfloat16
    cfg = getattr(configs, cfgname)
    unet = UNet2DCondition(cfg, dtype=dtype)
    sample = jax.random.normal(jax.random.PRNGKey(0), (frames, latent, latent, cfg.in_channels), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (frames, 77, cfg.cross_attention_dim), dtype)
    added = None
    if cfg.addition_embed_type == "text_time":
        added = {
            "text_embeds": jax.random.normal(jax.random.PRNGKey(2), (frames, 1280), dtype),
            "time_ids": jnp.broadcast_to(
                jnp.array([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]), (frames, 6)),
        }
    init_added = {k: v[:1] for k, v in added.items()} if added else None
    shapes = jax.eval_shape(
        lambda r: unet.init(r, sample[:1], jnp.array(0), ehs[:1], None, init_added),
        jax.random.PRNGKey(3))
    counter = iter(range(10 ** 6))

    def rand_leaf(s):
        if s.dtype not in (jnp.float32, jnp.bfloat16):
            return jnp.zeros(s.shape, s.dtype)
        k = jax.random.fold_in(jax.random.PRNGKey(6), next(counter))
        return (jax.random.normal(k, s.shape, jnp.float32) * 0.02).astype(dtype)

    params = jax.tree_util.tree_map(rand_leaf, shapes)
    scheduler = EulerDiscreteScheduler()
    state = scheduler.init(steps)
    coef = jnp.asarray(generate_beta_schedule(frames, steps, steps, force_endpoints=True))
    uncond = jax.random.normal(jax.random.PRNGKey(4), ehs.shape, dtype)

    def run(latents, cfg_mode):
        return engine.denoise_sequence(
            unet, scheduler, params,
            latents, ehs, uncond, coef, state, jnp.float32(guidance),
            early=AidMode.from_name("fused_outer"), late=AidMode.vanilla(),
            num_steps=steps, warmup_steps=steps // 2,
            added_cond=added, cfg_mode=cfg_mode,
        )

    out = {}
    for cfg_mode in ("sequential", "batched"):
        v = float(jnp.sum(run(sample * state.init_noise_sigma, cfg_mode).astype(jnp.float32)))
        assert v == v, f"NaN from {tag}/{cfg_mode}"
        ts = []
        for _ in range(3):
            lat = sample * state.init_noise_sigma
            t0 = time.perf_counter()
            float(jnp.sum(run(lat, cfg_mode).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        out[cfg_mode] = min(ts)
        log({"probe": f"r4cfg_{tag}_{cfg_mode}", "s_per_sequence": round(min(ts), 3),
             "frames_per_sec": round(frames / min(ts), 4)})
    log({"probe": f"r4cfg_{tag}_verdict",
         "batched_speedup": round(out["sequential"] / out["batched"], 4)})


if __name__ == "__main__":
    which = set(sys.argv[1:])
    if not which or "sdxl" in which:
        run_workload("sdxl7f", "SDXL_UNET", 128, 28, 7, 5.0)
    if not which or "sd15" in which:
        run_workload("sd15_7f", "SD15_UNET", 64, 25, 7, 7.5)
