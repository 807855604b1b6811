"""Isolate the SDXL headline-bench NaN: split-endpoint kernel vs params.

Runs the bench's exact SDXL config at 2 steps, printing the checksum with
(a) the working-tree routing (split-endpoint one-pass path active) and
(b) the split path disabled (_SPLIT_EP_ENABLE=False -> old packed
routing). jax caches are CLEARED between configs: _SPLIT_EP_ENABLE is
read at trace time only, so without clearing, a second config with
identical avals would silently reuse the first config's compiled program
and the A/B would compare a program with itself.
Usage: python tools/nan_repro.py [split|nosplit|f32|randparams] ...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/aid_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(tag, steps=2, randparams=False, dtype=jnp.bfloat16):
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.ops.interp import generate_beta_schedule
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler

    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=dtype)
    F, L = 7, 128
    sample = jax.random.normal(jax.random.PRNGKey(0), (F, L, L, cfg.in_channels), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (F, 77, cfg.cross_attention_dim), dtype)
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(2), (F, 1280), dtype),
        "time_ids": jnp.broadcast_to(jnp.array([1024.0, 1024.0, 0, 0, 1024.0, 1024.0]), (F, 6)),
    }
    shapes = jax.eval_shape(
        lambda r: unet.init(r, sample[:1], jnp.array(0), ehs[:1], None,
                            {k: v[:1] for k, v in added.items()}),
        jax.random.PRNGKey(3))
    if randparams:
        # the ONE synthetic-params sampler, shared with the bench: the
        # NaN-vs-params evidence chain depends on every tool sampling
        # identical params
        import bench

        params = bench._random_params(shapes, dtype)
    else:
        params = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, dtype if s.dtype == jnp.float32 else s.dtype),
            shapes)

    sch = EulerDiscreteScheduler()
    state = sch.init(steps)
    coef = jnp.asarray(generate_beta_schedule(F, steps, steps, force_endpoints=True))
    uncond = jax.random.normal(jax.random.PRNGKey(4), ehs.shape, dtype)
    out = engine.denoise_sequence(
        unet, sch, params, sample * state.init_noise_sigma, ehs, uncond, coef,
        state, jnp.float32(5.0), early=AidMode.from_name("fused_outer"),
        late=AidMode.vanilla(), num_steps=steps, warmup_steps=steps // 2,
        added_cond=added)
    v = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{tag}] checksum: {v}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["split"]
    import aid_tpu.ops.flash_attention as fa
    for w in which:
        jax.clear_caches()  # routing flags are trace-time; see docstring
        if w == "nosplit":
            fa._SPLIT_EP_ENABLE = False
            run("nosplit")
            fa._SPLIT_EP_ENABLE = True
        elif w == "randparams":
            run("randparams", randparams=True)
        elif w == "f32":
            run("f32", dtype=jnp.float32)
        else:
            run("split")
