"""SDXL UNet forward timing (B=7, 1024px shapes) — the headline bench's
per-step cost. Run after layer/kernel changes to see the real effect.

    python tools/fwd_probe.py [vanilla] [fused]
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

DT = jnp.bfloat16
B = 7
ITERS = 20

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fwd_results.jsonl")


def main():
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidContext, AidMode

    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=DT)
    x = jnp.full((B, 128, 128, 4), 0.01, DT)
    ehs = jnp.full((B, 77, 2048), 0.01, DT)
    added = {"text_embeds": jnp.full((B, 1280), 0.01, DT),
             "time_ids": jnp.broadcast_to(
                 jnp.array([1024., 1024., 0., 0., 1024., 1024.]), (B, 6))}
    p = jax.eval_shape(lambda r: unet.init(r, x[:1], jnp.array(0), ehs[:1], None,
                                           {k: v[:1] for k, v in added.items()}),
                       jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, DT if s.dtype == jnp.float32 else s.dtype), p)
    coef = jnp.linspace(0, 1, B)
    skipv = (coef == 0.0) | (coef == 1.0)

    def bench(name, aid):
        @jax.jit
        def run(p_, x0):
            def body(c, _):
                return unet.apply(p_, c, jnp.array(500), ehs, aid, added) * 0.1, None
            y, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(y.astype(jnp.float32))

        float(run(p, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(p, x))
            times.append(time.perf_counter() - t0)
        ms = min(times) / ITERS * 1e3
        rec = json.dumps({"probe": f"sdxl_fwd_{name}_b{B}", "ms_per_iter": round(ms, 2),
                          "eff_tflops_s": round(B * 6.1 / ms, 1)})
        print(rec, flush=True)
        with open(RESULTS, "a") as f:
            f.write(rec + "\n")

    which = sys.argv[1:] or ["vanilla", "fused"]
    if "vanilla" in which:
        bench("vanilla", None)
    if "fused" in which:
        bench("fused", AidContext(coef=coef, mode=AidMode.from_name("fused_outer")))


if __name__ == "__main__":
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    main()
