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
    import bench

    # shared sampler: probes must use the bench's exact synthetic params
    params = bench._random_params(shapes, dtype)
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



def probe_pack_cost():
    """Cost of the packed-KV materialization (broadcast endpoints + concat)
    relative to the kernel at the SDXL hot shapes: if the packing write+read
    is a few % of kernel time, splitting the kernel into separate
    own/endpoint operands (index-map-constant endpoint fetches) would
    recover it; below ~1% it is not worth the rework."""
    import functools
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    DT = jnp.bfloat16
    for name, (B, H, S) in [("fused4096", (7, 10, 4096)), ("fused1024", (7, 20, 1024))]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, 64), DT)
        k = jax.random.normal(ks[1], (B, H, S, 64), DT)
        v = jax.random.normal(ks[2], (B, H, S, 64), DT)
        coef = jnp.linspace(0, 1, B)

        @jax.jit
        def pack_only(k, v):
            # returns the FULL packed arrays (jit outputs are materialized;
            # a reduction here would let XLA dead-code the concat)
            kb, ke = k[0], k[-1]
            vb, ve = v[0], v[-1]
            def tile(x):
                return jnp.broadcast_to(x[None], (B, H, S, 64))
            kk = jnp.concatenate([k, tile(kb), tile(ke)], axis=2)
            vv = jnp.concatenate([v, tile(vb), tile(ve)], axis=2)
            return kk, vv

        @jax.jit
        def kernel(q, k, v, coef):
            return flash_interpolated_attention(q, k, v, coef, "fused_outer")

        def t_pack():
            # 20 async dispatches, ONE sync at the end (per-scalar pulls
            # would add the ~28 ms tunnel round-trip to every iteration)
            for _ in range(20):
                kk, vv = pack_only(k, v)
            return float(kk[0, 0, 0, 0]) + float(vv[0, 0, 0, 0])

        def t_kernel():
            for _ in range(20):
                out = kernel(q, k, v, coef)
            return float(out[0, 0, 0, 0])

        for tag, fn in [("pack", t_pack), ("kernel", t_kernel)]:
            fn()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                ts.append((time.perf_counter() - t0) / 20)
            log({"probe": f"r4pack_{name}_{tag}", "ms": round(min(ts) * 1e3, 3)})



def probe_pack_cost_ingraph():
    """In-graph (scan) re-measure of the pack cost — the dispatch-loop
    version above carries ~1.5 ms/call tunnel overhead (its kernel@1024
    reads 3.15 ms where the in-graph r3 number is 1.61)."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    DT = jnp.bfloat16
    ITERS = 30
    for name, (B, H, S) in [("fused4096", (7, 10, 4096)), ("fused1024", (7, 20, 1024))]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, 64), DT)
        k = jax.random.normal(ks[1], (B, H, S, 64), DT)
        v = jax.random.normal(ks[2], (B, H, S, 64), DT)
        coef = jnp.linspace(0, 1, B)

        def pack(kv):
            kk, vv = kv
            def tile(x):
                return jnp.broadcast_to(x[None], (B, H, S, 64))
            pk = jnp.concatenate([kk, tile(kk[0]), tile(kk[-1])], axis=2)
            pv = jnp.concatenate([vv, tile(vv[0]), tile(vv[-1])], axis=2)
            # feed a cheap function of the FULL packed arrays back into the
            # carry so the materialization cannot be dead-coded, while the
            # carry shape stays (B,H,S,64)
            return (kk + pk[:, :, S:2 * S] * 1e-9, vv + pv[:, :, 2 * S:] * 1e-9)

        @jax.jit
        def run_pack(kk, vv):
            (ok, ov), _ = jax.lax.scan(lambda c, _: (pack(c), None), (kk, vv), None, length=ITERS)
            return jnp.sum(ok.astype(jnp.float32)) + jnp.sum(ov.astype(jnp.float32))

        @jax.jit
        def run_kernel(q0, kk, vv):
            def body(c, _):
                return flash_interpolated_attention(c, kk, vv, coef, "fused_outer"), None
            y, _ = jax.lax.scan(body, q0, None, length=ITERS)
            return jnp.sum(y.astype(jnp.float32))

        for tag, fn, args in [("pack", run_pack, (k, v)), ("kernel", run_kernel, (q, k, v))]:
            float(fn(*args))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(*args))
                ts.append((time.perf_counter() - t0) / ITERS)
            log({"probe": f"r4packg_{name}_{tag}", "ms": round(min(ts) * 1e3, 3)})


def probe_split_ep():
    """Hardware A/B for the split-endpoint one-pass path: fused_outer at
    the routed one-pass shapes, old packed path unavailable post-change so
    the comparison anchors are the r4packg_* numbers (kernel-with-pack)."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    DT = jnp.bfloat16
    ITERS = 30
    for name, (B, H, S, opmax) in [
        ("fused1024_onepass", (7, 20, 1024, 3072)),
        ("fused4096_onepass", (7, 10, 4096, 16384)),  # forced one-pass at 4096
        ("pure1024_onepass", (7, 20, 1024, 3072)),
    ]:
        mode = "pure_outer" if name.startswith("pure") else "fused_outer"
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, 64), DT)
        k = jax.random.normal(ks[1], (B, H, S, 64), DT)
        v = jax.random.normal(ks[2], (B, H, S, 64), DT)
        coef = jnp.linspace(0, 1, B)

        @jax.jit
        def run(q0, kk, vv):
            def body(c, _):
                return flash_interpolated_attention(
                    c, kk, vv, coef, mode, onepass_max=opmax,
                    static_smax="auto"), None
            y, _ = jax.lax.scan(body, q0, None, length=ITERS)
            return jnp.sum(y.astype(jnp.float32))

        val = float(run(q, k, v))
        assert val == val, f"NaN from {name}"
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(q, k, v))
            ts.append((time.perf_counter() - t0) / ITERS)
        log({"probe": f"r4split_{name}", "ms": round(min(ts) * 1e3, 3)})


def probe_chunk():
    """Hardware A/B for the chunk-skewed one-pass pipeline (pipeline_chunk):
    QK of chunk c+1 issued before exp/PV of chunk c under the static shift.
    Target: the fused@4096 class, where hgroup=1 leaves no head-level
    interleaving and the VPU softmax fully serializes against the MXU
    (~1.9x off the bare QK+PV chain, PERF.md round-3 campaign)."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    DT = jnp.bfloat16
    ITERS = 30
    for name, (B, H, S, opmax) in [
        ("fused4096", (7, 10, 4096, 16384)),
        ("fused1024", (7, 20, 1024, 3072)),
        ("pure1024", (7, 20, 1024, 3072)),
    ]:
        mode = "pure_outer" if name.startswith("pure") else "fused_outer"
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, 64), DT)
        k = jax.random.normal(ks[1], (B, H, S, 64), DT)
        v = jax.random.normal(ks[2], (B, H, S, 64), DT)
        coef = jnp.linspace(0, 1, B)

        for chunk in (0, 512, 1024, 2048):
            @jax.jit
            def run(q0, kk, vv, _c=chunk):
                def body(c, _):
                    return flash_interpolated_attention(
                        c, kk, vv, coef, mode, onepass_max=opmax,
                        static_smax="auto", pipeline_chunk=_c), None
                y, _ = jax.lax.scan(body, q0, None, length=ITERS)
                return jnp.sum(y.astype(jnp.float32))

            try:
                val = float(run(q, k, v))
            except Exception as e:  # compile failure is a result too
                log({"probe": f"r4chunk_{name}_c{chunk}",
                     "error": type(e).__name__, "msg": str(e)[:200]})
                continue
            assert val == val, f"NaN from {name} chunk={chunk}"
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(q, k, v))
                ts.append((time.perf_counter() - t0) / ITERS)
            log({"probe": f"r4chunk_{name}_c{chunk}", "ms": round(min(ts) * 1e3, 3)})


if __name__ == "__main__":
    which = set(sys.argv[1:])
    if not which or "sdxl" in which:
        run_workload("sdxl7f", "SDXL_UNET", 128, 28, 7, 5.0)
    if not which or "sd15" in which:
        run_workload("sd15_7f", "SD15_UNET", 64, 25, 7, 7.5)
    if not which or "pack" in which:
        probe_pack_cost()
    if "packg" in which:
        probe_pack_cost_ingraph()
    if "split" in which:
        probe_split_ep()
    if "chunk" in which:
        probe_chunk()
