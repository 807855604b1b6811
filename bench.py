"""Benchmark: interpolation frames/sec/chip on the headline workload.

Workload (BASELINE.json metric): generate a 7-frame SDXL 1024px
interpolation sequence, 28 steps, Beta(28,28) coefficient schedule,
fused-outer AID with the reference's exact CFG structure (cond pass with
AID + uncond pass vanilla, warmup_ratio 0.5), Euler scheduler. All 7 frames
run as ONE batched jitted program (the TPU-native redesign of the
reference's interpolate_save_gpu, which runs FIVE separate 3-frame
diffusions = 15 frame-denoises for the same sequence). Random bf16 weights
— identical FLOPs/memory behavior to converted checkpoints. Pallas flash
interpolated-attention kernels on the hot path.

Baseline: the reference publishes no numbers (BASELINE.md). ``vs_baseline``
divides by an ESTIMATED A100 torch/diffusers reference running the
reference's own sequence workflow (five 3-frame runs x 28 steps x 2
sequential batch-3 forwards = 840 image-forwards); the derivation with
sources and a [pessimistic, optimistic] bracket is in BASELINE.md ("A100
baseline derivation"): bracket 0.070-0.106 frames/s, divisor pinned at
0.098 (conservative side of central, unchanged since round 1).
``vs_same_chip_reference_workflow`` is the PRIMARY, fully measured
comparison: this same v5e running the reference's own five-3-frame-runs
workflow, re-measured every round with the current kernels (round 3:
46.4 s/sequence = 0.1508 frames/s) so the ratio isolates the sequence-
batching redesign, not kernel differences.

Round-5 additions (VERDICT r4 missing #3/#4):
  * ``mfu_model_vs_peak`` / ``mfu_vs_measured_matmul`` — analytic matmul+conv
    FLOPs of the headline program (jaxpr walk, aid_tpu/utils/flops.py:
    scan x steps, pallas kernels x grid) over measured time, against BOTH
    denominators: 197 TF/s v5e bf16 spec peak, and 144 TF/s this chip's
    measured large-matmul rate.
  * ``phase_p50_s`` / ``phase_share`` — text-encode / denoise / VAE-decode
    split of the full SDXL sequence (synthetic dual text encoders + fp32
    VAE at real scale, per-frame decode matching reference
    pipeline_interpolated_sdxl.py:2387-2390 semantics).
  * ``dyn_selection_*`` — the dynamic-selection workload
    (BetaPriorPipeline.generate_interpolation, exploration 16 -> 7 frames,
    reference prior.py:299-340) on a full synthetic SD1.5 pipeline:
    reference-structured sequential exploration (batch_k=1, one 3-frame
    diffusion per explored point) vs batched candidate exploration
    (batch_k=4, SURVEY §7 mandate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

NOTE (axon): block_until_ready() is a no-op over the tunnel; execution is
forced by pulling a scalar checksum to host.

Set AID_BENCH_TINY=1 for a structural smoke of every section (tiny
configs, few steps — validates the code paths, not performance), and add
AID_BENCH_CPU=1 to actually run it on the CPU backend (without it the
axon sitecustomize routes even tiny runs over the TPU tunnel, where
per-dispatch latency makes the smoke take tens of minutes).
"""

import json
import os
import time

import jax

# AID_BENCH_CPU=1 forces the CPU backend. NOTE: the JAX_PLATFORMS env var
# does NOT work in this image — the axon sitecustomize registers the TPU
# backend at interpreter start regardless — so the CPU structural smoke
# must flip the platform here, before any device use, or it silently runs
# against the TPU tunnel (and contends with a concurrent real bench).
if os.environ.get("AID_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

# persistent compilation cache: the cold Mosaic/XLA compile of the full loop
# takes minutes; repeat runs become seconds
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/aid_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


A100_BASELINE_FRAMES_PER_SEC = 0.098  # estimated; bracket below (BASELINE.md)
A100_BASELINE_BRACKET = (0.070, 0.106)
SAME_CHIP_REFERENCE_WORKFLOW_FRAMES_PER_SEC = 0.1522  # measured on this v5e
# (round 4, tools/opt3_results.jsonl r3_same_chip_reference_workflow: the
# reference's five-3-frame-runs recipe on THIS engine/kernels = 9.20 s per
# 3-frame run; both sides of the ratio use the same round-4 split-endpoint
# kernels and random-normal synthetic params)

TINY = bool(os.environ.get("AID_BENCH_TINY"))  # CPU structural smoke mode

NUM_STEPS = 4 if TINY else 28
FRAMES = 5 if TINY else 7
LATENT = 8 if TINY else 128  # 1024px / 8


def _random_params(shapes, dtype):
    """Random-normal leaves (float leaves ~N(0, 0.02), others zero) — the
    identical-FLOPs stand-in for converted checkpoints."""
    import jax
    import jax.numpy as jnp

    counter = iter(range(10 ** 6))

    def leaf(s):
        if s.dtype not in (jnp.float32, jnp.bfloat16):
            return jnp.zeros(s.shape, s.dtype)
        k = jax.random.fold_in(jax.random.PRNGKey(6), next(counter))
        return (jax.random.normal(k, s.shape, jnp.float32) * 0.02).astype(dtype)

    return jax.tree_util.tree_map(leaf, shapes)


def build_headline(num_steps=None, frames=None, latent=None):
    """The headline program — 7-frame SDXL 1024px fused-outer AID sequence
    — as a namespace, shared by this bench AND tools/trace_r5.py (the round
    trace must profile the EXACT program the bench times; a drifting copy
    would invalidate the PERF.md attribution).

    Returns a SimpleNamespace with the model/program pieces (unet, cfg,
    params, sample, ehs, uncond, coef, scheduler, state, added) plus
    ``run(latents)`` (denoise_sequence — donates latents, pass a fresh
    product per call) and ``force(out)`` (checksum pull: forces execution
    on axon where block_until_ready is a no-op, and asserts finiteness)."""
    from types import SimpleNamespace

    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.ops.interp import generate_beta_schedule
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler

    num_steps = NUM_STEPS if num_steps is None else num_steps
    frames = FRAMES if frames is None else frames
    latent = LATENT if latent is None else latent

    dtype = jnp.bfloat16
    cfg = configs.TINY_SDXL_UNET if TINY else configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=dtype)

    pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
    sample = jax.random.normal(jax.random.PRNGKey(0), (frames, latent, latent, cfg.in_channels), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (frames, 77, cfg.cross_attention_dim), dtype)
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(2), (frames, pooled_dim), dtype),
        "time_ids": jnp.broadcast_to(
            jnp.array([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]), (frames, 6)
        ),
    }
    params = jax.eval_shape(
        lambda r: unet.init(r, sample[:1], jnp.array(0), ehs[:1], None,
                            {k: v[:1] for k, v in added.items()}),
        jax.random.PRNGKey(3),
    )
    # RANDOM normals, not constant fill: constant-filled params NaN both the
    # SD1.5 AND SDXL UNets (activation growth through the GroupNorm/Dense
    # stacks — round-2 finding, re-confirmed round 4 with a 2-step A/B:
    # constant params NaN with old and new kernels alike, random params are
    # finite). Same FLOPs/memory either way; the force() checksum assert
    # below is only meaningful with finite activations.
    params = _random_params(params, dtype)

    scheduler = EulerDiscreteScheduler()
    state = scheduler.init(num_steps)
    coef = jnp.asarray(generate_beta_schedule(frames, num_steps, num_steps, force_endpoints=True))
    uncond = jax.random.normal(jax.random.PRNGKey(4), ehs.shape, dtype)

    def run(latents):
        return engine.denoise_sequence(
            unet, scheduler, params,
            latents, ehs, uncond, coef, state, jnp.float32(5.0),
            early=AidMode.from_name("fused_outer"),
            late=AidMode.vanilla(),
            num_steps=num_steps, warmup_steps=num_steps // 2,
            added_cond=added,
        )

    def force(out):
        # the checksum pull both forces execution (block_until_ready is a
        # no-op on axon) and guards the headline against silent NaNs from
        # synthetic params (VERDICT r3 weak #4: a NaN'd run still times)
        val = float(jnp.sum(out.astype(jnp.float32)))
        assert val == val and abs(val) != float("inf"), (
            f"non-finite bench output checksum: {val}")
        return val

    return SimpleNamespace(
        unet=unet, cfg=cfg, params=params, sample=sample, ehs=ehs,
        uncond=uncond, coef=coef, scheduler=scheduler, state=state,
        added=added, run=run, force=force, dtype=dtype,
    )


def main():
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.ops.interp import generate_beta_schedule
    from aid_tpu.pipelines import engine

    hl = build_headline()
    unet, cfg, params = hl.unet, hl.cfg, hl.params
    sample, ehs, uncond, coef = hl.sample, hl.ehs, hl.uncond, hl.coef
    scheduler, state, added = hl.scheduler, hl.state, hl.added
    run, force, dtype = hl.run, hl.force, hl.dtype

    force(run(sample * state.init_noise_sigma))  # compile + warmup

    times = []
    for _ in range(3):
        latents = sample * state.init_noise_sigma
        t0 = time.perf_counter()
        force(run(latents))
        times.append(time.perf_counter() - t0)

    frames_per_sec = FRAMES / min(times)

    # ---- MFU (VERDICT r4 missing #4): analytic matmul+conv FLOPs of the
    # exact headline program, by jaxpr traversal (never executes — safe on
    # the tunnel). Elementwise/softmax/norm FLOPs are excluded, so this is
    # a floor on true hardware utilization; see aid_tpu/utils/flops.py.
    from aid_tpu.utils.flops import (
        MEASURED_MATMUL_FLOPS,
        TPU_V5E_PEAK_BF16_FLOPS,
        count_flops,
    )

    headline_flops = count_flops(run, sample * state.init_noise_sigma)
    t_best = min(times)
    mfu_peak = headline_flops / t_best / TPU_V5E_PEAK_BF16_FLOPS
    mfu_measured = headline_flops / t_best / MEASURED_MATMUL_FLOPS

    # secondary size-8 metric. The round-2 "free 8th frame" note held for a
    # single VANILLA forward (conv/GEMM batch dim pads 7->8 in XLA), but the
    # full sequence is NOT free: the attention kernels grid over B and the
    # VAE decodes per frame, so measured size-8 throughput is neutral
    # (0.294 vs 0.301 frames/s, round 3) — reported for users picking
    # sequence sizes, with the 7-frame number as the headline.
    sample8 = jnp.concatenate([sample, sample[:1]], axis=0)
    ehs8 = jnp.concatenate([ehs, ehs[:1]], axis=0)
    uncond8 = jnp.concatenate([uncond, uncond[:1]], axis=0)
    added8 = {k: jnp.concatenate([v, v[:1]], axis=0) for k, v in added.items()}
    coef8 = jnp.asarray(generate_beta_schedule(FRAMES + 1, NUM_STEPS, NUM_STEPS, force_endpoints=True))

    def run8(latents):
        return engine.denoise_sequence(
            unet, scheduler, params,
            latents, ehs8, uncond8, coef8, state, jnp.float32(5.0),
            early=AidMode.from_name("fused_outer"),
            late=AidMode.vanilla(),
            num_steps=NUM_STEPS, warmup_steps=NUM_STEPS // 2,
            added_cond=added8,
        )

    force(run8(sample8 * state.init_noise_sigma))  # compile + warmup
    times8 = []
    for _ in range(2):
        latents = sample8 * state.init_noise_sigma
        t0 = time.perf_counter()
        force(run8(latents))
        times8.append(time.perf_counter() - t0)

    # ---- SD1.5 workloads (BASELINE.json configs #1/#2): 512px latents,
    # 25 DDIM steps. Config #1 = 3-frame AID fused-outer; config #2 = PAID
    # 7-frame (guide-prompt broadcast embeds, Beta-PPF coef schedule).
    # Synthetic params are RANDOM normals (constant-filled params NaN the
    # SD1.5 GroupNorm stack — round-2 finding); the force() checksum guards
    # finiteness either way.
    from aid_tpu.schedulers.ddim import DDIMScheduler

    sd_cfg = configs.TINY_UNET if TINY else configs.SD15_UNET
    SD_LATENT = 8 if TINY else 64  # 512px / 8
    SD_STEPS = 4 if TINY else 25
    sd_unet = UNet2DCondition(sd_cfg, dtype=dtype)
    sd_shapes = jax.eval_shape(
        lambda r: sd_unet.init(r, jnp.zeros((1, SD_LATENT, SD_LATENT, sd_cfg.in_channels), dtype),
                               jnp.array(0),
                               jnp.zeros((1, 77, sd_cfg.cross_attention_dim), dtype)),
        jax.random.PRNGKey(5),
    )
    sd_params = _random_params(sd_shapes, dtype)
    sd_sched = DDIMScheduler()
    sd_state = sd_sched.init(SD_STEPS)

    def sd_run(n_frames, paid):
        lat = jax.random.normal(jax.random.PRNGKey(7), (n_frames, SD_LATENT, SD_LATENT, sd_cfg.in_channels), dtype)
        e_s = jax.random.normal(jax.random.PRNGKey(8), (1, 77, sd_cfg.cross_attention_dim), dtype)
        e_e = jax.random.normal(jax.random.PRNGKey(9), (1, 77, sd_cfg.cross_attention_dim), dtype)
        if paid:  # guide-prompt broadcast for the middles (PAID)
            e_g = jax.random.normal(jax.random.PRNGKey(10), e_s.shape, dtype)
            embs_sd = jnp.concatenate([e_s] + [e_g] * (n_frames - 2) + [e_e], axis=0)
        else:
            w = jnp.linspace(0, 1, n_frames).reshape(-1, 1, 1)
            embs_sd = (1 - w) * e_s + w * e_e
        un_sd = jax.random.normal(jax.random.PRNGKey(11), embs_sd.shape, dtype)
        coef_sd = jnp.asarray(generate_beta_schedule(n_frames, SD_STEPS, SD_STEPS, force_endpoints=True))

        def go(latents):
            return engine.denoise_sequence(
                sd_unet, sd_sched, sd_params,
                latents, embs_sd, un_sd, coef_sd, sd_state, jnp.float32(7.5),
                early=AidMode.from_name("fused_outer"), late=AidMode.vanilla(),
                num_steps=SD_STEPS, warmup_steps=SD_STEPS // 2,
            )

        force(go(lat * sd_state.init_noise_sigma))  # compile + warmup
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(go(lat * sd_state.init_noise_sigma))
            ts.append(time.perf_counter() - t0)
        return n_frames / min(ts)

    sd15_3f = sd_run(3, paid=False)
    sd15_paid_7f = sd_run(7, paid=True)

    # ---- Phase breakdown (VERDICT r4 missing #4): text-encode / denoise /
    # VAE-decode split of the FULL SDXL sequence. Synthetic dual text
    # encoders (CLIP-L + bigG) and fp32 VAE at real scale; per-frame decode
    # matches the reference's memory-capped SDXL semantics
    # (pipeline_interpolated_sdxl.py:2387-2390). The headline metric above
    # stays denoise-only for round-over-round comparability;
    # ``latency_s_full_sequence`` is the end-to-end number.
    from aid_tpu.models import AutoencoderKL, CLIPTextModel
    from aid_tpu.utils.profiling import PhaseTimer
    from aid_tpu.utils.tokenizer import HashTokenizer

    te1_cfg = configs.TINY_CLIP_TEXT if TINY else configs.CLIP_VIT_L_TEXT
    te2_cfg = configs.TINY_CLIP_TEXT if TINY else configs.SDXL_TEXT_ENCODER_2
    vae_cfg = configs.TINY_VAE if TINY else configs.SDXL_VAE
    te1 = CLIPTextModel(te1_cfg, dtype=dtype)
    te2 = CLIPTextModel(te2_cfg, dtype=dtype)
    tok = HashTokenizer(te1_cfg.vocab_size)
    ids = jnp.asarray(tok("a photo of a dog")), jnp.asarray(tok("a photo of a cat"))
    zero_ids = jnp.zeros((1, 77), jnp.int32)
    te1_params = _random_params(
        jax.eval_shape(lambda r: te1.init(r, zero_ids), jax.random.PRNGKey(12)), dtype)
    te2_params = _random_params(
        jax.eval_shape(lambda r: te2.init(r, zero_ids), jax.random.PRNGKey(13)), dtype)
    enc1 = jax.jit(te1.apply)
    enc2 = jax.jit(te2.apply)
    img_hw = LATENT * (2 ** (len(vae_cfg.block_out_channels) - 1))
    vae = AutoencoderKL(vae_cfg)  # fp32: reference force-upcast semantics
    vae_params = _random_params(
        jax.eval_shape(lambda r: vae.init(r, jnp.zeros((1, img_hw, img_hw, 3), jnp.float32)),
                       jax.random.PRNGKey(14)), jnp.float32)

    def encode_prompts():
        # 2 endpoint prompts x (cond + uncond) x 2 encoders — what the SDXL
        # pipeline's encode_prompt performs per sequence
        s = 0.0
        for i in (*ids, zero_ids, zero_ids):
            s += force(enc1(te1_params, i)[0]) + force(enc2(te2_params, i)[0])
        return s

    final_latents = run(sample * state.init_noise_sigma)
    force(final_latents)

    def decode():
        return engine.decode_latents(vae, vae_params, final_latents,
                                     vae_cfg.scaling_factor, per_frame=True)

    encode_prompts()  # compile + warmup
    force(decode())
    # p50 of 3 passes per phase (matching latency_s_p50's median-of-3 —
    # a single sample labeled p50 would bake one noisy pass into the
    # artifact; round-5 review finding)
    phase_samples = {}
    for _ in range(3):
        timer = PhaseTimer()
        with timer.phase("text_encode") as ph:
            ph.sync(encode_prompts())  # force() already pulled to host
        with timer.phase("denoise") as ph:
            ph.sync(force(run(sample * state.init_noise_sigma)))
        with timer.phase("vae_decode") as ph:
            ph.sync(force(decode()))
        for k, v in timer.totals.items():
            phase_samples.setdefault(k, []).append(v)
    phase_p50 = {k: round(sorted(v)[len(v) // 2], 3)
                 for k, v in phase_samples.items()}
    full_latency = sum(phase_p50.values())
    phase_share = {k: round(v / full_latency, 3) for k, v in phase_p50.items()}

    # ---- Dynamic-selection workload (VERDICT r4 missing #3 / SURVEY §7):
    # BetaPriorPipeline.generate_interpolation (exploration 16 -> 7 frames,
    # reference prior.py:299-340) on a full synthetic SD1.5 512px pipeline.
    # batch_k=1 is the reference's sequential structure (one 3-frame
    # diffusion per explored point = 42 frame-denoises); batch_k=4 explores
    # the 4 largest gaps per round in one (k+2)-frame batched run
    # (24 frame-denoises). uniform=True keeps the exploration control flow
    # deterministic so both arms run identical per-round shapes; the
    # feature scorer is a mean-pool pixel stand-in for CLIP ViT-B/32
    # (<2% of the real workload's time) — per-round COMPUTE is invariant
    # to scores.
    from aid_tpu.pipelines import InterpolationPipeline
    from aid_tpu.prior.beta import BetaPriorPipeline

    import numpy as np

    sd_text_cfg = configs.TINY_CLIP_TEXT if TINY else configs.CLIP_VIT_L_TEXT
    sd_vae_cfg = configs.TINY_VAE if TINY else configs.SD_VAE
    sd_text = CLIPTextModel(sd_text_cfg, dtype=dtype)
    sd_text_params = _random_params(
        jax.eval_shape(lambda r: sd_text.init(r, zero_ids), jax.random.PRNGKey(15)), dtype)
    sd_f = 2 ** (len(sd_vae_cfg.block_out_channels) - 1)
    sd_img = SD_LATENT * sd_f
    sd_vae = AutoencoderKL(sd_vae_cfg)
    sd_vae_params = _random_params(
        jax.eval_shape(lambda r: sd_vae.init(r, jnp.zeros((1, sd_img, sd_img, 3), jnp.float32)),
                       jax.random.PRNGKey(16)), jnp.float32)
    pipe = InterpolationPipeline(
        unet=sd_unet, unet_params=sd_params, vae=sd_vae, vae_params=sd_vae_params,
        text_encoder=sd_text, text_params=sd_text_params,
        tokenizer=HashTokenizer(sd_text_cfg.vocab_size),
        scheduler=DDIMScheduler(), vae_scale_factor=sd_f,
    )
    lat_a, lat_b = pipe.generate_latent(0), pipe.generate_latent(1)

    def pixel_features(ims):
        a = np.asarray(ims, np.float32)
        b, h, w, c = a.shape
        p = min(16, h)
        return a.reshape(b, p, h // p, p, w // p, c).mean((2, 4)).reshape(b, -1)

    bp = BetaPriorPipeline(pipe, pixel_features)
    EXPLORE = 6 if TINY else 16
    SELECT = 4 if TINY else 7

    def dyn_workload(batch_k):
        t0 = time.perf_counter()
        out = bp.generate_interpolation(
            "a photo of a dog", "a photo of a cat",
            latent_start=lat_a, latent_end=lat_b,
            num_inference_steps=SD_STEPS, exploration_size=EXPLORE,
            interpolation_size=SELECT, uniform=True, batch_k=batch_k)
        assert len(out) == SELECT, f"selected {len(out)} != {SELECT}"
        return time.perf_counter() - t0

    dyn_workload(4)  # compile + warm every batched shape (incl. 3-frame)
    dyn_workload(1)
    dyn_seq_s = min(dyn_workload(1) for _ in range(2))
    dyn_bat_s = min(dyn_workload(4) for _ in range(2))

    print(json.dumps({
        "metric": "sequence_frames_per_sec_per_chip_sdxl_1024px_28steps_7frames",
        "value": round(frames_per_sec, 4),
        "unit": "frames/s",
        # estimated A100 divisor 0.098 (bracket-derived; BASELINE.md)
        "vs_baseline": round(frames_per_sec / A100_BASELINE_FRAMES_PER_SEC, 3),
        "vs_baseline_bracket": [
            round(frames_per_sec / A100_BASELINE_BRACKET[1], 2),
            round(frames_per_sec / A100_BASELINE_BRACKET[0], 2),
        ],
        # PRIMARY measured comparison: same chip running the reference's
        # own five-3-frame-runs workflow (divisor constant above,
        # re-measured each round with the current kernels)
        "vs_same_chip_reference_workflow": round(
            frames_per_sec / SAME_CHIP_REFERENCE_WORKFLOW_FRAMES_PER_SEC, 3),
        # BASELINE.json's second metric: p50 full-sequence latency
        "latency_s_p50": round(sorted(times)[len(times) // 2], 3),
        "frames_per_sec_size8": round((FRAMES + 1) / min(times8), 4),
        # BASELINE.json configs #1/#2 (SD-1.5 512px, 25 DDIM steps)
        "sd15_3frame_frames_per_sec": round(sd15_3f, 3),
        "sd15_paid_7frame_frames_per_sec": round(sd15_paid_7f, 3),
        # MFU of the headline program: analytic matmul+conv FLOPs (floor on
        # true utilization; VPU work excluded) over best measured time.
        # Denominators: 197 TF/s v5e bf16 spec peak / 144 TF/s this chip's
        # measured large-matmul rate (aid_tpu/utils/flops.py).
        "headline_matmul_conv_tflop": round(headline_flops / 1e12, 1),
        "mfu_model_vs_peak": round(mfu_peak, 4),
        "mfu_vs_measured_matmul": round(mfu_measured, 4),
        # end-to-end sequence split (text-encode / denoise / VAE-decode)
        "latency_s_full_sequence": round(full_latency, 3),
        "phase_p50_s": phase_p50,
        "phase_share": phase_share,
        # dynamic-selection workload (exploration 16 -> 7 frames):
        # reference-structured sequential vs SURVEY §7 batched exploration
        "dyn_selection_sd15_sequential_s": round(dyn_seq_s, 2),
        "dyn_selection_sd15_batched_s": round(dyn_bat_s, 2),
        "dyn_selection_batched_speedup": round(dyn_seq_s / dyn_bat_s, 2),
    }))


if __name__ == "__main__":
    from aid_tpu.utils.tpulock import tpu_lock

    # serialize tunnel access: two concurrent axon dialers deadlock the
    # chip claim (round-5 finding); a second launch waits here instead
    with tpu_lock():
        main()
