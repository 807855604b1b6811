"""Round-3 probe set: single-kv-block kernel fast path, cross-attention
backend threshold, batched-CFG batch sizes, bf16 VAE decode.

Overhead-corrected (ITERS>=50 amortizes the ~28 ms tunnel dispatch; null-op
floor ~0.6 ms, see PERF.md round-2 methodology).

Run: python tools/opt_probe3.py [probe ...]
Probes: flash, cross, fwd, batch, vae, null
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
ITERS = 50
B = 7

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "opt3_results.jsonl")


def bench(name, fn, x, flops_per_iter=0.0, iters=ITERS):
    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), None
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    float(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    per_iter = min(times) / iters
    rec = json.dumps({
        "probe": name, "ms_per_iter": round(per_iter * 1e3, 3),
        "effective_tflops_s": round(flops_per_iter / per_iter / 1e12, 1) if flops_per_iter else 0.0,
    })
    print(rec, flush=True)
    with open(RESULTS, "a") as f:
        f.write(rec + "\n")
    return per_iter


def probe_null():
    bench("null_op", lambda c: c * 1.000001, jnp.ones((8, 128), DT), 0)


def _attn_inputs(b, h, s, l, d, dt=DT):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), dt)
    k = jax.random.normal(ks[1], (b, h, l, d), dt)
    v = jax.random.normal(ks[2], (b, h, l, d), dt)
    coef = jnp.linspace(0, 1, b)
    return q, k, v, coef


def probe_flash():
    """Self/fused at the SDXL shapes; S=1024 self now hits the fast path."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    for (h, s, mode) in [(20, 1024, "self"), (10, 4096, "self"),
                         (20, 1024, "fused_outer"), (10, 4096, "fused_outer")]:
        q, k, v, coef = _attn_inputs(B, h, s, s, 64)
        mult = {"self": 1, "fused_outer": 3}[mode]
        flops = 4 * B * h * s * (s * mult) * 64
        bench(f"r3flash_{mode}_b{B}h{h}s{s}d64",
              lambda c, k=k, v=v, coef=coef, mode=mode: flash_interpolated_attention(
                  c, k, v, coef, mode) * 1.0 + c * 0.0,
              q, flops)


def probe_cross():
    """Cross-attention L=77: xla path (current dispatch) vs the kernel fast
    path — decides the dispatch threshold."""
    from aid_tpu.ops.attention import interpolated_attention
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    for (h, s) in [(10, 4096), (20, 1024)]:
        q, k, v, coef = _attn_inputs(B, h, s, 77, 64)
        flops = 4 * B * h * s * 77 * 64
        bench(f"r3cross_xla_b{B}h{h}s{s}L77",
              lambda c, k=k, v=v, coef=coef: interpolated_attention(
                  c, k, v, coef, "self") * 1.0 + c * 0.0, q, flops)
        bench(f"r3cross_flash_b{B}h{h}s{s}L77",
              lambda c, k=k, v=v, coef=coef: flash_interpolated_attention(
                  c, k, v, coef, "self") * 1.0 + c * 0.0, q, flops)


def _unet_setup(b):
    from aid_tpu.models import UNet2DCondition, configs

    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=DT)
    x = jnp.full((b, 128, 128, 4), 0.01, DT)
    ehs = jnp.full((b, 77, 2048), 0.01, DT)
    added = {"text_embeds": jnp.full((b, 1280), 0.01, DT),
             "time_ids": jnp.broadcast_to(
                 jnp.array([1024., 1024., 0., 0., 1024., 1024.]), (b, 6))}
    p = jax.eval_shape(lambda r: unet.init(r, x[:1], jnp.array(0), ehs[:1], None,
                                           {k: v[:1] for k, v in added.items()}),
                       jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, DT if s.dtype == jnp.float32 else s.dtype), p)
    return unet, p, x, ehs, added


def probe_fwd(iters=20):
    """Post-kernel-change SDXL forward costs (vanilla + fused warmup)."""
    from aid_tpu.models.layers import AidContext, AidMode

    unet, p, x, ehs, added = _unet_setup(B)
    coef = jnp.linspace(0, 1, B)
    for name, aid in [("vanilla", None),
                      ("fused", AidContext(coef=coef, mode=AidMode.from_name("fused_outer")))]:
        bench(f"r3fwd_{name}_b{B}",
              lambda c, aid=aid: unet.apply(p, c, jnp.array(500), ehs, aid, added) * 0.1,
              x, 0.0, iters=iters)


def probe_batch(iters=20):
    """Batched-CFG candidates: one B=14/16 vanilla forward vs two B=7/8."""
    from aid_tpu.models.layers import AidContext, AidMode

    for b in (8, 14, 16):
        unet, p, x, ehs, added = _unet_setup(b)
        bench(f"r3fwd_vanilla_b{b}",
              lambda c: unet.apply(p, c, jnp.array(500), ehs, None, added) * 0.1,
              x, 0.0, iters=iters)
        if b == 14:
            coef = jnp.concatenate([jnp.linspace(0, 1, 7)] * 2)
            aid = AidContext(coef=coef, mode=AidMode(text=AidMode.from_name("fused_outer").text,
                                                     ip=None, ip_coef_scaled=False, cfg_split=7))
            try:
                bench(f"r3fwd_fused_cfgsplit_b{b}",
                      lambda c, aid=aid: unet.apply(p, c, jnp.array(500), ehs, aid, added) * 0.1,
                      x, 0.0, iters=iters)
            except Exception as e:
                print(json.dumps({"probe": f"r3fwd_fused_cfgsplit_b{b}", "error": str(e)[:200]}),
                      flush=True)


def probe_vae(iters=5):
    """7-frame SDXL 1024px VAE decode: f32 (reference upcast policy) vs bf16."""
    from aid_tpu.models import AutoencoderKL, configs

    z = jax.random.normal(jax.random.PRNGKey(0), (B, 128, 128, 4), jnp.float32) * 0.2
    for dt, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        vae = AutoencoderKL(configs.SDXL_VAE, dtype=dt)
        p = jax.eval_shape(lambda r: vae.init(r, jnp.zeros((1, 64, 64, 3))),
                           jax.random.PRNGKey(1))
        p = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), p)

        @jax.jit
        def dec(z0, p=p, vae=vae):
            img = jax.lax.map(
                lambda zi: vae.apply(p, zi[None], method="decode")[0], z0)
            return jnp.sum(img.astype(jnp.float32))

        float(dec(z))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(dec(z))
            times.append(time.perf_counter() - t0)
        rec = json.dumps({"probe": f"r3vae_decode_{name}_b{B}_1024px",
                          "ms_total": round(min(times) * 1e3, 1)})
        print(rec, flush=True)
        with open(RESULTS, "a") as f:
            f.write(rec + "\n")


def probe_conv():
    """Pallas shift-accumulate conv vs lax.conv on the UNet conv classes."""
    from aid_tpu.ops.conv import conv3x3_same

    rng = jax.random.PRNGKey(0)
    for (ch, hw) in [(320, 128), (640, 64), (1280, 32), (640, 128)]:
        x = jax.random.normal(rng, (B, hw, hw, ch), DT)
        w = (jax.random.normal(rng, (3, 3, ch, ch), jnp.float32) * 0.02).astype(DT)
        b = jnp.zeros((ch,), DT)
        flops = 2 * B * hw * hw * 9 * ch * ch
        def guard(name, fn, xx, fl):
            try:
                bench(name, fn, xx, fl, iters=30)
            except Exception as e:
                print(json.dumps({"probe": name, "error": repr(e)[:160]}), flush=True)

        guard(f"r3conv_lax_{ch}_{hw}",
              lambda c, w=w, b=b: jax.lax.conv_general_dilated(
                  c, w, (1, 1), ((1, 1), (1, 1)),
                  dimension_numbers=("NHWC", "HWIO", "NHWC")) + b * 0.0 + c * 0.0,
              x, flops)
        for th in (8, 16, 32):
            if th > hw:
                continue
            guard(f"r3conv_pallas_{ch}_{hw}_th{th}",
                  lambda c, w=w, b=b, th=th: conv3x3_same(c, w, b, block_rows=th) * 1.0 + c * 0.0,
                  x, flops)


def probe_convpk():
    """Packed-K Pallas conv (one K=3*Cin dot per dy) vs the current routed
    lowering and the 9-dot kernel, on every UNet conv class."""
    from aid_tpu.ops.conv import conv3x3_same

    rng = jax.random.PRNGKey(0)
    for (ch, hw) in [(320, 128), (640, 64), (1280, 32), (640, 128)]:
        x = jax.random.normal(rng, (B, hw, hw, ch), DT)
        w = (jax.random.normal(rng, (3, 3, ch, ch), jnp.float32) * 0.02).astype(DT)
        b = jnp.zeros((ch,), DT)
        flops = 2 * B * hw * hw * 9 * ch * ch

        def guard(name, fn, xx, fl):
            try:
                bench(name, fn, xx, fl, iters=30)
            except Exception as e:
                print(json.dumps({"probe": name, "error": repr(e)[:160]}), flush=True)

        if ch <= 384:
            def im2col(c, w=w, b=b, hw=hw, ch=ch):
                xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = jnp.concatenate([
                    xp[:, dy:dy + hw, dx:dx + hw, :]
                    for dy in range(3) for dx in range(3)], axis=-1)
                return jnp.einsum("bhwk,ko->bhwo", cols, w.reshape(9 * ch, -1)) + b
            guard(f"r3pk_im2col_{ch}_{hw}", im2col, x, flops)
        for th in (8, 16):
            if th > hw:
                continue
            guard(f"r3pk_packed_{ch}_{hw}_th{th}",
                  lambda c, w=w, b=b, th=th: conv3x3_same(
                      c, w, b, block_rows=th, packed=True) * 1.0 + c * 0.0,
                  x, flops)
        guard(f"r3pk_9dot_{ch}_{hw}_th8",
              lambda c, w=w, b=b: conv3x3_same(c, w, b, block_rows=8) * 1.0 + c * 0.0,
              x, flops)


def probe_sm():
    """Softmax-economy variants: exp_impl x short_unroll at the SDXL hot
    shapes. The short-KV kernel (S=1024 self) is softmax-VPU-bound at
    33 TF/s; the main kernel (S=4096) sits 1.4x off its half-rate ceiling
    with per-block softmax as the prime suspect."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    # short kernel: self@1024 h20 (60 calls per SDXL forward)
    q, k, v, coef = _attn_inputs(B, 20, 1024, 1024, 64)
    flops = 4 * B * 20 * 1024 * 1024 * 64
    for impl in ("f32", "exp2", "bf16"):
        for u in (1, 2, 4):
            bench(f"r3sm_short_self1024_{impl}_u{u}",
                  lambda c, impl=impl, u=u: flash_interpolated_attention(
                      c, k, v, coef, "self", exp_impl=impl, short_unroll=u
                  ) * 1.0 + c * 0.0, q, flops)
    # main kernel: self/fused @4096 h10 (10 calls per forward each)
    for mode, mult in (("self", 1), ("fused_outer", 3)):
        q4, k4, v4, coef4 = _attn_inputs(B, 10, 4096, 4096, 64)
        flops4 = 4 * B * 10 * 4096 * (4096 * mult) * 64
        for impl in ("f32", "exp2", "bf16"):
            bench(f"r3sm_main_{mode}4096_{impl}",
                  lambda c, impl=impl, mode=mode, k4=k4, v4=v4, coef4=coef4:
                  flash_interpolated_attention(
                      c, k4, v4, coef4, mode, exp_impl=impl
                  ) * 1.0 + c * 0.0, q4, flops4)
    # main kernel: fused_outer @1024 h20 (Ltot=3072; 60 warmup calls/fwd)
    qf, kf, vf, coeff = _attn_inputs(B, 20, 1024, 1024, 64)
    flopsf = 4 * B * 20 * 1024 * 3072 * 64
    for impl in ("f32", "exp2", "bf16"):
        bench(f"r3sm_main_fused1024_{impl}",
              lambda c, impl=impl: flash_interpolated_attention(
                  c, kf, vf, coeff, "fused_outer", exp_impl=impl
              ) * 1.0 + c * 0.0, qf, flopsf)


def probe_fwdconv(iters=20):
    """Full SDXL forward with the wide-channel Pallas conv routed vs not
    (conv_lowering policy A/B on the real workload)."""
    from aid_tpu.models import layers

    for flag in (False, True):
        layers._PALLAS_WIDE_CONV = flag
        unet, p, x, ehs, added = _unet_setup(B)
        bench(f"r3fwd_vanilla_b{B}_pallasconv{int(flag)}",
              lambda c: unet.apply(p, c, jnp.array(500), ehs, None, added) * 0.1,
              x, 0.0, iters=iters)
    layers._PALLAS_WIDE_CONV = True


def probe_op():
    """Segment-decomposed one-pass kernel vs the online-softmax main kernel
    at the SDXL hot shapes: routing thresholds for onepass_max."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    cases = [
        # (H, S, mode, mult) — Ltot = S * (1 + 2*is_outer_fused)
        (20, 1024, "self", 1),          # Ltot 1024, hgroup 20 (60 calls/fwd)
        (20, 1024, "fused_outer", 3),   # Ltot 3072, hgroup 5
        (10, 4096, "self", 1),          # Ltot 4096, hgroup 5
        (10, 4096, "fused_outer", 3),   # Ltot 12288, hgroup 1
    ]
    for (h, s, mode, mult) in cases:
        q, k, v, coef = _attn_inputs(B, h, s, s, 64)
        flops = 4 * B * h * s * (s * mult) * 64
        for u in (-1,):  # -1 = static skewed pipeline (u1/u2 already logged)
            def f(c, k=k, v=v, coef=coef, mode=mode, u=u):
                return flash_interpolated_attention(
                    c, k, v, coef, mode, onepass_max=16384, short_unroll=u
                ) * 1.0 + c * 0.0
            try:
                bench(f"r3op_{mode}{s}_h{h}_u{u}", f, q, flops)
            except Exception as e:
                print(json.dumps({"probe": f"r3op_{mode}{s}_h{h}_u{u}",
                                  "error": repr(e)[:200]}), flush=True)


def probe_diag():
    """Locate the attention-kernel floor: raw VPU exp/mult throughput, bare
    QK batched-matmul rate at the hot shapes, QK+PV without softmax."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1024, 8192), jnp.float32)
    n = x.size
    bench("diag_mult_f32", lambda c: c * 1.0000001, x, n)
    bench("diag_exp_f32", lambda c: jnp.exp(c) * 1e-9, x, n)
    bench("diag_exp2_f32", lambda c: jax.lax.exp2(c) * 1e-9, x, n)
    xb = x.astype(jnp.bfloat16)
    bench("diag_exp_bf16", lambda c: jnp.exp(c) * jnp.bfloat16(1e-9), xb, n)
    bench("diag_max_sub_exp_sum_f32",
          lambda c: (lambda m: jnp.exp(c - m) + c * 1e-9)(
              jnp.max(c, axis=-1, keepdims=True)), x, 4 * n)

    # bare matmuls at the fused1024 shape (B7 H20 S1024 Ltot3072 D64)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (7, 20, 1024, 64), jnp.bfloat16)
    kk = jax.random.normal(ks[1], (7, 20, 3072, 64), jnp.bfloat16)
    vv = jax.random.normal(ks[2], (7, 20, 3072, 64), jnp.bfloat16)
    qk_fl = 2 * 7 * 20 * 1024 * 3072 * 64
    bench("diag_qk_b7h20_1024x3072",
          lambda c: jnp.einsum("bhqd,bhkd->bhqk", c, kk,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)[..., :64] * 1e-4 + c,
          q, qk_fl)
    bench("diag_qk_pv_b7h20_1024x3072",
          lambda c: jnp.einsum(
              "bhqk,bhkd->bhqd",
              jnp.einsum("bhqd,bhkd->bhqk", c, kk,
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16),
              vv, preferred_element_type=jnp.float32
          ).astype(jnp.bfloat16) * 1e-4 + c,
          q, 2 * qk_fl)
    # full XLA attention (materialized logits) at the same shape
    from aid_tpu.ops.attention import attention
    bench("diag_xla_attn_b7h20_1024x3072",
          lambda c: attention(c, kk, vv) * 1e-2 + c, q, 2 * qk_fl)


def probe_blocks():
    """Main-kernel q/kv block sweep at the 4096-token shapes: per-grid-step
    fixed cost dominates there (3360 steps at fused@4096 with 1024/1024
    blocks; bare QK+PV floor is ~7.7 ms vs 14.7 measured-real), so fewer,
    bigger blocks should close most of the gap."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    cases = [
        (10, 4096, "self", 1),
        (10, 4096, "fused_outer", 3),
    ]
    sweeps = [(1024, 2048), (2048, 1024), (2048, 2048),
              (1024, 4096), (4096, 1024), (2048, 4096), (4096, 4096)]
    for (h, s, mode, mult) in cases:
        q, k, v, coef = _attn_inputs(B, h, s, s, 64)
        flops = 4 * B * h * s * (s * mult) * 64
        for (bq, bk) in sweeps:
            def f(c, k=k, v=v, coef=coef, mode=mode, bq=bq, bk=bk):
                return flash_interpolated_attention(
                    c, k, v, coef, mode, onepass_max=0,
                    block_q=bq, block_k=bk,
                ) * 1.0 + c * 0.0
            name = f"r3blk_{mode}{s}_q{bq}k{bk}"
            try:
                bench(name, f, q, flops)
            except Exception as e:
                print(json.dumps({"probe": name, "error": repr(e)[:160]}),
                      flush=True)


def probe_gn():
    """Isolate the resnet GN+SiLU prologue cost at the three UNet levels:
    conv3x3 alone vs GN+SiLU+conv3x3 (XLA cannot fuse elementwise into its
    conv library call, so the prologue pays its own HBM passes). Decides
    whether a fused Pallas GN+SiLU(+conv) kernel is worth building."""
    import flax.linen as nn
    from aid_tpu.models.layers import Conv3x3

    for (ch, hw) in ((320, 128), (640, 64), (1280, 32)):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, ch), DT)
        conv = Conv3x3(features=ch, dtype=DT)
        pc = conv.init(jax.random.PRNGKey(1), x)

        class Pro(nn.Module):
            @nn.compact
            def __call__(self, h):
                h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=DT)(h)
                h = nn.silu(h)
                return Conv3x3(features=ch, dtype=DT)(h)

        pro = Pro()
        pp = pro.init(jax.random.PRNGKey(1), x)
        fl = 2 * B * hw * hw * 9 * ch * ch
        bench(f"r3gn_convonly_{ch}_{hw}",
              lambda c: conv.apply(pc, c) * 0.01 + c * 0.5, x, fl)
        bench(f"r3gn_gnsiluconv_{ch}_{hw}",
              lambda c: pro.apply(pp, c) * 0.01 + c * 0.5, x, fl)


def probe_mxuden():
    """A/B the MXU-resident softmax normalizer (ones-column in V) vs the
    legacy VPU rowsum, at the four hot SDXL attention shapes."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    cases = [
        (20, 1024, "self", 1), (20, 1024, "fused_outer", 3),
        (10, 4096, "self", 1), (10, 4096, "fused_outer", 3),
    ]
    for (h, s, mode, mult) in cases:
        q, k, v, coef = _attn_inputs(B, h, s, s, 64)
        flops = 4 * B * h * s * (s * mult) * 64
        for md in (True, False):
            def f(c, k=k, v=v, coef=coef, mode=mode, md=md):
                return flash_interpolated_attention(
                    c, k, v, coef, mode, mxu_den=md,
                ) * 1.0 + c * 0.0
            name = f"r3md_{mode}{s}_h{h}_mxu{int(md)}"
            try:
                bench(name, f, q, flops)
            except Exception as e:
                print(json.dumps({"probe": name, "error": repr(e)[:160]}),
                      flush=True)


def probe_smax():
    """A/B the static-shift softmax (static_smax=40: no row-max pass, no
    m/l rescale) vs the exact online/segment row max, at the four hot SDXL
    attention shapes, through the ROUTED kernel for each (one-pass at
    Ltot<=3072, online main kernel above)."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    cases = [
        (20, 1024, "self", 1), (20, 1024, "fused_outer", 3),
        (10, 4096, "self", 1), (10, 4096, "fused_outer", 3),
    ]
    for (h, s, mode, mult) in cases:
        q, k, v, coef = _attn_inputs(B, h, s, s, 64)
        flops = 4 * B * h * s * (s * mult) * 64
        for sm in (40.0, None):
            def f(c, k=k, v=v, coef=coef, mode=mode, sm=sm):
                return flash_interpolated_attention(
                    c, k, v, coef, mode, static_smax=sm,
                ) * 1.0 + c * 0.0
            name = f"r3sx_{mode}{s}_h{h}_static{int(sm is not None)}"
            try:
                bench(name, f, q, flops)
            except Exception as e:
                print(json.dumps({"probe": name, "error": repr(e)[:160]}),
                      flush=True)


def probe_gnpk():
    """Fused GN+SiLU+packed-conv kernel vs the unfused chain per class.
    Compares against r3gn_gnsiluconv (the current routed chain)."""
    import flax.linen as nn
    from aid_tpu.models import layers
    from aid_tpu.ops.conv import conv3x3_gnsilu

    for (ch, hw) in ((320, 128), (640, 64), (1280, 32), (640, 128)):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, ch), DT)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, ch, ch),
                               jnp.float32) * 0.02)
        b = jnp.zeros((ch,), jnp.float32)
        gamma = jnp.ones((ch,), jnp.float32)
        beta = jnp.zeros((ch,), jnp.float32)
        fl = 2 * B * hw * hw * 9 * ch * ch

        class Pro(nn.Module):
            @nn.compact
            def __call__(self, h):
                h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=DT)(h)
                h = nn.silu(h)
                return layers.Conv3x3(features=ch, dtype=DT)(h)

        pro = Pro()
        pp = pro.init(jax.random.PRNGKey(1), x)

        def guard(name, fn, xx, flp):
            try:
                bench(name, fn, xx, flp, iters=30)
            except Exception as e:
                print(json.dumps({"probe": name, "error": repr(e)[:160]}),
                      flush=True)

        guard(f"r3gnpk_unfused_{ch}_{hw}",
              lambda c: pro.apply(pp, c) * 0.01 + c * 0.5, x, fl)
        guard(f"r3gnpk_fused_{ch}_{hw}",
              lambda c, w=w, b=b: conv3x3_gnsilu(
                  c, w, b, gamma, beta, num_groups=32) * 0.01 + c * 0.5,
              x, fl)


def probe_glue():
    """Isolate non-forward per-step cost in the real engine loop: time
    denoise_sequence at two step counts per phase (all-early / all-late)
    and difference out the marginal step. Standalone forwards measure
    541 (fused) + 347 (vanilla) ms but the headline implies ~832 ms/step
    — locate the missing ~40 ms/step."""
    import time as _t
    from aid_tpu.models import UNet2DCondition, configs
    from aid_tpu.models.layers import AidMode
    from aid_tpu.pipelines import engine
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler
    from aid_tpu.ops.interp import generate_beta_schedule

    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=DT)
    sample = jax.random.normal(jax.random.PRNGKey(0), (B, 128, 128, cfg.in_channels), DT)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (B, 77, cfg.cross_attention_dim), DT)
    added = {"text_embeds": jax.random.normal(jax.random.PRNGKey(2), (B, 1280), DT),
             "time_ids": jnp.broadcast_to(jnp.array([1024.0]*2 + [0.0]*2 + [1024.0]*2), (B, 6))}
    params = jax.eval_shape(
        lambda r: unet.init(r, sample[:1], jnp.array(0), ehs[:1], None,
                            {k: v[:1] for k, v in added.items()}), jax.random.PRNGKey(3))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, DT if s.dtype == jnp.float32 else s.dtype), params)
    scheduler = EulerDiscreteScheduler()
    uncond = jax.random.normal(jax.random.PRNGKey(4), ehs.shape, DT)

    def run(n, warm):
        state = scheduler.init(n)
        coef = jnp.asarray(generate_beta_schedule(B, n, n, force_endpoints=True))
        out = engine.denoise_sequence(
            unet, scheduler, params, sample * state.init_noise_sigma, ehs,
            uncond, coef, state, jnp.float32(5.0),
            early=AidMode.from_name("fused_outer"), late=AidMode.vanilla(),
            num_steps=n, warmup_steps=warm, added_cond=added)
        return float(jnp.sum(out.astype(jnp.float32)))

    for phase, warm_of in (("early", lambda n: n), ("late", lambda n: 0)):
        ts = {}
        for n in (2, 6):
            run(n, warm_of(n))  # compile
            best = float("inf")
            for _ in range(2):
                t0 = _t.perf_counter()
                run(n, warm_of(n))
                best = min(best, _t.perf_counter() - t0)
            ts[n] = best
        per_step = (ts[6] - ts[2]) / 4
        print(json.dumps({"probe": f"r3glue_{phase}_per_step_ms",
                          "ms": round(per_step * 1e3, 1),
                          "t2_s": round(ts[2], 3), "t6_s": round(ts[6], 3)}),
              flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps({"probe": f"r3glue_{phase}_per_step_ms",
                                "ms": round(per_step * 1e3, 1)}) + "\n")


def probe_glue2(iters=10):
    """Eliminate the +40 ms/step engine glue (r3glue_*): scan bodies that
    add engine features one at a time over the bare two-forward CFG step.
    A=static t, no scheduler; B=dynamic t gather; C=+Euler scale+step."""
    from aid_tpu.models import configs
    from aid_tpu.schedulers.euler import EulerDiscreteScheduler

    unet, p, x, ehs, added = _unet_setup(B)
    uncond = jax.random.normal(jax.random.PRNGKey(9), ehs.shape, DT)
    scheduler = EulerDiscreteScheduler()
    state = scheduler.init(28)
    g = jnp.float32(5.0)

    def cfg(lat, t):
        nt = unet.apply(p, lat, t, ehs, None, added)
        nu = unet.apply(p, lat, t, uncond, None, added)
        return nu + g * (nt - nu)

    def body_a(lat):
        return (lat + 0.0 * cfg(lat, jnp.array(500))).astype(DT)

    def body_b(lat):
        # dynamic timestep via a traced index derived from the carry
        i = (jnp.sum(lat[0, 0, 0]).astype(jnp.int32) % 28).clip(0, 27)
        return (lat + 0.0 * cfg(lat, state.timesteps[i])).astype(DT)

    def body_c(lat):
        i = (jnp.sum(lat[0, 0, 0]).astype(jnp.int32) % 28).clip(0, 27)
        noise = cfg(scheduler.scale_model_input(state, lat, i), state.timesteps[i])
        new, _ = scheduler.step(state, noise, i, lat)
        return (new * 0.999).astype(DT)

    for name, body in (("a_static_t", body_a), ("b_dyn_t", body_b),
                       ("c_full_sched", body_c)):
        bench(f"r3glue2_{name}", body, x, 0.0, iters=iters)


PROBES = {
    "glue2": probe_glue2,
    "glue": probe_glue,
    "gn": probe_gn,
    "blocks": probe_blocks,
    "op": probe_op,
    "diag": probe_diag,
    "null": probe_null,
    "conv": probe_conv,
    "convpk": probe_convpk,
    "gnpk": probe_gnpk,
    "mxuden": probe_mxuden,
    "smax": probe_smax,
    "flash": probe_flash,
    "cross": probe_cross,
    "fwd": probe_fwd,
    "fwdconv": probe_fwdconv,
    "sm": probe_sm,
    "batch": probe_batch,
    "vae": probe_vae,
}


if __name__ == "__main__":
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for name in (sys.argv[1:] or ["null", "flash", "cross", "fwd"]):
        PROBES[name]()
