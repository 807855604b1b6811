"""A/B probes for the round-2 perf work: conv lowering, GroupNorm cost,
flash-kernel in-context overhead, and head-dim padding.

Findings drive aid_tpu/models/layers.py; see PERF.md. Run on the real TPU:
    python tools/opt_probe.py [probe ...]
Appends JSON lines to tools/opt_results.jsonl.
"""

import functools
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
ITERS = 10
B = 7

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "opt_results.jsonl")


def bench(name, fn, x, flops_per_iter, iters=ITERS, params=None):
    @jax.jit
    def run(p, x0):
        def body(c, _):
            return (fn(p, c) if p is not None else fn(c)), None
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    float(run(params, x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        times.append(time.perf_counter() - t0)
    per_iter = min(times) / iters
    rec = json.dumps({
        "probe": name, "ms_per_iter": round(per_iter * 1e3, 3),
        "effective_tflops_s": round(flops_per_iter / per_iter / 1e12, 1) if flops_per_iter else 0.0,
    })
    print(rec, flush=True)
    with open(RESULTS, "a") as f:
        f.write(rec + "\n")


# ---------------- conv lowering variants ----------------

def conv_inputs(ch, hw, out_ch=None):
    out_ch = out_ch or ch
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    w = jnp.full((3, 3, ch, out_ch), 0.01, DT)
    b = jnp.zeros((out_ch,), DT)
    flops = B * hw * hw * 9 * ch * out_ch * 2
    return x, w, b, flops


def probe_conv_baseline(ch, hw):
    x, w, b, flops = conv_inputs(ch, hw)
    def f(p, c):
        out = jax.lax.conv_general_dilated(
            c, p[0], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (out + p[1]) * 0.05
    bench(f"conv_lax_{ch}_{hw}", f, x, flops, params=(w, b))


def probe_conv_f32acc(ch, hw):
    x, w, b, flops = conv_inputs(ch, hw)
    def f(p, c):
        out = jax.lax.conv_general_dilated(
            c, p[0], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return ((out + p[1].astype(jnp.float32)) * 0.05).astype(DT)
    bench(f"conv_f32acc_{ch}_{hw}", f, x, flops, params=(w, b))


def probe_conv_im2col(ch, hw):
    x, w, b, flops = conv_inputs(ch, hw)
    def f(p, c):
        w2 = p[0].reshape(9 * ch, -1)
        xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate([
            xp[:, dy:dy + hw, dx:dx + hw, :]
            for dy in range(3) for dx in range(3)
        ], axis=-1)  # (B, hw, hw, 9*ch)
        out = jnp.einsum("bhwk,ko->bhwo", cols, w2,
                         preferred_element_type=jnp.float32)
        return ((out + p[1]) * 0.05).astype(DT)
    bench(f"conv_im2col_{ch}_{hw}", f, x, flops, params=(w, b))


def probe_conv_shift9(ch, hw):
    x, w, b, flops = conv_inputs(ch, hw)
    def f(p, c):
        xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy:dy + hw, dx:dx + hw, :]
                t = jnp.einsum("bhwc,co->bhwo", xs, p[0][dy, dx],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        return ((out + p[1]) * 0.05).astype(DT)
    bench(f"conv_shift9_{ch}_{hw}", f, x, flops, params=(w, b))


def probe_conv_b8(ch, hw):
    """Batch alignment: 8 frames instead of 7."""
    x = jnp.full((8, hw, hw, ch), 0.01, DT)
    w = jnp.full((3, 3, ch, ch), 0.01, DT)
    flops = 8 * hw * hw * 9 * ch * ch * 2
    def f(p, c):
        out = jax.lax.conv_general_dilated(
            c, p, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out * 0.05
    bench(f"conv_lax_b8_{ch}_{hw}", f, x, flops, params=w)


# ---------------- normalization variants ----------------

def probe_gn_flax(ch, hw):
    import flax.linen as nn
    m = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=DT)
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    p = m.init(jax.random.PRNGKey(0), x)
    bench(f"gn_flax_{ch}_{hw}", lambda p_, c: m.apply(p_, c) + c * 0.5, x, 0, params=p)


def probe_gn_manual(ch, hw):
    """Single-pass E[x^2]-E[x]^2 GN in f32, scale/shift folded."""
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    scale = jnp.ones((ch,), jnp.float32)
    bias = jnp.zeros((ch,), jnp.float32)
    G = 32
    def f(p, c):
        s, bi = p
        xf = c.astype(jnp.float32).reshape(B, hw * hw, G, ch // G)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        ms = jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
        rstd = jax.lax.rsqrt(ms - mean * mean + 1e-5)
        y = (xf - mean) * rstd
        y = y.reshape(B, hw, hw, ch) * s + bi
        return y.astype(DT) + c * 0.5
    bench(f"gn_manual_{ch}_{hw}", f, x, 0, params=(scale, bias))


def probe_gn_silu_manual(ch, hw):
    """GN + SiLU fused in one jnp expression (resnet prologue)."""
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    scale = jnp.ones((ch,), jnp.float32)
    bias = jnp.zeros((ch,), jnp.float32)
    G = 32
    def f(p, c):
        s, bi = p
        xf = c.astype(jnp.float32).reshape(B, hw * hw, G, ch // G)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        ms = jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
        rstd = jax.lax.rsqrt(ms - mean * mean + 1e-5)
        y = ((xf - mean) * rstd).reshape(B, hw, hw, ch) * s + bi
        y = y * jax.nn.sigmoid(y)
        return y.astype(DT) + c * 0.5
    bench(f"gn_silu_manual_{ch}_{hw}", f, x, 0, params=(scale, bias))


def probe_ln_flax(seq, dim):
    import flax.linen as nn
    m = nn.LayerNorm(epsilon=1e-5, dtype=DT)
    x = jnp.full((B, seq, dim), 0.01, DT)
    p = m.init(jax.random.PRNGKey(0), x)
    bench(f"ln_flax_s{seq}_d{dim}", lambda p_, c: m.apply(p_, c) + c * 0.5, x, 0, params=p)


# ---------------- flash kernel in-context ----------------

def probe_flash_ctx(heads, seq, d, mode):
    """heads()/unheads() + distinct q/k/v, as CrossAttention calls it."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention
    inner = heads * d
    q = jnp.full((B, seq, inner), 0.01, DT)
    k = jnp.full((B, seq, inner), 0.011, DT)
    v = jnp.full((B, seq, inner), 0.012, DT)
    coef = jnp.linspace(0, 1, B)
    segs = 1 if mode == "self" else 3
    pv = 1 if mode == "self" else 4
    f = B * heads * (segs + pv) * seq * seq * 128 * 2

    def h(x):
        return x.reshape(B, seq, heads, d).transpose(0, 2, 1, 3)

    def fn(p, c):
        qh, kh, vh = h(c), h(p[0]), h(p[1])
        out = flash_interpolated_attention(qh, kh, vh, p[2], mode)
        return out.transpose(0, 2, 1, 3).reshape(B, seq, inner) * 0.999

    bench(f"flashctx_{mode}_h{heads}_s{seq}_d{d}", fn, q, f, params=(k, v, coef))


def probe_flash_raw(heads, seq, d, mode):
    from aid_tpu.ops.flash_attention import flash_interpolated_attention
    q = jnp.full((B, heads, seq, d), 0.01, DT)
    k = jnp.full((B, heads, seq, d), 0.011, DT)
    v = jnp.full((B, heads, seq, d), 0.012, DT)
    coef = jnp.linspace(0, 1, B)
    segs = 1 if mode == "self" else 3
    pv = 1 if mode == "self" else 4
    f = B * heads * (segs + pv) * seq * seq * 128 * 2
    bench(f"flashraw_{mode}_h{heads}_s{seq}_d{d}",
          lambda p, c: flash_interpolated_attention(c, p[0], p[1], p[2], mode) * 0.999,
          q, f, params=(k, v, coef))


def probe_flash_blocks(heads, seq, d, mode, bq, bk):
    from aid_tpu.ops.flash_attention import flash_interpolated_attention
    q = jnp.full((B, heads, seq, d), 0.01, DT)
    k = jnp.full((B, heads, seq, d), 0.011, DT)
    v = jnp.full((B, heads, seq, d), 0.012, DT)
    coef = jnp.linspace(0, 1, B)
    segs = 1 if mode == "self" else 3
    pv = 1 if mode == "self" else 4
    f = B * heads * (segs + pv) * seq * seq * 128 * 2
    bench(f"flashblk_{mode}_h{heads}_s{seq}_d{d}_q{bq}k{bk}",
          lambda p, c: flash_interpolated_attention(
              c, p[0], p[1], p[2], mode, block_q=bq, block_k=bk) * 0.999,
          q, f, params=(k, v, coef))


PROBES = {
    "conv_lax320": lambda: probe_conv_baseline(320, 128),
    "conv_f32acc320": lambda: probe_conv_f32acc(320, 128),
    "conv_im2col320": lambda: probe_conv_im2col(320, 128),
    "conv_shift9_320": lambda: probe_conv_shift9(320, 128),
    "conv_b8_320": lambda: probe_conv_b8(320, 128),
    "conv_lax640": lambda: probe_conv_baseline(640, 64),
    "conv_im2col640": lambda: probe_conv_im2col(640, 64),
    "conv_shift9_640": lambda: probe_conv_shift9(640, 64),
    "conv_lax1280": lambda: probe_conv_baseline(1280, 32),
    "conv_im2col1280": lambda: probe_conv_im2col(1280, 32),
    "conv_shift9_1280": lambda: probe_conv_shift9(1280, 32),
    "gn_flax320": lambda: probe_gn_flax(320, 128),
    "gn_manual320": lambda: probe_gn_manual(320, 128),
    "gn_silu320": lambda: probe_gn_silu_manual(320, 128),
    "gn_flax640": lambda: probe_gn_flax(640, 64),
    "gn_manual640": lambda: probe_gn_manual(640, 64),
    "ln_flax4096": lambda: probe_ln_flax(4096, 640),
    "ln_flax1024": lambda: probe_ln_flax(1024, 1280),
    "flashraw_self640": lambda: probe_flash_raw(10, 4096, 64, "self"),
    "flashctx_self640": lambda: probe_flash_ctx(10, 4096, 64, "self"),
    "flashraw_fused640": lambda: probe_flash_raw(10, 4096, 64, "fused_outer"),
    "flashctx_fused640": lambda: probe_flash_ctx(10, 4096, 64, "fused_outer"),
    "flashblk_1024_1024": lambda: probe_flash_blocks(10, 4096, 64, "fused_outer", 1024, 1024),
    "flashblk_1024_2048": lambda: probe_flash_blocks(10, 4096, 64, "fused_outer", 1024, 2048),
    "flashblk_2048_1024": lambda: probe_flash_blocks(10, 4096, 64, "fused_outer", 2048, 1024),
    "flashblk_512_2048": lambda: probe_flash_blocks(10, 4096, 64, "fused_outer", 512, 2048),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for n in names:
        try:
            PROBES[n]()
        except Exception as e:
            print(json.dumps({"probe": n, "error": repr(e)[:300]}), flush=True)
