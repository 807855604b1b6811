"""Round-2 probe set B: tunnel-overhead-corrected (ITERS=50) measurements.

Key lesson from opt_probe.py: every dispatch carries ~28 ms tunnel overhead,
so ITERS=10 leaves a ~2.8 ms additive floor on every number. This set uses
ITERS=50 (~0.6 ms floor) and decomposes the d640/S4096 transformer block
anomaly (in-context flash ~24 ms vs ~14 ms sum of parts).

Run: python tools/opt_probe2.py [probe ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/aid_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16
ITERS = 50
B = 7

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "opt2_results.jsonl")


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


SEQ, DIM, HEADS, D = 4096, 640, 10, 64
EHS_D = 2048


class PartialBlock(nn.Module):
    """BasicTransformerBlock with parts toggleable, mirrors layers.py."""
    use_attn1: bool = True
    use_attn2: bool = True
    use_ff: bool = True
    backend: str = "flash"

    @nn.compact
    def __call__(self, x, ehs):
        from aid_tpu.models.layers import CrossAttention, FeedForward
        if self.use_attn1:
            h = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm1")(x)
            x = x + CrossAttention(HEADS, D, DIM, dtype=DT,
                                   attention_backend=self.backend, name="attn1")(h, None, None)
        if self.use_attn2:
            h = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm2")(x)
            x = x + CrossAttention(HEADS, D, DIM, dtype=DT,
                                   attention_backend=self.backend, name="attn2")(h, ehs, None)
        if self.use_ff:
            h = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm3")(x)
            x = x + FeedForward(DIM, dtype=DT, name="ff")(h)
        return x


def probe_partial(name, **kw):
    m = PartialBlock(**kw)
    x = jnp.full((B, SEQ, DIM), 0.01, DT)
    ehs = jnp.full((B, 77, EHS_D), 0.01, DT)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(DT), m.init(jax.random.PRNGKey(0), x, ehs))
    bench(name, lambda p_, c: m.apply(p_, c, ehs), x, 0, params=p)


def probe_flash(mode, iters=ITERS, pad_d=True, bq=512, bk=1024, heads=HEADS, seq=SEQ, d=D, b=B):
    from aid_tpu.ops.flash_attention import flash_interpolated_attention
    q = jnp.full((b, heads, seq, d), 0.01, DT)
    k = jnp.full((b, heads, seq, d), 0.011, DT)
    v = jnp.full((b, heads, seq, d), 0.012, DT)
    coef = jnp.linspace(0, 1, b)
    segs = 1 if mode == "self" else 3
    pv = 1 if mode == "self" else 4
    f = b * heads * (segs + pv) * seq * seq * d * 2  # USEFUL flops (unpadded)
    bench(f"flash_{mode}_b{b}h{heads}s{seq}d{d}_pad{int(pad_d)}_q{bq}k{bk}",
          lambda p, c: flash_interpolated_attention(
              c, p[0], p[1], p[2], mode, block_q=bq, block_k=bk, pad_d=pad_d) * 0.999,
          q, f, iters=iters, params=(k, v, coef))


def probe_null():
    """Pure dispatch overhead: trivial op, ITERS=50."""
    x = jnp.full((8, 128), 0.01, DT)
    bench("null_op", lambda c: c * 1.000001, x, 0)


def probe_matmul():
    n = 8192
    w = jnp.full((n, n), 0.01, DT)
    x = jnp.full((n, n), 0.01, DT)
    bench("matmul_8192_i50", lambda c: (c @ w) * 1e-2, x, 2 * n**3)


PROBES = {
    "null": probe_null,
    "matmul": probe_matmul,
    "tb_full_flash": lambda: probe_partial("tb_full_flash", backend="flash"),
    "tb_full_xla": lambda: probe_partial("tb_full_xla", backend="xla"),
    "tb_attn1_flash": lambda: probe_partial(
        "tb_attn1_flash", use_attn2=False, use_ff=False, backend="flash"),
    "tb_attn1_xla": lambda: probe_partial(
        "tb_attn1_xla", use_attn2=False, use_ff=False, backend="xla"),
    "tb_attn2_ff": lambda: probe_partial(
        "tb_attn2_ff", use_attn1=False, backend="flash"),
    "flash_self_pad": lambda: probe_flash("self"),
    "flash_self_nopad": lambda: probe_flash("self", pad_d=False),
    "flash_fused_pad": lambda: probe_flash("fused_outer"),
    "flash_fused_nopad": lambda: probe_flash("fused_outer", pad_d=False),
    "flash_fused_nopad_qk1024": lambda: probe_flash("fused_outer", pad_d=False, bq=1024, bk=1024),
    "flash_fused_qk1024": lambda: probe_flash("fused_outer", bq=1024, bk=1024),
    "flash_self_qk1024": lambda: probe_flash("self", bq=1024, bk=1024),
    "flash_self_nopad_qk1024": lambda: probe_flash("self", pad_d=False, bq=1024, bk=1024),
    "flash_sd_fused_nopad": lambda: probe_flash("fused_outer", pad_d=False, heads=8, d=40, b=3),
    "flash_sd_fused_pad": lambda: probe_flash("fused_outer", pad_d=True, heads=8, d=40, b=3),
    "flash_mid_self_nopad": lambda: probe_flash("self", pad_d=False, heads=20, seq=1024, d=64),
    "flash_mid_self_pad": lambda: probe_flash("self", pad_d=True, heads=20, seq=1024, d=64),
    "flash_mid_fused_nopad": lambda: probe_flash("fused_outer", pad_d=False, heads=20, seq=1024, d=64),
    "flash_mid_fused_pad": lambda: probe_flash("fused_outer", pad_d=True, heads=20, seq=1024, d=64),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for n in names:
        try:
            PROBES[n]()
        except Exception as e:
            print(json.dumps({"probe": n, "error": repr(e)[:300]}), flush=True)
