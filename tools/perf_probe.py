"""Device-level decomposition of the SDXL forward on the real TPU.

The axon profiler records host events only (NEXT.md), so this probe answers
"where do the ~74 effective TFLOP/s go?" by timing each component class in
isolation, amortizing the ~28 ms tunnel dispatch overhead with an in-graph
lax.scan over ITERS repetitions per dispatch.

Run: python tools/perf_probe.py [probe ...]   (no args = all probes)
Appends one JSON line per probe to stdout.
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
ITERS = 10
B = 7  # headline bench frame count


def bench(name, fn, x, flops_per_iter, iters=ITERS, params=None):
    """Time fn scanned `iters` times inside ONE jitted dispatch.

    ``params`` (a pytree) is threaded as a jit ARGUMENT — closing over large
    arrays embeds them as HLO constants, which the axon remote-compile
    service rejects (HTTP 413) beyond a few hundred MB.
    """

    @jax.jit
    def run(p, x0):
        def body(c, _):
            return (fn(p, c) if p is not None else fn(c)), None
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    float(run(params, x))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        times.append(time.perf_counter() - t0)
    per_iter = min(times) / iters
    tfs = flops_per_iter / per_iter / 1e12
    rec = json.dumps({
        "probe": name, "ms_per_iter": round(per_iter * 1e3, 3),
        "tflops_per_iter": round(flops_per_iter / 1e12, 3),
        "effective_tflops_s": round(tfs, 1),
    })
    print(rec, flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.jsonl"), "a") as f:
        f.write(rec + "\n")


def probe_matmul_peak():
    n = 8192
    w = jnp.full((n, n), 0.01, DT)
    x = jnp.full((n, n), 0.01, DT)
    bench("matmul_8192", lambda c: (c @ w) * 1e-2, x, 2 * n**3)


def probe_tblock(dim, seq, depth, heads, backend):
    from aid_tpu.models.layers import BasicTransformerBlock

    class Stack(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x, ehs):
            for i in range(depth):
                x = BasicTransformerBlock(
                    heads, dim // heads, dim, dtype=DT,
                    attention_backend=backend, name=f"b{i}")(x, ehs, None)
            return x

    m = Stack()
    x = jnp.full((B, seq, dim), 0.01, DT)
    ehs = jnp.full((B, 77, 2048), 0.01, DT)
    p = m.init(jax.random.PRNGKey(0), x, ehs)
    p = jax.tree_util.tree_map(lambda a: a.astype(DT), p)
    # FLOPs per block: attn1 qkv+out 4*S*d*d*2; attn1 scores 2*S*S*d*2
    # attn2 q+out 2*S*d*d*2 + kv 2*77*2048*d*2 + scores 2*S*77*d*2
    # ff: S*d*8d*2 + S*4d*d*2
    fb = (4 * seq * dim * dim * 2 + 2 * seq * seq * dim * 2
          + 2 * seq * dim * dim * 2 + 2 * 77 * 2048 * dim * 2 + 2 * seq * 77 * dim * 2
          + seq * dim * 8 * dim * 2 + seq * 4 * dim * dim * 2)
    bench(f"tblock_d{dim}_s{seq}_x{depth}_{backend}",
          lambda p_, c: m.apply(p_, c, ehs), x, B * fb * depth, params=p)


def probe_resnet(ch, hw):
    from aid_tpu.models.layers import ResnetBlock2D
    m = ResnetBlock2D(ch, dtype=DT)
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    temb = jnp.full((B, 1280), 0.01, DT)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(DT), m.init(jax.random.PRNGKey(0), x, temb))
    f = B * (2 * hw * hw * 9 * ch * ch * 2 + ch * 1280 * 2)
    bench(f"resnet_{ch}_{hw}", lambda p_, c: m.apply(p_, c, temb), x, f, params=p)


def probe_conv(ch, hw):
    import flax.linen as nn
    m = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(DT), m.init(jax.random.PRNGKey(0), x))
    bench(f"conv3x3_{ch}_{hw}", lambda p_, c: m.apply(p_, c) * 0.05, x,
          B * hw * hw * 9 * ch * ch * 2, params=p)


def probe_groupnorm(ch, hw):
    import flax.linen as nn
    m = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=DT)
    x = jnp.full((B, hw, hw, ch), 0.01, DT)
    p = m.init(jax.random.PRNGKey(0), x)
    bench(f"groupnorm_{ch}_{hw}", lambda p_, c: m.apply(p_, c) + c * 0.5, x, 0, params=p)


def probe_flash(heads, seq, d, mode, b=B):
    from aid_tpu.ops.flash_attention import flash_interpolated_attention
    q = jnp.full((b, heads, seq, d), 0.01, DT)
    coef = jnp.linspace(0, 1, b)
    segs = 1 if mode == "self" else 3
    pv_sets = 1 if mode == "self" else 4
    dp = 128
    f = b * heads * (segs * seq * seq * dp * 2 + pv_sets * seq * seq * dp * 2)
    bench(f"flash_{mode}_b{b}_h{heads}_s{seq}_d{d}",
          lambda c: flash_interpolated_attention(c, c, c, coef, mode) * 0.999,
          q, f, iters=10)


def probe_forward():
    from aid_tpu.models import UNet2DCondition, configs
    cfg = configs.SDXL_UNET
    unet = UNet2DCondition(cfg, dtype=DT)
    x = jnp.full((B, 128, 128, 4), 0.01, DT)
    ehs = jnp.full((B, 77, 2048), 0.01, DT)
    added = {"text_embeds": jnp.full((B, 1280), 0.01, DT),
             "time_ids": jnp.broadcast_to(jnp.array([1024., 1024., 0., 0., 1024., 1024.]), (B, 6))}
    p = jax.eval_shape(lambda r: unet.init(r, x[:1], jnp.array(0), ehs[:1], None,
                                           {k: v[:1] for k, v in added.items()}),
                       jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, DT if s.dtype == jnp.float32 else s.dtype), p)
    # ~6.1 TFLOP/img at 1024px (diffusers-reported scale)
    bench("unet_forward_vanilla",
          lambda p_, c: unet.apply(p_, c, jnp.array(500), ehs, None, added) * 0.1,
          x, B * 6.1e12, iters=5, params=p)


PROBES = {
    "matmul": probe_matmul_peak,
    "tblock1280": lambda: probe_tblock(1280, 1024, 4, 20, "flash"),
    "tblock1280xla": lambda: probe_tblock(1280, 1024, 4, 20, "xla"),
    "tblock640": lambda: probe_tblock(640, 4096, 1, 10, "flash"),
    "tblock640xla": lambda: probe_tblock(640, 4096, 1, 10, "xla"),
    "resnet320": lambda: probe_resnet(320, 128),
    "resnet1280": lambda: probe_resnet(1280, 32),
    "conv320": lambda: probe_conv(320, 128),
    "conv640": lambda: probe_conv(640, 64),
    "conv1280": lambda: probe_conv(1280, 32),
    "gn320": lambda: probe_groupnorm(320, 128),
    "flashself": lambda: probe_flash(10, 4096, 64, "self"),
    "flashsd_self": lambda: probe_flash(8, 4096, 40, "self", b=3),
    "flashsd_fused": lambda: probe_flash(8, 4096, 40, "fused_outer", b=3),
    "flashfused": lambda: probe_flash(10, 4096, 64, "fused_outer"),
    "flashself1280": lambda: probe_flash(20, 1024, 64, "self"),
    "flashfused1280": lambda: probe_flash(20, 1024, 64, "fused_outer"),
    "forward": probe_forward,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for n in names:
        try:
            PROBES[n]()
        except Exception as e:
            print(json.dumps({"probe": n, "error": repr(e)[:300]}), flush=True)
