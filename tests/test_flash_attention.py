"""Pallas flash interpolated-attention kernel vs the jnp reference
implementation (SURVEY.md §4 'Kernel': inner/outer x fused/pure x self/cross,
batch 3 and batch N). Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.ops import interpolated_attention
from aid_tpu.ops.attention import AttnMode
from aid_tpu.ops.flash_attention import flash_interpolated_attention

MODES = ["self", "pure_outer", "fused_outer", "pure_inner", "fused_inner"]


def _data(B, H, S, L, D, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, L, D)).astype(np.float32)
    v = rng.normal(size=(B, H, L, D)).astype(np.float32)
    coef = np.linspace(0, 1, B).astype(np.float32)
    return map(jnp.asarray, (q, k, v, coef))


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize(
    "shape",
    [
        (3, 2, 64, 64, 40),  # self-attention-like, head_dim 40 (padding)
        (5, 2, 64, 77, 64),  # cross-attention-like (L=77, masking), batch N
        (3, 1, 300, 300, 64),  # non-multiple of block sizes
    ],
)
def test_kernel_matches_jnp_reference(mode, shape):
    B, H, S, L, D = shape
    q, k, v, coef = _data(B, H, S, L, D)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(
        q, k, v, coef, mode, block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["fused_outer", "pure_inner"])
def test_kernel_explicit_endpoints(mode):
    B, H, S, L, D = 3, 2, 64, 32, 32
    q, k, v, coef = _data(B, H, S, L, D)
    rng = np.random.default_rng(9)
    Le = 48
    kb = jnp.asarray(rng.normal(size=(H, Le, D)).astype(np.float32))
    vb = jnp.asarray(rng.normal(size=(H, Le, D)).astype(np.float32))
    ke = jnp.asarray(rng.normal(size=(H, Le, D)).astype(np.float32))
    ve = jnp.asarray(rng.normal(size=(H, Le, D)).astype(np.float32))
    want = interpolated_attention(q, k, v, coef, mode, k_begin=kb, v_begin=vb, k_end=ke, v_end=ve)
    got = flash_interpolated_attention(
        q, k, v, coef, mode, k_begin=kb, v_begin=vb, k_end=ke, v_end=ve,
        block_q=64, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_bf16(mode="fused_outer"):
    B, H, S, L, D = 3, 2, 128, 128, 64
    q, k, v, coef = _data(B, H, S, L, D)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(q, k, v, coef, mode, block_q=128, block_k=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.06, atol=0.06,
    )


def test_skip_endpoints_exactness():
    """Rows with coef 0/1 whose endpoint == own K/V may skip endpoint
    segments — output must be EXACTLY the unskipped result."""
    B, H, S, D = 4, 2, 128, 64
    q, k, v, _ = _data(B, H, S, S, D)
    coef = jnp.array([0.0, 0.3, 0.8, 1.0])
    skip = jnp.array([True, False, False, True])
    for mode in ["fused_outer", "fused_inner"]:
        base = flash_interpolated_attention(
            q, k, v, coef, mode, block_q=128, block_k=128, interpret=True)
        skipped = flash_interpolated_attention(
            q, k, v, coef, mode, skip_endpoints=skip,
            block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(skipped), np.asarray(base), rtol=2e-5, atol=2e-5)


def test_skip_endpoints_cfg_uncond_rows():
    """Batched-CFG style: uncond rows carry their own K/V as both endpoints;
    skipping them must equal both the unskipped run AND vanilla attention."""
    from aid_tpu.ops import attention

    B, H, S, D = 6, 2, 128, 64  # 3 cond + 3 uncond
    q, k, v, _ = _data(B, H, S, S, D)
    n = 3
    coef = jnp.array([0.0, 0.5, 1.0, 0.0, 0.5, 1.0])

    def per_row(x):
        b0 = jnp.broadcast_to(x[0:1], (n,) + x.shape[1:])
        e0 = jnp.broadcast_to(x[n - 1:n], (n,) + x.shape[1:])
        return (jnp.concatenate([b0, x[n:]], axis=0),
                jnp.concatenate([e0, x[n:]], axis=0))

    kb, ke = per_row(k)
    vb, ve = per_row(v)
    skip = jnp.array([True, False, True, True, True, True])
    out = flash_interpolated_attention(
        q, k, v, coef, "fused_outer", k_begin=kb, v_begin=vb, k_end=ke, v_end=ve,
        skip_endpoints=skip, block_q=128, block_k=128, interpret=True)
    ref = flash_interpolated_attention(
        q, k, v, coef, "fused_outer", k_begin=kb, v_begin=vb, k_end=ke, v_end=ve,
        block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # uncond rows must equal plain attention
    vanilla = attention(q[n:], k[n:], v[n:])
    np.testing.assert_allclose(np.asarray(out[n:]), np.asarray(vanilla), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["self", "fused_outer"])
@pytest.mark.parametrize("L", [511, 512])
def test_dispatch_threshold_boundary(mode, L):
    """dispatch_attention switches xla -> flash at KV length 512
    (ops/attention.py); both paths must agree at the boundary shapes so
    crossing the threshold cannot change results."""
    B, H, S, D = 3, 2, 64, 64
    q, k, v, coef = _data(B, H, S, L, D, seed=L)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(
        q, k, v, coef, mode, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["self", "fused_outer", "pure_outer"])
def test_mxu_den_ab_equivalence(mode):
    """MXU-resident normalizer (ones-column in V, default) == legacy VPU
    rowsum path, at a masked partial-block shape (exercises both the
    widened-V extend at D=64 and the l-scratch path)."""
    B, H, S, L, D = 3, 2, 96, 200, 64
    q, k, v, coef = _data(B, H, S, L, D, seed=9)
    for onepass_max in (3072, 0):  # one-pass kernel AND the online main kernel
        a = flash_interpolated_attention(
            q, k, v, coef, mode, block_q=128, block_k=128, interpret=True,
            mxu_den=True, onepass_max=onepass_max)
        b = flash_interpolated_attention(
            q, k, v, coef, mode, block_q=128, block_k=128, interpret=True,
            mxu_den=False, onepass_max=onepass_max)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_shapes(seed):
    """Random shapes/modes/dtypes vs the jnp reference (interpret mode)."""
    rng = np.random.default_rng(seed)
    B = int(rng.integers(2, 7))
    H = int(rng.integers(1, 4))
    S = int(rng.integers(1, 200))
    L = int(rng.integers(1, 200))
    # incl. SD1.5 mid/deep head dims 80/160 (160 exercises the forced
    # re-pad: unpadded blocks are only legal within one 128-lane tile)
    D = int(rng.choice([8, 40, 64, 80, 96, 128, 160]))
    mode = str(rng.choice(MODES))
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    coef = jnp.asarray(np.sort(rng.uniform(0, 1, B)).astype(np.float32))
    bq = int(rng.choice([128, 256]))
    bk = int(rng.choice([128, 256]))
    pad_d = bool(rng.choice([False, True]))
    exp_impl = str(rng.choice(["f32", "exp2"]))  # bf16 covered separately (looser tol)
    unroll = int(rng.choice([1, 2, 4]))  # short-KV head-loop unroll
    # static-shift softmax: explicit off / explicit C / the routed default
    smax = {"none": None, "40": 40.0, "auto": "auto"}[
        str(rng.choice(["none", "40", "auto"]))]
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(q, k, v, coef, mode, block_q=bq, block_k=bk,
                                       interpret=True, pad_d=pad_d, exp_impl=exp_impl,
                                       short_unroll=unroll, static_smax=smax)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4,
        err_msg=f"B{B} H{H} S{S} L{L} D{D} {mode} bq{bq} bk{bk} pad{pad_d} "
                f"{exp_impl} u{unroll} smax{smax}")


@pytest.mark.parametrize("mode", ["self", "fused_outer"])
def test_exp_impl_bf16(mode):
    """bf16-exp probabilities stay within bf16-level tolerance of the
    reference (the p->bf16 cast exists on every path; only l's summands
    lose precision)."""
    q, k, v, coef = _data(3, 2, 128, 128, 64, seed=9)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(q, k, v, coef, mode, block_q=128, block_k=128,
                                       interpret=True, exp_impl="bf16")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["self", "pure_outer", "fused_outer", "fused_inner"])
def test_exp_impl_bf16_short_path_masked(mode):
    """bf16-exp through the short-KV kernel with partial-block masking
    (L=77 pads to 128: NEG_INF survives the bf16 cast as a large-negative
    finite value, exp -> 0) and the one-exp two-mask outer path."""
    q, k, v, coef = _data(4, 3, 64, 77, 64, seed=13)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(q, k, v, coef, mode,
                                       interpret=True, exp_impl="bf16")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("onepass_max", [3072, 0])
def test_static_smax_matches_reference(mode, onepass_max):
    """Static-shift softmax (static_smax=40) is the SAME softmax — not an
    approximation — for row maxes inside [-32, +70]; pinned vs the jnp
    reference at the standard tolerance on a masked non-aligned shape
    through BOTH kernels."""
    q, k, v, coef = _data(3, 2, 96, 200, 64, seed=21)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(
        q, k, v, coef, mode, block_q=128, block_k=128, interpret=True,
        static_smax=40.0, onepass_max=onepass_max)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_static_smax_skip_endpoints():
    """Skip rows (endpoint frames) stay exactly vanilla under the static
    shift in both kernels."""
    from aid_tpu.ops.attention import _softmax_attn
    B, H, S, D = 4, 2, 128, 64
    q, k, v, _ = _data(B, H, S, S, D, seed=22)
    coef = jnp.array([0.0, 0.3, 0.8, 1.0])
    skip = jnp.array([True, False, False, True])
    want = interpolated_attention(q, k, v, coef, "fused_outer")
    want = jnp.where(skip[:, None, None, None],
                     _softmax_attn(q, k, v, D ** -0.5), want)
    for onepass_max in (3072, 0):
        got = flash_interpolated_attention(
            q, k, v, coef, "fused_outer", skip_endpoints=skip,
            block_q=128, block_k=128, interpret=True,
            static_smax=40.0, onepass_max=onepass_max)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_static_smax_window_edges():
    """Inside the window (row max ~ -25) the static shift matches the
    reference; far OUTSIDE it (row max >> +70, reachable only with
    adversarial inputs) the +30-nat clip flattens top ratios — the result
    deviates but stays finite (no inf/NaN), which is the documented
    graceful-failure contract."""
    rng = np.random.default_rng(23)
    B, H, S, D = 2, 2, 128, 64
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    coef = jnp.asarray([0.25, 0.75], jnp.float32)

    # cold: every logit biased to exactly -25 +/- N(0, 0.8) via a dedicated
    # bias dimension (q's last dim = 1, k's = -25), so row maxes sit at
    # ~-24, inside the [-32, +70] window — still exact
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    qc = jnp.concatenate([q[..., :-1] * 0.1, jnp.ones_like(q[..., :1])], -1)
    kc = jnp.concatenate([k[..., :-1], jnp.full_like(k[..., :1], -25.0)], -1)
    base = interpolated_attention(qc, kc, v, coef, "fused_outer", scale=1.0)
    got = flash_interpolated_attention(qc, kc, v, coef, "fused_outer",
                                       interpret=True, static_smax=40.0,
                                       scale=1.0, onepass_max=0,
                                       block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)

    # hot: row maxes in the hundreds -> clipped, finite, no NaN
    qh = q * 40.0
    kh = k + qh * 0.1
    goth = flash_interpolated_attention(qh, kh, v, coef, "fused_outer",
                                        interpret=True, static_smax=40.0,
                                        onepass_max=0, block_q=128, block_k=128)
    assert bool(jnp.all(jnp.isfinite(goth)))


def test_vae_wide_head_shape_numerics():
    """The VAE mid-block shape class (16k tokens at 1024px; here a reduced
    1024 tokens, same D=512 f32 single-head config): 4 lane tiles, the
    unpadded D%128==0 path, and the 512KB block clamp (max_rows=256 at
    D=512 f32). Pinned numerically vs the jnp reference — ADVICE r2 #2
    (previously only finite-checked by the hardware smoke matrix)."""
    B, H, S, D = 1, 1, 1024, 512
    q, k, v, coef = _data(B, H, S, S, D, seed=11)
    want = interpolated_attention(q, k, v, coef, "self")
    got = flash_interpolated_attention(
        q, k, v, coef, "self", interpret=True,  # default blocks -> clamp path
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_over_budget_head_dim_fails_loudly():
    """ADVICE r2 #3: a head dim whose minimum 128-row block exceeds the
    512KB Mosaic budget must raise a clear error, not a Mosaic allocation
    failure (D=2048 f32: 128 rows x 2048 lanes x 4B = 1MB)."""
    B, H, S, D = 1, 1, 128, 2048
    q, k, v, coef = _data(B, H, S, S, D, seed=3)
    with pytest.raises(ValueError, match="block budget"):
        flash_interpolated_attention(q, k, v, coef, "self", interpret=True)


@pytest.mark.parametrize("mode,H,hgroup_expect", [
    ("fused_outer", 20, 5),   # Ltot=3S: SDXL warmup S=1024 class (scaled down)
    ("self", 10, 10),         # Ltot=S: SDXL S=4096 class (scaled down)
    ("fused_outer", 10, 5),   # Ltot=3S at H=10
])
def test_onepass_head_grouped_routes(mode, H, hgroup_expect):
    """The one-pass kernel with onepass_max large enough that the head-group
    grid (B, H/hgroup, q_blocks) engages — the exact structure routed on TPU
    for the SDXL hot shapes (scaled-down S keeps interpret mode fast; the
    segment/set decomposition is identical)."""
    B, S, D = 4, 512, 64
    q, k, v, coef = _data(B, H, S, S, D, seed=11)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(
        q, k, v, coef, mode, interpret=True, onepass_max=16384,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_onepass_skip_endpoints_exactness():
    """Skip rows in the one-pass kernel gate the endpoint segments with
    scalar selects; results must equal vanilla attention exactly for the
    endpoint frames and full fused-outer for interior frames."""
    B, H, S, D = 4, 2, 256, 64
    q, k, v, coef = _data(B, H, S, S, D, seed=13)
    skip = jnp.zeros((B,), bool).at[0].set(True).at[B - 1].set(True)
    got = flash_interpolated_attention(
        q, k, v, coef, "fused_outer", skip_endpoints=skip,
        interpret=True, onepass_max=16384,
    )
    want = interpolated_attention(q, k, v, coef, "fused_outer")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    # endpoint rows == plain attention bit-for-bit semantics (same math path)
    from aid_tpu.ops.attention import attention
    van = attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(van[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[-1]), np.asarray(van[-1]), rtol=2e-5, atol=2e-5)


def test_onepass_pure_outer_disjoint_stream_precision():
    """pure_outer one-pass uses exact per-set segment maxima: a large logit
    gap between the begin and end streams must not underflow the weaker set
    (the old union-shared-max design lost the weaker stream past exp(-88))."""
    B, H, S, D = 3, 1, 128, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    # begin endpoint logits pushed far above end's: scale begin K hugely
    kb = k[0] * 40.0
    ke = k[-1]
    coef = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    want = interpolated_attention(q, k, v, coef, "pure_outer", k_begin=kb, v_begin=v[0],
                                  k_end=ke, v_end=v[-1])
    got = flash_interpolated_attention(q, k, v, coef, "pure_outer", k_begin=kb,
                                       v_begin=v[0], k_end=ke, v_end=v[-1],
                                       interpret=True, onepass_max=16384)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_onepass_envelope_overflow_falls_back_to_main_kernel(monkeypatch):
    """onepass_max above the VMEM envelope must route to the streaming main
    kernel, not raise StopIteration mid-trace (code-review r3 finding).
    The envelope is shrunk so a small shape exercises the fallback."""
    import aid_tpu.ops.flash_attention as fa

    B, H, S, D = 1, 2, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.float32)
    coef = jnp.zeros((B,), jnp.float32)

    kwargs = dict(mode=AttnMode("self"), interpret=True, onepass_max=4096)
    monkeypatch.setattr(fa, "_ONEPASS_MAX_RESIDENT_COLS", 128)
    via_fallback = fa.flash_interpolated_attention(q, k, v, coef, **kwargs)
    monkeypatch.undo()
    # onepass_max=0 forces the main kernel explicitly; the fallback must
    # have taken the identical path
    forced_main = fa.flash_interpolated_attention(
        q, k, v, coef, mode=AttnMode("self"), interpret=True, onepass_max=0)
    np.testing.assert_allclose(np.asarray(via_fallback), np.asarray(forced_main),
                               rtol=1e-6, atol=1e-6)


def test_static_smax_string_validation():
    """A typo'd string must raise a ValueError naming the parameter, not an
    opaque float() failure (ADVICE r3 low)."""
    q, k, v, coef = _data(1, 1, 64, 64, 64, seed=1)
    with pytest.raises(ValueError, match="static_smax"):
        flash_interpolated_attention(q, k, v, coef, "self", interpret=True,
                                     static_smax="Auto")


def test_static_smax_bf16_incompatible():
    """static_smax x exp_impl='bf16' cross (ADVICE r3 high #2): an explicit
    shift constant raises (exp(bf16(s-40)) quantizes at ~0.125 nats); the
    'auto' routing resolves to None under bf16 and stays within bf16
    tolerance of the reference."""
    q, k, v, coef = _data(3, 2, 128, 128, 64, seed=5)
    with pytest.raises(ValueError, match="bf16"):
        flash_interpolated_attention(q, k, v, coef, "fused_outer",
                                     interpret=True, exp_impl="bf16",
                                     static_smax=40.0)
    want = interpolated_attention(q, k, v, coef, "fused_outer")
    got = flash_interpolated_attention(q, k, v, coef, "fused_outer",
                                       block_q=128, block_k=128,
                                       interpret=True, exp_impl="bf16",
                                       static_smax="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["fused_outer", "pure_outer"])
def test_split_endpoint_routing_region(mode):
    """Outer modes with shared 3D endpoints route to the split-endpoint
    one-pass kernel up to _SPLIT_ONEPASS_MAX (default onepass_max only
    bounds the packed paths) — pin numerics in the newly-routed region
    (Ltot > 3072) with non-block-aligned masking and skip rows."""
    from aid_tpu.ops.attention import _softmax_attn

    B, H, S, D = 3, 2, 1100, 64  # Ltot = 3 * 1152-pad > 3072
    q, k, v, coef = _data(B, H, S, S, D, seed=31)
    want = interpolated_attention(q, k, v, coef, mode)
    got = flash_interpolated_attention(q, k, v, coef, mode, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    if mode == "fused_outer":
        skip = jnp.array([True, False, True])
        got_s = flash_interpolated_attention(q, k, v, coef, mode,
                                             skip_endpoints=skip, interpret=True)
        van = _softmax_attn(q, k, v, D ** -0.5)
        np.testing.assert_allclose(np.asarray(got_s[0]), np.asarray(van[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_s[1]), np.asarray(want[1]),
                                   rtol=2e-4, atol=2e-4)


def test_split_escape_hatch_matches_packed():
    """_SPLIT_EP_ENABLE=False (the debugging escape hatch back to packed
    routing) must agree with the split path bit-for-tolerance — the split
    layout is a pure data-movement optimization."""
    import aid_tpu.ops.flash_attention as fa

    q, k, v, coef = _data(3, 2, 640, 640, 64, seed=7)  # one-pass region
    split = flash_interpolated_attention(q, k, v, coef, "fused_outer",
                                         interpret=True)
    assert fa._SPLIT_EP_ENABLE
    try:
        fa._SPLIT_EP_ENABLE = False
        # distinct static arg so the jit cache can't serve the split trace
        packed = flash_interpolated_attention(q, k, v, coef, "fused_outer",
                                              interpret=True, short_unroll=2)
    finally:
        fa._SPLIT_EP_ENABLE = True
    np.testing.assert_allclose(np.asarray(packed), np.asarray(split),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", MODES)
def test_pipeline_chunk_matches_unchunked(mode):
    """Chunk-skewed one-pass pipeline (pipeline_chunk>0 + static shift):
    chunks contribute associatively at the shared static scale, so the
    result must match the unchunked kernel at f32 sum-order tolerance —
    including sub-segment chunks on masked, non-block-aligned shapes and
    through the split-endpoint path (block-aligned shared endpoints)."""
    for shape, seed in [((3, 2, 96, 200, 64), 31),      # masked, packed
                        ((3, 2, 256, 256, 64), 32)]:    # split-capable
        q, k, v, coef = _data(*shape, seed=seed)
        skip = (jnp.array([True, False, False])
                if mode.startswith("fused") else None)
        base = flash_interpolated_attention(
            q, k, v, coef, mode, interpret=True, static_smax=40.0,
            onepass_max=4096, skip_endpoints=skip)
        for chunk in (128, 512):
            got = flash_interpolated_attention(
                q, k, v, coef, mode, interpret=True, static_smax=40.0,
                onepass_max=4096, skip_endpoints=skip, pipeline_chunk=chunk)
            np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                       rtol=2e-5, atol=2e-5)


def test_pipeline_chunk_requires_static_shift():
    """Without the static shift the chunked path is inert (the exact
    kernel's cross-chunk max/rescale would serialize the skew): the knob
    must be ignored, output exact vs the jnp reference."""
    q, k, v, coef = _data(3, 2, 128, 128, 64, seed=33)
    want = interpolated_attention(q, k, v, coef, "fused_outer")
    got = flash_interpolated_attention(
        q, k, v, coef, "fused_outer", interpret=True,
        onepass_max=4096, pipeline_chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
