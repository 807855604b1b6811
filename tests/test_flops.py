"""FLOP-counter tests (aid_tpu/utils/flops.py, MFU accounting for bench.py
— VERDICT r4 missing #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.utils.flops import count_flops, mfu


def test_plain_dot():
    f = lambda x, w: x @ w
    assert count_flops(f, jnp.ones((8, 16)), jnp.ones((16, 32))) == 2 * 8 * 32 * 16


def test_batched_dot_general():
    f = lambda a, b: jnp.einsum("bij,bjk->bik", a, b)
    got = count_flops(f, jnp.ones((4, 8, 16)), jnp.ones((4, 16, 32)))
    assert got == 2 * 4 * 8 * 32 * 16


def test_conv():
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = count_flops(f, jnp.ones((2, 8, 8, 4)), jnp.ones((3, 3, 4, 16)))
    assert got == 2 * 2 * 8 * 8 * 16 * 3 * 3 * 4


def test_strided_conv_counts_output_elements():
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = count_flops(f, jnp.ones((1, 8, 8, 4)), jnp.ones((3, 3, 4, 16)))
    assert got == 2 * 1 * 4 * 4 * 16 * 3 * 3 * 4  # 4x4 output


def test_scan_multiplies_by_length():
    def f(x, w):
        def body(c, _):
            return c @ w, ()
        return jax.lax.scan(body, x, None, length=5)[0]
    assert count_flops(f, jnp.ones((8, 8)), jnp.ones((8, 8))) == 5 * 2 * 8 * 8 * 8


def test_cond_takes_max_branch():
    def f(x, w):
        return jax.lax.cond(x.sum() > 0,
                            lambda: x @ w,          # 1 matmul
                            lambda: (x @ w) @ w)    # 2 matmuls
    got = count_flops(f, jnp.ones((8, 8)), jnp.ones((8, 8)))
    assert got == 2 * (2 * 8 * 8 * 8)


def test_jit_nesting():
    @jax.jit
    def inner(x, w):
        return x @ w

    f = lambda x, w: inner(x, w) + inner(x, w)
    assert count_flops(f, jnp.ones((8, 8)), jnp.ones((8, 8))) == 2 * 2 * 8 * 8 * 8


def test_pallas_flash_kernel_counted():
    """The flash interpolated-attention kernel's QK/PV matmuls must be
    counted (kernel jaxpr x grid); naive total = 2 matmuls over the fused
    2S KV length. Tile padding may add a few %, never less."""
    from aid_tpu.ops.flash_attention import flash_interpolated_attention

    B, H, S, D = 3, 2, 256, 64
    q = jnp.ones((B, H, S, D), jnp.bfloat16)
    kb = jnp.ones((B, H, S, D), jnp.bfloat16)
    coef = jnp.array([0.0, 0.5, 1.0])

    fn = lambda q: flash_interpolated_attention(
        q, q, q, coef, mode="fused_inner",
        k_begin=kb, v_begin=kb, k_end=kb, v_end=kb)
    got = count_flops(fn, q)
    naive = 2 * 2 * B * H * S * (2 * S) * D
    assert naive <= got <= int(naive * 1.10), (got, naive)


def test_mfu():
    assert abs(mfu(197e12, 2.0) - 0.5) < 1e-9


import pytest


@pytest.mark.slow  # two tiny-UNet trace+inits; keep the fast gate lean
def test_tiny_unet_magnitude():
    """Order-of-magnitude pin on a real model trace: the tiny UNet forward
    must count in the right ballpark and scale ~4x with 2x spatial size."""
    from aid_tpu.models import UNet2DCondition, configs

    cfg = configs.TINY_UNET
    unet = UNet2DCondition(cfg)
    s = cfg.sample_size
    ehs = jnp.zeros((1, 77, cfg.cross_attention_dim))
    params = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, s, s, cfg.in_channels)),
                          jnp.array(0), ehs))
    params = jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), params)

    def fwd(x):
        return unet.apply(params, x, jnp.array(0), ehs)

    f1 = count_flops(fwd, jnp.zeros((1, s, s, cfg.in_channels)))

    def fwd2(x):
        return unet.apply(params, x, jnp.array(0), ehs)

    f2 = count_flops(fwd2, jnp.zeros((1, 2 * s, 2 * s, cfg.in_channels)))
    assert f1 > 1e6  # convs alone dominate even the tiny config
    # conv cost is quadratic in spatial size; attention adds a superlinear
    # tail, text cross-attention a sublinear one
    assert 2.5 < f2 / f1 < 8.0
