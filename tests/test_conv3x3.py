"""Conv3x3 lowering equivalence: the shift-and-matmul path must match
nn.Conv (same params, same outputs) for every shape class the heuristic
routes (see aid_tpu/models/layers.py::Conv3x3, PERF.md round-2 log)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from aid_tpu.models.layers import Conv3x3


@pytest.mark.parametrize(
    "hw,cin,cout",
    [
        (8, 640, 320),    # shift9 path (deep level)
        (8, 1280, 1280),  # shift9 path
        (16, 320, 320),   # lax path (cin < 640, small spatial)
        (72, 320, 320),   # im2col path (H*W > 4096, 64 <= cin <= 384)
        (4, 704, 64),     # shift9, non-square channel change
    ],
)
def test_conv3x3_matches_nn_conv(hw, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw, hw, cin), jnp.float32)
    ref = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)))
    mine = Conv3x3(cout)
    p = ref.init(jax.random.PRNGKey(1), x)
    shapes_ref = jax.tree_util.tree_map(lambda a: a.shape, p)
    shapes_mine = jax.tree_util.tree_map(
        lambda a: a.shape, mine.init(jax.random.PRNGKey(1), x))
    assert shapes_ref == shapes_mine  # converter compatibility
    out_ref = ref.apply(p, x)
    out_mine = mine.apply(p, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_mine),
                               atol=1e-4, rtol=1e-4)


def test_conv_lowering_policy():
    """Pin the per-class routing (measured on v5e, tools/opt3_results.jsonl)."""
    from aid_tpu.models.layers import conv_lowering

    assert conv_lowering(32 * 32, 1280) == "shift9"
    assert conv_lowering(64 * 64, 640) == "shift9"
    assert conv_lowering(128 * 128, 320) == "im2col"
    assert conv_lowering(128 * 128, 640) == "pallas"   # SDXL up concat
    assert conv_lowering(128 * 128, 960) == "pallas"
    assert conv_lowering(64 * 64, 320) == "lax"
    assert conv_lowering(128 * 128, 4) == "lax"


def test_conv3x3_heuristic_is_shape_stable():
    """Both lowerings trace under jit with no shape errors at the routing
    boundary (H*W == 4096, cin == 640)."""
    for hw, cin in [(64, 640), (64, 639), (65, 640)]:
        x = jnp.zeros((1, hw, hw, cin), jnp.bfloat16)
        m = Conv3x3(32, dtype=jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(p, x)
        assert out.shape == (1, hw, hw, 32)


class TestPallasConv:
    """ops/conv.py shift-accumulate kernel vs lax.conv (interpret mode)."""

    @pytest.mark.parametrize(
        "shape", [(2, 16, 128, 320, 320),
                  # the 640x640 case interprets ~13 s on CPU: slow tier only
                  pytest.param((1, 8, 64, 640, 640), marks=pytest.mark.slow),
                  (2, 16, 24, 12, 20), (1, 8, 128, 640, 320),
                  (1, 8, 128, 960, 320)])  # SDXL up-block concat class
    def test_matches_lax_conv(self, shape):
        from aid_tpu.ops.conv import conv3x3_same

        B, H, W, Cin, Cout = shape
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(Cout), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = conv3x3_same(x, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    @pytest.mark.parametrize(
        "shape", [(2, 16, 128, 320, 320),   # level-0 class (the packed target)
                  (2, 16, 24, 12, 20), (1, 8, 128, 640, 320)])
    def test_packed_matches_lax_conv(self, shape):
        """Packed-K variant (one K=3*Cin dot per dy) == lax.conv."""
        from aid_tpu.ops.conv import conv3x3_same

        B, H, W, Cin, Cout = shape
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(Cout), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = conv3x3_same(x, w, b, interpret=True, packed=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    def test_gnsilu_fused_matches_flax_chain(self):
        """conv3x3_gnsilu == nn.GroupNorm -> silu -> lax.conv (interpret)."""
        from aid_tpu.ops.conv import conv3x3_gnsilu

        B, H, W, C, Cout = 2, 16, 24, 32, 20
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, C, Cout) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(Cout), jnp.float32)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5).apply(
            {"params": {"scale": gamma, "bias": beta}}, x)
        want = jax.lax.conv_general_dilated(
            nn.silu(h), w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = conv3x3_gnsilu(x, w, b, gamma, beta, num_groups=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_gnsilu_fused_bf16(self):
        """bf16 activations through the fused kernel (production dtype):
        prologue computes in f32 from bf16 inputs, rounds once at the dot."""
        from aid_tpu.ops.conv import conv3x3_gnsilu

        rng = np.random.RandomState(13)
        x = jnp.asarray(rng.randn(1, 16, 128, 320), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 320, 320) * 0.05, jnp.float32)
        b = jnp.zeros((320,), jnp.float32)
        gamma = jnp.ones((320,), jnp.float32)
        beta = jnp.zeros((320,), jnp.float32)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16).apply(
            {"params": {"scale": gamma, "bias": beta}}, x)
        want = jax.lax.conv_general_dilated(
            nn.silu(h).astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv3x3_gnsilu(x, w, b, gamma, beta, num_groups=32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.08, rtol=0.08)

    def test_resnet_fused_branch_matches_unfused(self, monkeypatch):
        """ResnetBlock2D with the fused GN+conv routing on == off (same
        params, same outputs on CPU where the inline-prologue fallback
        runs), and the param trees are identical."""
        from aid_tpu.models import layers

        x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 320) * 0.1,
                        jnp.float32)
        temb = jnp.asarray(np.random.RandomState(3).randn(2, 64), jnp.float32)
        block = layers.ResnetBlock2D(out_channels=320)
        p = block.init(jax.random.PRNGKey(0), x, temb)
        out_off = block.apply(p, x, temb)
        monkeypatch.setattr(layers, "_FUSED_GN_CONV", True)
        assert layers.gn_conv_fused(32 * 32, 320)
        p_fused = block.init(jax.random.PRNGKey(0), x, temb)
        assert jax.tree_util.tree_map(lambda a: a.shape, p) == \
            jax.tree_util.tree_map(lambda a: a.shape, p_fused)
        out_on = block.apply(p, x, temb)
        np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_on),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_matches_lax_conv_bf16(self):
        from aid_tpu.ops.conv import conv3x3_same

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1, 16, 128, 320), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 320, 320) * 0.05, jnp.bfloat16)
        b = jnp.zeros((320,), jnp.bfloat16)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv3x3_same(x, w, b, interpret=True)
        # both accumulate f32 on the MXU and round once to bf16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05, rtol=0.05)
