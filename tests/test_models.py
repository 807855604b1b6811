"""Shape/jit smoke tests for the model zoo on tiny configs (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.models import (
    AidContext,
    AidMode,
    AutoencoderKL,
    CLIPTextModel,
    CLIPVisionModel,
    UNet2DCondition,
    configs,
)


@pytest.fixture(scope="module")
def rngs():
    return jax.random.PRNGKey(0)


class TestUNet:
    @pytest.mark.slow  # 40s+ compile: keeps the fast gate <180s (VERDICT r3 #9)
    def test_sd_shape_and_aid(self, rngs):
        cfg = configs.TINY_UNET
        model = UNet2DCondition(cfg)
        B, H = 3, cfg.sample_size
        sample = jnp.zeros((B, H, H, cfg.in_channels))
        t = jnp.array(10)
        ehs = jnp.zeros((B, 7, cfg.cross_attention_dim))
        params = model.init(rngs, sample, t, ehs)
        out = model.apply(params, sample, t, ehs)
        assert out.shape == (B, H, H, cfg.out_channels)

        aid = AidContext(coef=jnp.array([0.0, 0.5, 1.0]), mode=AidMode.from_name("fused_outer"))
        out_aid = model.apply(params, sample, t, ehs, aid)
        assert out_aid.shape == out.shape

    @pytest.mark.slow  # ~1 min: eager init + two full applies of the AID path
    def test_aid_endpoint_frames_match_vanilla(self, rngs):
        """Frames 0 and B-1 with coef 0/1 under fused_outer must equal the
        vanilla forward for those frames (endpoints are fixed points)."""
        cfg = configs.TINY_UNET
        model = UNet2DCondition(cfg)
        B, H = 3, cfg.sample_size
        sample = jax.random.normal(jax.random.PRNGKey(1), (B, H, H, cfg.in_channels))
        t = jnp.array(5)
        ehs = jax.random.normal(jax.random.PRNGKey(2), (B, 7, cfg.cross_attention_dim))
        params = model.init(rngs, sample, t, ehs)

        vanilla = model.apply(params, sample, t, ehs)
        aid = AidContext(coef=jnp.array([0.0, 0.5, 1.0]), mode=AidMode.from_name("fused_outer"))
        out = model.apply(params, sample, t, ehs, aid)
        # NOTE: endpoint frames attend to [own; own] K/V — identical softmax
        # distribution, so identical output.
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vanilla[0]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(vanilla[2]), rtol=1e-4, atol=1e-4)
        # middle frame must differ
        assert np.abs(np.asarray(out[1] - vanilla[1])).max() > 1e-4

    def test_sdxl_added_cond(self, rngs):
        cfg = configs.TINY_SDXL_UNET
        model = UNet2DCondition(cfg)
        B, H = 3, cfg.sample_size
        sample = jnp.zeros((B, H, H, cfg.in_channels))
        ehs = jnp.zeros((B, 7, cfg.cross_attention_dim))
        added = {"text_embeds": jnp.zeros((B, 24)), "time_ids": jnp.zeros((B, 6))}
        params = model.init(rngs, sample, jnp.array(10), ehs, None, added)
        out = model.apply(params, sample, jnp.array(10), ehs, None, added)
        assert out.shape == (B, H, H, cfg.out_channels)

    def test_ip_adapter_branch(self, rngs):
        cfg = configs.TINY_UNET_IP
        model = UNet2DCondition(cfg)
        B, H = 3, cfg.sample_size
        sample = jnp.zeros((B, H, H, cfg.in_channels))
        ehs = jnp.zeros((B, 7, cfg.cross_attention_dim))
        ip = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.ip_num_tokens, cfg.cross_attention_dim))
        aid = AidContext(
            coef=jnp.array([0.0, 0.5, 1.0]),
            mode=AidMode.from_name("fused_outer", has_ip=True),
            ip_hidden_states=ip,
            ip_scale=0.6,
        )
        params = model.init(rngs, sample, jnp.array(1), ehs, aid)
        out = model.apply(params, sample, jnp.array(1), ehs, aid)
        # zero IP scale must reproduce the no-IP output
        aid0 = AidContext(coef=aid.coef, mode=aid.mode, ip_hidden_states=ip, ip_scale=0.0)
        out0 = model.apply(params, sample, jnp.array(1), ehs, aid0)
        aid_none = AidContext(coef=aid.coef, mode=AidMode.from_name("fused_outer", has_ip=False))
        out_none = model.apply(params, sample, jnp.array(1), ehs, aid_none)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out_none), rtol=1e-5, atol=1e-5)
        assert np.abs(np.asarray(out - out_none)).max() > 1e-5


class TestVAE:
    @pytest.mark.slow  # init+encode+decode = 3 compiles, ~21 s on CPU
    def test_roundtrip_shapes(self, rngs):
        cfg = configs.TINY_VAE
        model = AutoencoderKL(cfg)
        x = jnp.zeros((2, 16, 16, 3))
        params = model.init(rngs, x)
        f = 2 ** (len(cfg.block_out_channels) - 1)
        z = model.apply(params, x, method=AutoencoderKL.encode)
        assert z.shape == (2, 16 // f, 16 // f, cfg.latent_channels)
        img = model.apply(params, z, method=AutoencoderKL.decode)
        assert img.shape == (2, 16, 16, 3)


class TestCLIP:
    def test_text_shapes_and_clip_skip(self, rngs):
        cfg = configs.TINY_CLIP_TEXT
        model = CLIPTextModel(cfg)
        ids = jnp.array([[1, 5, 8, 900, 0, 0, 0]])
        params = model.init(rngs, ids)
        out, pooled, hs = model.apply(params, ids)
        assert out.shape == (1, 7, cfg.hidden_size)
        assert pooled.shape == (1, cfg.hidden_size)
        assert len(hs) == cfg.num_hidden_layers + 1
        out_skip, _, _ = model.apply(params, ids, clip_skip=1)
        assert np.abs(np.asarray(out - out_skip)).max() > 1e-6

    def test_vision_shapes(self, rngs):
        cfg = configs.TINY_CLIP_VISION
        model = CLIPVisionModel(cfg)
        px = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
        params = model.init(rngs, px)
        embeds, penult = model.apply(params, px)
        assert embeds.shape == (2, cfg.projection_dim)
        n_patches = (cfg.image_size // cfg.patch_size) ** 2 + 1
        assert penult.shape == (2, n_patches, cfg.hidden_size)


class TestFreeU:
    @pytest.mark.slow  # 4 full-UNet compiles, ~22 s on CPU
    def test_freeu_changes_output(self, rngs):
        from aid_tpu.models.freeu import FreeUConfig

        cfg = configs.TINY_UNET
        model = UNet2DCondition(cfg)
        B, H = 2, cfg.sample_size
        x = jax.random.normal(jax.random.PRNGKey(4), (B, H, H, 4))
        e = jax.random.normal(jax.random.PRNGKey(5), (B, 7, cfg.cross_attention_dim))
        params = model.init(rngs, x, jnp.array(0), e)
        base = model.apply(params, x, jnp.array(1), e)
        freeu = model.apply(params, x, jnp.array(1), e, None, None, FreeUConfig())
        assert base.shape == freeu.shape
        assert np.abs(np.asarray(base - freeu)).max() > 1e-5
        # neutral parameters must be a no-op (scale 1 everywhere)
        neutral = model.apply(params, x, jnp.array(1), e, None, None,
                              FreeUConfig(s1=1.0, s2=1.0, b1=1.0, b2=1.0))
        np.testing.assert_allclose(np.asarray(neutral), np.asarray(base), rtol=1e-4, atol=1e-5)


class TestFourierFilter:
    def test_scale_one_is_identity(self):
        from aid_tpu.models.freeu import fourier_filter

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        y = fourier_filter(x, threshold=1, scale=1.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_scale_zero_removes_dc(self):
        from aid_tpu.models.freeu import fourier_filter

        x = jnp.ones((1, 8, 8, 1))  # pure DC
        y = fourier_filter(x, threshold=1, scale=0.0)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-5)


def test_attention_free_config_runs():
    """UNet2DModel-style configs (no cross attention anywhere) must build
    and run (mid block skips its transformer)."""
    import dataclasses

    cfg = dataclasses.replace(
        configs.TINY_UNET, cross_attention_levels=(False, False),
        transformer_layers_per_block=(0, 0),
    )
    model = UNet2DCondition(cfg)
    s = cfg.sample_size
    x = jnp.zeros((1, s, s, 4))
    e = jnp.zeros((1, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(0), e)
    out = model.apply(params, x, jnp.array(0), e)
    assert out.shape == x.shape


class TestTiledDecode:
    """Spatial VAE tiling (reference enable_vae_tiling, sd:175-181;
    VERDICT r2 item #9)."""

    def _stub_vae(self):
        """Shift-invariant, padding-free decoder: tiling + overlap blending
        must reproduce the untiled decode EXACTLY — any tile-placement or
        blend-indexing bug shows up as a seam."""
        import flax.linen as nn

        from aid_tpu.models.configs import VAEConfig

        class NearestUpsampleVAE(nn.Module):
            config: VAEConfig

            def decode(self, z):
                f = 2 ** (len(self.config.block_out_channels) - 1)
                return jnp.repeat(jnp.repeat(z[..., :3], f, axis=1), f, axis=2)

        return NearestUpsampleVAE(VAEConfig(block_out_channels=(1, 1)))

    def test_tiling_exact_for_shift_invariant_decoder(self):
        from aid_tpu.pipelines.engine import tiled_decode

        vae = self._stub_vae()
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 24, 4))
        full = vae.apply({}, z, method="decode")
        # 6 and 10 are NOT divisible by 4: the blend extent must be derived
        # from the stride (actual overlap), not rounded independently, or
        # tiles assemble displaced (code-review r3 finding).
        for tile in (6, 8, 10, 12, 16):
            out = tiled_decode(vae, {}, z, tile_latent_size=tile)
            np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                       atol=1e-6, err_msg=f"tile={tile}")

    def test_tiling_nondivisible_shapes(self):
        from aid_tpu.pipelines.engine import tiled_decode

        vae = self._stub_vae()
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 29, 4))
        out = tiled_decode(vae, {}, z, tile_latent_size=8)
        full = vae.apply({}, z, method="decode")
        assert out.shape == full.shape == (1, 40, 58, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)

    @pytest.mark.slow  # 40s+ compile: keeps the fast gate <180s (VERDICT r3 #9)
    def test_single_tile_matches_plain_decode(self):
        """Real (random-weight) VAE: one tile covering the latent must equal
        the plain decode bit-exactly."""
        from aid_tpu.models import AutoencoderKL, configs
        from aid_tpu.pipelines import engine

        vae = AutoencoderKL(configs.TINY_VAE)
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
        full = engine.decode_latents(vae, params, z, 0.18215)
        tiled = engine.decode_latents(vae, params, z, 0.18215, tile_latent_size=16)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))

    @pytest.mark.slow  # real-config VAE decode, heaviest single compile in the tier
    def test_real_vae_tiled_decode_finite_and_bounded(self):
        from aid_tpu.models import AutoencoderKL, configs
        from aid_tpu.pipelines import engine

        vae = AutoencoderKL(configs.TINY_VAE)
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 24, 4))
        out = np.asarray(engine.decode_latents(
            vae, params, z, 0.18215, tile_latent_size=16, per_frame=True))
        assert out.shape == (1, 48, 48, 3)
        assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0


class TestConvBackend:
    """conv_backend="xla" (GSPMD-safe, no pallas_call) must share the exact
    param tree and numerics with "auto" — mirrors attention_backend."""

    @pytest.mark.slow  # 40s+ compile: keeps the fast gate <180s (VERDICT r3 #9)
    def test_xla_backend_matches_auto(self, rngs):
        cfg = configs.TINY_UNET
        auto = UNet2DCondition(cfg)
        xla = UNet2DCondition(cfg, conv_backend="xla")
        B, H = 2, cfg.sample_size
        sample = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, cfg.in_channels))
        t = jnp.array(10)
        ehs = jax.random.normal(jax.random.PRNGKey(1), (B, 7, cfg.cross_attention_dim))
        params = auto.init(rngs, sample, t, ehs)
        # identical param tree: checkpoints convert the same whichever
        # backend the module uses
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(xla.init(rngs, sample, t, ehs)))
        a = auto.apply(params, sample, t, ehs)
        b = xla.apply(params, sample, t, ehs)
        # on CPU both routes lower identically (the pallas classes are
        # TPU-gated), so this pins plumbing, not kernels
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_conv3x3_field_forces_lax_for_pallas_class(self):
        from aid_tpu.models.layers import Conv3x3, conv_lowering

        # the wide high-res class routes pallas under "auto" on TPU;
        # the field must reroute exactly that class
        assert conv_lowering(128 * 128, 640) == "pallas"
        m = Conv3x3(8, conv_backend="xla")
        x = jnp.ones((1, 8, 8, 4))
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (1, 8, 8, 8)


class TestPooledEOSPosition:
    """transformers semantics for the pooled position (review r3b):
    first occurrence of the configured EOS id — robust to textual-inversion
    tokens whose ids exceed the EOS id — with the legacy argmax fallback."""

    def _cfg(self, eos):
        import dataclasses

        return dataclasses.replace(configs.TINY_CLIP_TEXT, eos_token_id=eos)

    def test_first_eos_wins_over_larger_ti_id(self, rngs):
        cfg = self._cfg(eos=7)
        model = CLIPTextModel(cfg)
        params = model.init(rngs, jnp.zeros((1, 6), jnp.int32))
        # TI token id 40 (> eos 7) after the EOS at position 3
        ids_ti = jnp.array([[1, 5, 40, 7, 7, 7]])
        # same EOS position, no TI token
        ids_plain = jnp.array([[1, 5, 2, 7, 7, 7]])
        _, pooled_ti, _ = model.apply(params, ids_ti)
        # pooled must come from position 3 (first eos), not argmax position 2
        hs, _, _ = model.apply(params, ids_ti)
        np.testing.assert_allclose(np.asarray(pooled_ti), np.asarray(hs[:, 3]),
                                   rtol=1e-6)

    def test_legacy_eos2_uses_argmax(self, rngs):
        cfg = self._cfg(eos=2)
        model = CLIPTextModel(cfg)
        params = model.init(rngs, jnp.zeros((1, 5), jnp.int32))
        ids = jnp.array([[1, 9, 4, 2, 2]])
        hs, pooled, _ = model.apply(params, ids)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(hs[:, 1]),
                                   rtol=1e-6)  # argmax(ids) = position of 9

    def test_no_eos_falls_back_to_argmax(self, rngs):
        cfg = self._cfg(eos=7)
        model = CLIPTextModel(cfg)
        params = model.init(rngs, jnp.zeros((1, 4), jnp.int32))
        ids = jnp.array([[1, 9, 4, 3]])
        hs, pooled, _ = model.apply(params, ids)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(hs[:, 1]),
                                   rtol=1e-6)


class TestSafetyAdjustment:
    def test_adjustment_applies_to_special_scores_only(self, rngs):
        """diffusers semantics (review r3d): a large caller adjustment must
        not shift the concept scores — random-weight cosines sit far below
        the ones-initialized thresholds, so no image should flag."""
        from aid_tpu.models.safety import SafetyChecker

        model = SafetyChecker(configs.TINY_CLIP_VISION)
        px = jax.random.normal(jax.random.PRNGKey(0), (2, configs.TINY_CLIP_VISION.image_size,
                                                       configs.TINY_CLIP_VISION.image_size, 3))
        params = model.init(rngs, px)
        flags = model.apply(params, px, adjustment=10.0)
        assert not bool(np.asarray(flags).any())


class TestFreeUFourierBlock:
    def test_matches_diffusers_slicing(self):
        """diffusers masks the HALF-OPEN [c-t : c+t) block (2t x 2t); the
        old |.| <= t mask scaled one extra row/column per axis (review
        r3d). Pin exact equivalence with the diffusers slicing on random
        input for several thresholds/scales."""
        from aid_tpu.models.freeu import fourier_filter

        def ref_filter(x, t, scale):
            H, W = x.shape[1:3]
            freq = np.fft.fftshift(np.fft.fftn(x, axes=(1, 2)), axes=(1, 2))
            crow, ccol = H // 2, W // 2
            mask = np.ones((1, H, W, 1), np.float32)
            mask[:, crow - t:crow + t, ccol - t:ccol + t] = scale
            return np.fft.ifftn(
                np.fft.ifftshift(freq * mask, axes=(1, 2)), axes=(1, 2)).real

        x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)))
        for t in (1, 2):
            for scale in (0.0, 0.5, 1.2):
                got = np.asarray(fourier_filter(jnp.asarray(x, jnp.float32), t, scale))
                np.testing.assert_allclose(got, ref_filter(x, t, scale),
                                           atol=1e-5, err_msg=f"t={t} s={scale}")
