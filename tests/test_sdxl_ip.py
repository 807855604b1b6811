"""SDXL pipeline + IP-Adapter pipeline integration tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DCondition, configs
from aid_tpu.models.ip_adapter import ImageProjection
from aid_tpu.pipelines import InterpolationPipeline
from aid_tpu.pipelines.sdxl import InterpolationXLPipeline
from aid_tpu.schedulers.ddim import DDIMScheduler
from aid_tpu.utils.tokenizer import HashTokenizer
from helpers import tiny_pipeline

TEXT2_CFG = dataclasses.replace(
    configs.TINY_CLIP_TEXT, hidden_size=24, intermediate_size=48, projection_dim=24,
)


@pytest.fixture(scope="module")
def xl_pipe():
    unet_cfg = dataclasses.replace(
        configs.TINY_SDXL_UNET,
        cross_attention_dim=configs.TINY_CLIP_TEXT.hidden_size + TEXT2_CFG.hidden_size,
    )
    vae_cfg = configs.TINY_VAE
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    unet = UNet2DCondition(unet_cfg)
    s = unet_cfg.sample_size
    added = {"text_embeds": jnp.zeros((1, 24)), "time_ids": jnp.zeros((1, 6))}
    unet_params = unet.init(
        k1, jnp.zeros((1, s, s, 4)), jnp.array(0),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)), None, added,
    )
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)))
    text = CLIPTextModel(configs.TINY_CLIP_TEXT)
    text_params = text.init(k3, jnp.zeros((1, 77), jnp.int32))
    text2 = CLIPTextModel(TEXT2_CFG)
    text2_params = text2.init(k4, jnp.zeros((1, 77), jnp.int32))

    return InterpolationXLPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=HashTokenizer(configs.TINY_CLIP_TEXT.vocab_size),
        text_encoder_2=text2, text_params_2=text2_params,
        tokenizer_2=HashTokenizer(TEXT2_CFG.vocab_size),
        scheduler=DDIMScheduler(), vae_scale_factor=2, default_size=16,
    )


class TestSDXL:
    def test_interpolate_single(self, xl_pipe):
        out = xl_pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog", num_inference_steps=3,
        )
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()

    def test_full_sequence_with_guide(self, xl_pipe):
        l0, l1 = xl_pipe.generate_latent(0), xl_pipe.generate_latent(1)
        out = xl_pipe.interpolate(
            l0, l1, "a cat", "a dog", guide_prompt="an animal",
            size=4, num_inference_steps=2,
        )
        assert out.shape == (4, 16, 16, 3)

    def test_save_gpu_batched_matches_sequential(self, xl_pipe):
        """SDXL batched fast path vs the stitched 3-frame loop (pooled
        embeds and time_ids must interpolate per-frame identically)."""
        l0, l1 = xl_pipe.generate_latent(0), xl_pipe.generate_latent(1)
        kw = dict(size=4, num_inference_steps=2, warmup_ratio=0.5)
        seq = xl_pipe.interpolate_save_gpu(l0, l1, "a cat", "a dog",
                                           batched=False, **kw)
        bat = xl_pipe.interpolate_save_gpu(l0, l1, "a cat", "a dog",
                                           batched=True, **kw)
        np.testing.assert_allclose(bat.astype(int), seq.astype(int), atol=1)

    def test_uncond_pass_uses_negative_pooled(self, xl_pipe):
        """The uncond UNet forward must receive the NEGATIVE pooled embeds /
        time_ids (reference sdxl:2275-2293): changing only added_cond_uncond
        changes the output, and None falls back to added_cond."""
        from aid_tpu.models.layers import AidMode
        from aid_tpu.pipelines import engine

        s = xl_pipe.unet.config.sample_size
        latents = jax.random.normal(jax.random.PRNGKey(3), (3, s, s, 4))
        emb, un, pooled, neg_pooled = xl_pipe.encode_prompt("a cat", "blurry")
        embs = jnp.concatenate([emb] * 3, axis=0)
        uncond = jnp.concatenate([un] * 3, axis=0)
        coef = jnp.array([0.0, 0.5, 1.0])
        time_ids = xl_pipe._time_ids(3, 16, 16)
        added = {"text_embeds": jnp.concatenate([pooled] * 3), "time_ids": time_ids}
        added_neg = {"text_embeds": jnp.concatenate([neg_pooled] * 3), "time_ids": time_ids}

        def run(added_uncond):
            state = xl_pipe.scheduler.init(2, latent_shape=latents.shape)
            return engine.denoise_sequence(
                xl_pipe.unet, xl_pipe.scheduler, xl_pipe.unet_params,
                latents + 0.0,  # denoise_sequence donates latents
                embs, uncond, coef, state, jnp.float32(5.0),
                early=AidMode.from_name("fused_outer"), late=AidMode.vanilla(),
                num_steps=2, warmup_steps=1,
                added_cond=added, added_cond_uncond=added_uncond,
            )

        base = run(None)
        same = run(added)  # None must default to added_cond
        diff = run(added_neg)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
        assert np.any(np.asarray(base) != np.asarray(diff))

    def test_pooled_embeds_are_interpolated(self, xl_pipe):
        """Changing t must change the mid frame (pooled path active), while
        endpoints stay fixed."""
        kw = dict(prompt_start="a cat", prompt_end="a dog", num_inference_steps=3)
        a = xl_pipe.interpolate_single(0.25, **kw)
        b = xl_pipe.interpolate_single(0.75, **kw)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[2], b[2])
        assert np.any(a[1] != b[1])


@pytest.fixture(scope="module")
def ip_pipe():
    unet_cfg = configs.TINY_UNET_IP
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    base = tiny_pipeline(unet_cfg=unet_cfg)
    proj = ImageProjection(cross_attention_dim=unet_cfg.cross_attention_dim,
                           num_tokens=unet_cfg.ip_num_tokens)
    proj_params = proj.init(k2, jnp.zeros((1, unet_cfg.ip_hidden_dim)))
    return dataclasses.replace(base, ip_proj=proj, ip_proj_params=proj_params, ip_scale=0.8)


class TestIPAdapter:
    def _embeds(self, dim=16):
        k = jax.random.PRNGKey(5)
        a, b = jax.random.split(k)
        return (jax.random.normal(a, (1, dim)), jax.random.normal(b, (1, dim)))

    def test_morphing(self, ip_pipe):
        e0, e1 = self._embeds()
        out = ip_pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            image_embeds_start=e0, image_embeds_end=e1,
            num_inference_steps=3,
        )
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()

    def test_image_embeds_change_output(self, ip_pipe):
        e0, e1 = self._embeds()
        kw = dict(prompt_start="a cat", prompt_end="a dog", num_inference_steps=3)
        no_ip = ip_pipe.interpolate_single(0.5, **kw)
        with_ip = ip_pipe.interpolate_single(
            0.5, image_embeds_start=e0, image_embeds_end=e1, **kw)
        assert np.any(no_ip != with_ip)

    def test_scale_control(self, ip_pipe):
        """image_end only -> scale-control mode: start endpoint is the
        negative embed (reference sd:1772-1774)."""
        _, e1 = self._embeds()
        sc = dataclasses.replace(ip_pipe, scale_control=True)
        out = sc.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            image_embeds_end=e1, negative_image_embeds=jnp.zeros_like(e1),
            num_inference_steps=3,
        )
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()

    @pytest.mark.parametrize("early", ["fused_outer", "fused_inner"])
    def test_ip_interp_modes(self, ip_pipe, early):
        e0, e1 = self._embeds()
        out = ip_pipe.interpolate_single(
            0.5, prompt_start="x", prompt_end="y", early=early,
            image_embeds_start=e0, image_embeds_end=e1, num_inference_steps=2,
        )
        assert out.shape == (3, 16, 16, 3)


class TestIPAdapterLoading:
    def test_load_aid_ip_adapter_from_state_dict(self):
        """End-to-end: synthetic IP checkpoint -> load -> morphing output
        changes vs text-only (reference load_aid_ip_adapter workflow)."""
        import numpy as np
        from aid_tpu.models.params import unet_attention_order

        cfg = configs.TINY_UNET_IP
        pipe = tiny_pipeline(unet_cfg=cfg)
        order = unet_attention_order(cfg)
        rng = np.random.default_rng(0)

        sd = {
            "image_proj": {
                "proj.weight": rng.normal(size=(cfg.ip_num_tokens * cfg.cross_attention_dim, cfg.ip_hidden_dim)).astype(np.float32) * 0.1,
                "proj.bias": np.zeros(cfg.ip_num_tokens * cfg.cross_attention_dim, np.float32),
                "norm.weight": np.ones(cfg.cross_attention_dim, np.float32),
                "norm.bias": np.zeros(cfg.cross_attention_dim, np.float32),
            },
            "ip_adapter": {},
        }
        inner_by_level = {}
        for li, path in enumerate(order):
            level = 0 if path[0].startswith(("down_blocks_0", "up_blocks_1")) else 1
            ch = cfg.block_out_channels[level]
            for proj in ("to_k_ip", "to_v_ip"):
                sd["ip_adapter"][f"{2 * li + 1}.{proj}.weight"] = (
                    rng.normal(size=(ch, cfg.cross_attention_dim)).astype(np.float32) * 0.1)

        before = pipe.interpolate_single(0.5, prompt_start="x", prompt_end="y", num_inference_steps=2)
        pipe.load_aid_ip_adapter(sd, scale=0.8)
        e0 = jnp.asarray(rng.normal(size=(1, cfg.ip_hidden_dim)).astype(np.float32))
        e1 = jnp.asarray(rng.normal(size=(1, cfg.ip_hidden_dim)).astype(np.float32))
        after = pipe.interpolate_single(
            0.5, prompt_start="x", prompt_end="y",
            image_embeds_start=e0, image_embeds_end=e1, num_inference_steps=2,
        )
        assert after.shape == before.shape
        assert np.any(after != before)

    def test_load_aid_sets_default(self):
        pipe = tiny_pipeline()
        pipe.load_aid(is_fused=False, atype="inner")
        assert pipe.default_early == "pure_inner"

    def test_load_ip_adapter_plus_resampler(self):
        """Plus checkpoints (resampler image_proj, 'latents' key) must build
        a Resampler over CLIP penultimate hidden states (reference loads
        h94 ip-adapter-plus via load_ip_adapter; diffusers
        IPAdapterPlusImageProjection)."""
        import numpy as np
        from aid_tpu.models.ip_adapter import Resampler
        from aid_tpu.models.params import unet_attention_order

        cfg = configs.TINY_UNET_IP
        pipe = tiny_pipeline(unet_cfg=cfg)
        order = unet_attention_order(cfg)
        rng = np.random.default_rng(3)
        hidden, embed_dim, nq, depth = 16, 16, cfg.ip_num_tokens, 2
        inner = 64  # max(1, hidden // 64) head x dim_head 64

        def lin(o, i):
            return rng.normal(size=(o, i)).astype(np.float32) * 0.05

        image_proj = {
            "latents": rng.normal(size=(1, nq, hidden)).astype(np.float32),
            "proj_in.weight": lin(hidden, embed_dim),
            "proj_in.bias": np.zeros(hidden, np.float32),
            "proj_out.weight": lin(cfg.cross_attention_dim, hidden),
            "proj_out.bias": np.zeros(cfg.cross_attention_dim, np.float32),
            "norm_out.weight": np.ones(cfg.cross_attention_dim, np.float32),
            "norm_out.bias": np.zeros(cfg.cross_attention_dim, np.float32),
        }
        for i in range(depth):
            for ln in ("norm1", "norm2"):
                image_proj[f"layers.{i}.0.{ln}.weight"] = np.ones(hidden, np.float32)
                image_proj[f"layers.{i}.0.{ln}.bias"] = np.zeros(hidden, np.float32)
            image_proj[f"layers.{i}.0.to_q.weight"] = lin(inner, hidden)
            image_proj[f"layers.{i}.0.to_kv.weight"] = lin(2 * inner, hidden)
            image_proj[f"layers.{i}.0.to_out.weight"] = lin(hidden, inner)
            image_proj[f"layers.{i}.1.0.weight"] = np.ones(hidden, np.float32)
            image_proj[f"layers.{i}.1.0.bias"] = np.zeros(hidden, np.float32)
            image_proj[f"layers.{i}.1.1.weight"] = lin(4 * hidden, hidden)
            image_proj[f"layers.{i}.1.3.weight"] = lin(hidden, 4 * hidden)

        sd = {"image_proj": image_proj, "ip_adapter": {}}
        for li, path in enumerate(order):
            level = 0 if path[0].startswith(("down_blocks_0", "up_blocks_1")) else 1
            ch = cfg.block_out_channels[level]
            for proj in ("to_k_ip", "to_v_ip"):
                sd["ip_adapter"][f"{2 * li + 1}.{proj}.weight"] = lin(ch, cfg.cross_attention_dim)

        pipe.load_aid_ip_adapter(sd, scale=0.8)
        assert isinstance(pipe.ip_proj, Resampler)
        assert pipe.ip_plus and pipe.ip_proj.depth == depth
        assert pipe.ip_proj.num_queries == nq

        # projection runs on SEQUENCE inputs (penultimate hidden states) and
        # the full pipeline generates with it
        seq = jnp.asarray(rng.normal(size=(1, 5, embed_dim)).astype(np.float32))
        tokens = pipe._project_ip(seq)
        assert tokens.shape == (1, nq, cfg.cross_attention_dim)
        out = pipe.interpolate_single(
            0.5, prompt_start="x", prompt_end="y",
            image_embeds_start=seq, image_embeds_end=seq * -1.0,
            num_inference_steps=2,
        )
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()


class TestDenoisingEnd:
    def test_truncated_loop_returns_latents(self, xl_pipe):
        lat = xl_pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=4,
            denoising_end=0.5,
        )
        # truncated runs return latents for a refiner stage
        assert lat.shape[-1] == 4 and lat.shape[0] == 3
        full = xl_pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=4,
        )
        assert full.shape[-1] == 3  # decoded images


class TestSDXLInheritedEntryPoints:
    """Review r3b: the inherited vanilla entry points must supply the SDXL
    micro-conditioning (added_cond) via _cond_kwargs or the UNet asserts."""

    @pytest.mark.slow
    def test_plain_call(self, xl_pipe):
        out = xl_pipe(prompt="a cat", num_inference_steps=2)
        assert out.shape == (1, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()

    @pytest.mark.slow
    def test_denoising_interpolate(self, xl_pipe):
        lat = jnp.concatenate(
            [xl_pipe.generate_latent(0), xl_pipe.generate_latent(1)], axis=0)
        out = xl_pipe.denoising_interpolate(lat, "a cat", "a dog",
                                            interpolated_ratio=0.5, timesteps=2)
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()

    def test_clip_skip_changes_embeddings(self, xl_pipe):
        e0 = xl_pipe.encode_prompt("a cat")[0]
        e1 = xl_pipe.encode_prompt("a cat", clip_skip=1)[0]
        assert np.abs(np.asarray(e0 - e1)).max() > 1e-6

    def test_denoising_end_out_of_range_raises(self, xl_pipe):
        with pytest.raises(ValueError, match="denoising_end"):
            xl_pipe.interpolate_single(
                0.5, prompt_start="a", prompt_end="b",
                num_inference_steps=2, denoising_end=1.0)


class TestIPEmbedsEndOnly:
    @pytest.mark.slow
    def test_end_only_defaults_start_to_zeros(self, ip_pipe):
        """image_embeds_end without start/negative must not crash: negative
        defaults to zeros and becomes the start endpoint (review r3b)."""
        _, e1 = TestIPAdapter._embeds(TestIPAdapter())
        out = ip_pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            image_embeds_end=e1, num_inference_steps=2)
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(out.astype(np.float32)).all()


class TestSDXLParityHooks:
    """SDXL prompt-embeds escape hatch + callbacks (VERDICT r3 missing #2;
    reference sdxl:449-452, 1191-1192, :863+) and micro-conditioning kwargs
    (VERDICT r3 missing #3; reference sdxl:992-1014, 1474-1476, 1733)."""

    def test_embeds_bypass_matches_prompt_path(self, xl_pipe):
        kw = dict(num_inference_steps=2, seed=5)
        want = xl_pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            negative_prompt="blurry", **kw)
        emb_s, un, pooled_s, neg_pooled = xl_pipe.encode_prompt("a cat", "blurry")
        emb_e, _, pooled_e, _ = xl_pipe.encode_prompt("a dog", "blurry")
        got = xl_pipe.interpolate_single(
            0.5,
            prompt_embeds_start=emb_s, prompt_embeds_end=emb_e,
            pooled_prompt_embeds_start=pooled_s,
            pooled_prompt_embeds_end=pooled_e,
            negative_prompt_embeds=un,
            negative_pooled_prompt_embeds=neg_pooled, **kw)
        np.testing.assert_array_equal(got, want)

    def test_embeds_bypass_guide_prompt(self, xl_pipe):
        kw = dict(num_inference_steps=2, seed=5)
        want = xl_pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            guide_prompt="an animal", negative_prompt="blurry", **kw)
        emb_s, un, pooled_s, neg_pooled = xl_pipe.encode_prompt("a cat", "blurry")
        emb_e, _, pooled_e, _ = xl_pipe.encode_prompt("a dog", "blurry")
        emb_g, _, pooled_g, _ = xl_pipe.encode_prompt("an animal", "blurry")
        got = xl_pipe.interpolate_single(
            0.5,
            prompt_embeds_start=emb_s, prompt_embeds_end=emb_e,
            pooled_prompt_embeds_start=pooled_s,
            pooled_prompt_embeds_end=pooled_e,
            negative_prompt_embeds=un,
            negative_pooled_prompt_embeds=neg_pooled,
            guide_prompt_embeds=emb_g,
            guide_pooled_prompt_embeds=pooled_g, **kw)
        np.testing.assert_array_equal(got, want)

    def test_embeds_bypass_requires_pooled(self, xl_pipe):
        emb, un, pooled, neg_pooled = xl_pipe.encode_prompt("a", "b")
        with pytest.raises(AssertionError, match="pooled"):
            xl_pipe.interpolate_single(
                0.5, prompt_embeds_start=emb, prompt_embeds_end=emb,
                negative_prompt_embeds=un, num_inference_steps=2)

    def test_callback_on_step_end_runs_per_step(self, xl_pipe):
        seen = []

        def cb(pipe, i, t, kwargs):
            seen.append((i, kwargs["latents"].shape))
            return None

        xl_pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=3,
            seed=0, callback_on_step_end=cb)
        assert [i for i, _ in seen] == [0, 1, 2]

    def test_negative_original_size_changes_only_uncond_time_ids(self, xl_pipe):
        cond, uncond = xl_pipe._time_ids_pair(
            3, 16, 16,
            original_size=(32, 32), crops_coords_top_left=(1, 2),
            negative_original_size=(8, 8),
            negative_crops_coords_top_left=(3, 4),
            negative_target_size=(16, 16))
        base_cond, base_uncond = xl_pipe._time_ids_pair(
            3, 16, 16, original_size=(32, 32), crops_coords_top_left=(1, 2))
        # cond ids are identical with or without the negative family
        np.testing.assert_array_equal(np.asarray(cond), np.asarray(base_cond))
        np.testing.assert_array_equal(
            np.asarray(cond[0]), [32, 32, 1, 2, 16, 16])
        # only the uncond ids pick up the negative micro-conditioning
        np.testing.assert_array_equal(
            np.asarray(uncond[0]), [8, 8, 3, 4, 16, 16])
        np.testing.assert_array_equal(np.asarray(base_uncond), np.asarray(base_cond))
        # reference semantics (sdxl:1474, :2121): a lone negative size (or
        # crop) is IGNORED — neg ids require original AND target together
        _, un_partial = xl_pipe._time_ids_pair(
            3, 16, 16, original_size=(32, 32), crops_coords_top_left=(1, 2),
            negative_original_size=(8, 8))
        np.testing.assert_array_equal(np.asarray(un_partial), np.asarray(base_cond))

    def test_micro_conditioning_flows_to_output(self, xl_pipe):
        kw = dict(prompt_start="a", prompt_end="b", num_inference_steps=2, seed=0)
        base = xl_pipe.interpolate_single(0.5, **kw)
        changed = xl_pipe.interpolate_single(
            0.5, original_size=(64, 64), crops_coords_top_left=(4, 4), **kw)
        assert np.any(base != changed)
        neg_changed = xl_pipe.interpolate_single(
            0.5, negative_original_size=(64, 64), negative_target_size=(16, 16),
            **kw)
        assert np.any(base != neg_changed)
