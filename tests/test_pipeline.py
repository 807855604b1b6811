"""Integration tests: tiny random-weight pipeline end-to-end under jit
(SURVEY.md §4 'Integration')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_pipeline

STEPS = 4


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline()


class TestInterpolateSingle:
    def test_shapes_and_determinism(self, pipe):
        out1 = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            num_inference_steps=STEPS, seed=3,
        )
        out2 = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            num_inference_steps=STEPS, seed=3,
        )
        assert out1.shape == (3, 16, 16, 3) and out1.dtype == np.uint8
        np.testing.assert_array_equal(out1, out2)

    def test_endpoints_independent_of_t(self, pipe):
        """Frames 0/2 have coef 0/1 — changing t must only change frame 1
        (endpoint fixed-point property of the whole pipeline)."""
        kw = dict(prompt_start="a cat", prompt_end="a dog", num_inference_steps=STEPS, seed=3)
        a = pipe.interpolate_single(0.3, **kw)
        b = pipe.interpolate_single(0.7, **kw)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[2], b[2])
        assert np.any(a[1] != b[1])

    def test_guide_prompt_paid(self, pipe):
        base = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            num_inference_steps=STEPS, seed=3,
        )
        paid = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            guide_prompt="an animal", num_inference_steps=STEPS, seed=3,
        )
        np.testing.assert_array_equal(base[0], paid[0])  # endpoints unchanged
        assert np.any(base[1] != paid[1])

    @pytest.mark.parametrize("early", ["fused_outer", "pure_outer", "fused_inner", "pure_inner"])
    def test_all_modes_run(self, pipe, early):
        out = pipe.interpolate_single(
            0.5, prompt_start="x", prompt_end="y", early=early,
            num_inference_steps=2, seed=0,
        )
        assert out.shape == (3, 16, 16, 3)

    def test_warmup_ratio_zero_is_vanilla(self, pipe):
        """warmup_ratio=0 means AID never activates; early mode is irrelevant."""
        kw = dict(prompt_start="a cat", prompt_end="a dog", num_inference_steps=STEPS,
                  seed=3, warmup_ratio=0.0)
        a = pipe.interpolate_single(0.5, early="fused_outer", **kw)
        b = pipe.interpolate_single(0.5, early="fused_inner", **kw)
        np.testing.assert_array_equal(a, b)


class TestInterpolateSequence:
    def test_full_sequence_shape(self, pipe):
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        out = pipe.interpolate(
            l0, l1, "a cat", "a dog", size=5, num_inference_steps=STEPS,
        )
        assert out.shape == (5, 16, 16, 3)

    def test_sequence_endpoints_match_single(self, pipe):
        """Endpoint frames of the batched sequence must match the 3-frame
        path's endpoints (same coef 0/1, same latents, same embeds)."""
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        seq = pipe.interpolate(l0, l1, "a cat", "a dog", size=5,
                               num_inference_steps=STEPS, warmup_ratio=0.5)
        single = pipe.interpolate_single(
            0.5, l0, l1, "a cat", "a dog", num_inference_steps=STEPS,
            warmup_ratio=0.5,
        )
        # different batch sizes compile different programs; XLA CPU reduction
        # partitioning may vary -> compare up to 1 uint8 step, not bitwise
        np.testing.assert_allclose(seq[0].astype(int), single[0].astype(int), atol=1)
        np.testing.assert_allclose(seq[-1].astype(int), single[-1].astype(int), atol=1)

    def test_guide_prompt_broadcast(self, pipe):
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        out = pipe.interpolate(
            l0, l1, "a cat", "a dog", guide_prompt="an animal",
            size=4, num_inference_steps=2,
        )
        assert out.shape == (4, 16, 16, 3)

    def test_interpolate_save_gpu_stitching(self, pipe):
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        out = pipe.interpolate_save_gpu(
            l0, l1, "a cat", "a dog", size=5, num_inference_steps=2,
            batched=False,
        )
        assert out.shape == (5, 16, 16, 3)

    def test_save_gpu_batched_matches_sequential(self, pipe):
        """The batched fast path (one size-frame run at the Beta-PPF points,
        VERDICT r4 next #2 / SURVEY §7) must reproduce the reference's
        stitched (size-2)x3-frame sequence: every AID mode sources K/V only
        from the endpoint rows, so each middle frame depends only on its own
        latent/embeds + the endpoint trajectories."""
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        kw = dict(size=5, num_inference_steps=STEPS, warmup_ratio=0.5)
        seq = pipe.interpolate_save_gpu(l0, l1, "a cat", "a dog",
                                        batched=False, **kw)
        bat = pipe.interpolate_save_gpu(l0, l1, "a cat", "a dog",
                                        batched=True, **kw)
        np.testing.assert_allclose(bat.astype(int), seq.astype(int), atol=1)

    def test_save_gpu_batched_matches_sequential_guide_prompt(self, pipe):
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        kw = dict(size=4, num_inference_steps=STEPS, warmup_ratio=0.5,
                  guide_prompt="an animal")
        seq = pipe.interpolate_save_gpu(l0, l1, "a cat", "a dog",
                                        batched=False, **kw)
        bat = pipe.interpolate_save_gpu(l0, l1, "a cat", "a dog",
                                        batched=True, **kw)
        np.testing.assert_allclose(bat.astype(int), seq.astype(int), atol=1)


class TestBaselines:
    def test_denoising_interpolate(self, pipe):
        latents = pipe.generate_latent(7)
        out = pipe.denoising_interpolate(
            latents, "a cat", "a dog", interpolated_ratio=0.5, timesteps=STEPS,
        )
        assert out.shape == (1, 16, 16, 3)

    def test_text2img(self, pipe):
        out = pipe("a cat", num_inference_steps=STEPS, seed=11)
        assert out.shape == (1, 16, 16, 3)


class TestBatchedCFG:
    def test_batched_matches_sequential(self, pipe):
        """cfg_mode='batched' (one 2N-batch forward; uncond rows carry own
        K/V as both endpoints) must match the reference-structure sequential
        CFG — the duplicated-KV softmax identity makes them mathematically
        identical."""
        import dataclasses

        kw = dict(prompt_start="a cat", prompt_end="a dog",
                  num_inference_steps=STEPS, seed=3)
        seq = pipe.interpolate_single(0.5, **kw)
        batched_pipe = dataclasses.replace(pipe, cfg_mode="batched")
        bat = batched_pipe.interpolate_single(0.5, **kw)
        np.testing.assert_allclose(bat.astype(int), seq.astype(int), atol=1)

    def test_batched_full_sequence(self, pipe):
        import dataclasses

        batched_pipe = dataclasses.replace(pipe, cfg_mode="batched")
        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        seq = pipe.interpolate(l0, l1, "a", "b", size=4, num_inference_steps=2)
        bat = batched_pipe.interpolate(l0, l1, "a", "b", size=4, num_inference_steps=2)
        np.testing.assert_allclose(bat.astype(int), seq.astype(int), atol=1)


class TestFusedLoop:
    def test_fused_loop_matches_split(self, pipe):
        """loop_mode='fused' (single trace, warmup cutoff as a traced
        predicate via force-skipped endpoint segments) must equal the
        two-phase split loop. CPU runs the xla select path; the kernel path
        relies on the skip-exactness identity tested in interpret mode."""
        from aid_tpu.models.layers import AidMode
        from aid_tpu.pipelines import engine
        import jax

        l0, l1 = pipe.generate_latent(0), pipe.generate_latent(1)
        from aid_tpu.ops.interp import spherical_interpolation, linear_interpolation

        latents = spherical_interpolation(l0, l1, 4)
        emb_s, un_s = pipe.encode_prompt("a cat")
        emb_e, un_e = pipe.encode_prompt("a dog")
        embs = linear_interpolation(emb_s, emb_e, size=4)
        uncond = linear_interpolation(un_s, un_e, size=4)
        coef = jnp.array([0.0, 0.3, 0.7, 1.0])

        def run(loop_mode):
            state = pipe.scheduler.init(4)
            lat = spherical_interpolation(l0, l1, 4)
            return np.asarray(engine.denoise_sequence(
                pipe.unet, pipe.scheduler, pipe.unet_params,
                lat, embs, uncond, coef, state, jnp.float32(7.5),
                early=AidMode.from_name("fused_outer"), late=AidMode.vanilla(),
                num_steps=4, warmup_steps=2, loop_mode=loop_mode,
            ))

        split = run("split")
        fused = run("fused")
        np.testing.assert_allclose(fused, split, rtol=1e-4, atol=1e-4)


class TestInterrupt:
    """Cooperative cancel (reference self._interrupt, sd:1216, 1835-1836):
    VERDICT r2 item #2 — the symbols COMPONENTS.md names must exist and work."""

    def test_chunked_matches_single_shot(self, pipe):
        import dataclasses

        kw = dict(prompt_start="a cat", prompt_end="a dog",
                  num_inference_steps=STEPS, seed=3)
        one_shot = pipe.interpolate_single(0.5, **kw)
        chunked_pipe = dataclasses.replace(pipe, denoise_chunk_size=1)
        chunked = chunked_pipe.interpolate_single(0.5, **kw)
        np.testing.assert_allclose(chunked.astype(int), one_shot.astype(int), atol=1)

    def test_interrupt_after_first_chunk_returns_early(self, pipe):
        import dataclasses

        chunked_pipe = dataclasses.replace(pipe, denoise_chunk_size=1)
        seen = []

        def cancel_after_one(p, step_index, latents):
            seen.append(step_index)
            p.interrupt()

        out = chunked_pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            num_inference_steps=STEPS, seed=3,
            callback_on_chunk_end=cancel_after_one,
        )
        assert seen == [1]  # only chunk 1 ran; remaining steps skipped
        assert out.shape == (3, 16, 16, 3)  # partial latents still decoded
        full = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            num_inference_steps=STEPS, seed=3,
        )
        assert np.any(out != full)  # genuinely stopped before completion

    def test_interrupt_flag_resets_per_call(self, pipe):
        import dataclasses

        chunked_pipe = dataclasses.replace(pipe, denoise_chunk_size=2)
        chunked_pipe.interrupt()
        out = chunked_pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=STEPS)
        full = pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=STEPS)
        np.testing.assert_allclose(out.astype(int), full.astype(int), atol=1)

    def test_callback_can_edit_latents(self, pipe):
        """Chunk-end callback returning an array replaces the latents —
        the reference's callback_on_step_end latents override (sd:1919-1928)
        at chunk granularity."""
        import dataclasses

        chunked_pipe = dataclasses.replace(pipe, denoise_chunk_size=2)

        def zero_latents(p, step_index, latents):
            return jnp.zeros_like(latents)

        out = chunked_pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=STEPS,
            callback_on_chunk_end=zero_latents, output_type="latent",
        )
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_callback_on_step_end_reference_signature(self, pipe):
        """Reference-style callback_on_step_end (sd:1919-1928): called once
        per step with (pipe, i, t, {"latents"}), dict return overrides
        latents, and it forces per-step granularity without
        denoise_chunk_size."""
        calls = []

        def cb(p, i, t, kwargs):
            calls.append((i, int(t)))
            assert set(kwargs) == {"latents"}
            return {"latents": kwargs["latents"]}

        out = pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=STEPS,
            callback_on_step_end=cb,
        )
        assert [i for i, _ in calls] == list(range(STEPS))
        ts = [t for _, t in calls]
        assert ts == sorted(ts, reverse=True)  # descending schedule
        full = pipe.interpolate_single(
            0.5, prompt_start="a", prompt_end="b", num_inference_steps=STEPS)
        np.testing.assert_allclose(out.astype(int), full.astype(int), atol=1)

    def test_both_callbacks_rejected(self, pipe):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not both"):
            pipe.interpolate_single(
                0.5, prompt_start="a", prompt_end="b",
                num_inference_steps=STEPS,
                callback_on_chunk_end=lambda p, s, l: None,
                callback_on_step_end=lambda p, i, t, kw: None,
            )


def test_bf16_vae_decode_close_to_f32(pipe):
    """enable_bf16_vae_decode trades invisible mantissa for decode speed:
    uint8 output must stay within a few levels of the f32 decode."""
    import dataclasses

    lat = jnp.concatenate([pipe.generate_latent(0), pipe.generate_latent(1)])
    ref = pipe._decode(lat)
    p2 = dataclasses.replace(pipe)
    p2.enable_bf16_vae_decode()
    assert p2.vae.dtype == jnp.bfloat16
    assert pipe.vae.dtype != jnp.bfloat16  # original pipeline untouched
    out = p2._decode(lat)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 4


def test_call_num_images_per_prompt(pipe):
    """Reference __call__'s num_images_per_prompt (sd:1075): N independent
    samples per prompt, per-seed latents."""
    out = pipe("a cat", num_inference_steps=2, num_images_per_prompt=3, seed=7)
    assert out.shape == (3, 16, 16, 3)
    one = pipe("a cat", num_inference_steps=2, num_images_per_prompt=1, seed=7)
    np.testing.assert_array_equal(out[0], one[0])  # seed-aligned first sample
    assert np.any(out[1] != out[0])  # distinct latents -> distinct images


class TestVPredictionPNDM:
    def test_sd2x_style_vpred_denoise_end_to_end(self, pipe):
        """SD2.x-style scheduler config (PNDMScheduler +
        prediction_type='v_prediction' — what stabilityai/stable-diffusion-2
        family checkpoints ship and loader.py:214 dispatches to) through the
        full tiny-pipeline interpolate_single (VERDICT r4 next #1)."""
        import dataclasses

        from aid_tpu.schedulers.base import SchedulerConfig
        from aid_tpu.schedulers.pndm import PNDMScheduler

        kw = dict(prompt_start="a cat", prompt_end="a dog",
                  num_inference_steps=STEPS, seed=3)
        vpipe = dataclasses.replace(
            pipe,
            scheduler=PNDMScheduler(
                config=SchedulerConfig(prediction_type="v_prediction")))
        out1 = vpipe.interpolate_single(0.5, **kw)
        out2 = vpipe.interpolate_single(0.5, **kw)
        assert out1.shape == (3, 16, 16, 3) and out1.dtype == np.uint8
        np.testing.assert_array_equal(out1, out2)
        # the prediction type must be load-bearing (different trajectory
        # than epsilon under the same PNDM schedule)...
        epipe = dataclasses.replace(pipe, scheduler=PNDMScheduler())
        eps_out = epipe.interpolate_single(0.5, **kw)
        assert np.any(out1 != eps_out)
        # ...and the endpoint fixed-point property must survive v-pred
        b = vpipe.interpolate_single(0.8, **kw)
        np.testing.assert_array_equal(out1[0], b[0])
        np.testing.assert_array_equal(out1[2], b[2])


class TestStaticSmaxEndToEnd:
    def test_auto_equals_exact_through_kernel(self, pipe, monkeypatch):
        """End-to-end pin (VERDICT r3 next #1): a full tiny-pipeline denoise
        routed through the Pallas kernels (interpret mode) with the model
        path's static_smax='auto' default must produce the same images as
        static_smax=None (exact row maxes) — the static shift is the SAME
        softmax for in-window logits, and model logits are in-window."""
        import importlib

        attn_mod = importlib.import_module("aid_tpu.ops.attention")

        monkeypatch.setattr(attn_mod, "resolve_backend", lambda b="auto": "flash")
        monkeypatch.setattr(attn_mod, "FLASH_MIN_KV", 1)
        kw = dict(prompt_start="a cat", prompt_end="a dog",
                  num_inference_steps=2, seed=3)

        # FLASH_KERNEL_OVERRIDES is read at TRACE time only: without
        # clearing the jit caches, the second call would reuse the first
        # call's compiled program (and the first could reuse a prior
        # test's xla-path program), comparing a program with itself.
        # Count kernel traces to prove both runs actually re-traced it.
        from aid_tpu.ops import flash_attention as fa_mod

        traces = []
        real = fa_mod.flash_interpolated_attention

        def counting(*a, **k):
            traces.append(k.get("static_smax", "auto"))
            return real(*a, **k)

        monkeypatch.setattr(fa_mod, "flash_interpolated_attention", counting)

        jax.clear_caches()
        monkeypatch.setattr(attn_mod, "FLASH_KERNEL_OVERRIDES",
                            {"interpret": True})
        auto = pipe.interpolate_single(0.5, **kw)
        n_auto = len(traces)
        assert n_auto > 0 and all(s == "auto" for s in traces)

        jax.clear_caches()
        monkeypatch.setattr(attn_mod, "FLASH_KERNEL_OVERRIDES",
                            {"interpret": True, "static_smax": None})
        exact = pipe.interpolate_single(0.5, **kw)
        assert len(traces) > n_auto and all(s is None for s in traces[n_auto:])
        np.testing.assert_allclose(auto.astype(int), exact.astype(int), atol=1)
