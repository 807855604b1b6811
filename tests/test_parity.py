"""Parity-harness tests: reference latent/embedding import (PARITY.md).

Exercises the seed-compatibility layer with synthetic data: torch-layout
exports round-trip into the pipeline and drive interpolate_single
(reference randn_tensor latents, pipeline_interpolated_sd.py:904-913).
"""

import numpy as np
import pytest

from aid_tpu.utils.parity import image_stats, load_reference_embeds, load_reference_latents
from helpers import tiny_pipeline


class TestLatentImport:
    def test_npy_nchw_to_nhwc(self, tmp_path):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
        p = str(tmp_path / "lat.npy")
        np.save(p, x)
        out = load_reference_latents(p)
        assert out.shape == (1, 16, 16, 4)
        np.testing.assert_allclose(np.asarray(out), x.transpose(0, 2, 3, 1))

    def test_nhwc_passthrough_and_3d(self, tmp_path):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
        p = str(tmp_path / "lat.npy")
        np.save(p, x)
        np.testing.assert_allclose(np.asarray(load_reference_latents(p)), x)
        np.save(p, x[0, :, :, :].transpose(2, 0, 1))  # (4,16,16) CHW
        assert load_reference_latents(p).shape == (1, 16, 16, 4)

    def test_safetensors_and_torch_formats(self, tmp_path):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
        from safetensors.numpy import save_file

        sp = str(tmp_path / "lat.safetensors")
        save_file({"latents": x}, sp)
        assert load_reference_latents(sp).shape == (1, 8, 8, 4)

        import torch

        tp = str(tmp_path / "lat.pt")
        torch.save(torch.from_numpy(x), tp)
        assert load_reference_latents(tp).shape == (1, 8, 8, 4)

    def test_embeds_keep_layout(self, tmp_path):
        rng = np.random.default_rng(3)
        e = rng.normal(size=(1, 77, 32)).astype(np.float32)
        p = str(tmp_path / "emb.npy")
        np.save(p, e)
        np.testing.assert_allclose(np.asarray(load_reference_embeds(p)), e)


class TestParityRun:
    def test_imported_latents_drive_interpolate_single(self, tmp_path):
        """The full seed-compat path: torch-layout exports -> NHWC ->
        interpolate_single(latent_start=..., latent_end=...); fixed imports
        must reproduce bit-identical outputs across calls."""
        pipe = tiny_pipeline()
        rng = np.random.default_rng(4)
        s = pipe.unet.config.sample_size
        a = rng.normal(size=(1, 4, s, s)).astype(np.float32)
        b = rng.normal(size=(1, 4, s, s)).astype(np.float32)
        pa, pb = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
        np.save(pa, a)
        np.save(pb, b)

        kw = dict(prompt_start="a cat", prompt_end="a dog", num_inference_steps=2)
        la, lb = load_reference_latents(pa), load_reference_latents(pb)
        out1 = pipe.interpolate_single(0.5, latent_start=la, latent_end=lb, **kw)
        out2 = pipe.interpolate_single(
            0.5, latent_start=load_reference_latents(pa),
            latent_end=load_reference_latents(pb), **kw)
        np.testing.assert_array_equal(out1, out2)
        # different imports must change the output (inputs actually used)
        out3 = pipe.interpolate_single(0.5, latent_start=lb, latent_end=la, **kw)
        assert np.any(out1 != out3)

    def test_imported_embeds_bypass_text_encoder(self, tmp_path):
        """Reference-exported TEXT EMBEDDINGS drive interpolate_single
        directly (VERDICT r2 item #10): feeding the pipeline's own encoded
        embeds through the .npy import path must exactly reproduce the
        prompt path — proving the embeds route skips tokenizer/CLIP while
        hitting the identical downstream program."""
        pipe = tiny_pipeline()
        kw = dict(num_inference_steps=2, seed=5)
        want = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            negative_prompt="blurry", **kw)

        emb_s, un = pipe.encode_prompt("a cat", "blurry")
        emb_e, _ = pipe.encode_prompt("a dog", "blurry")
        paths = {}
        for name, arr in [("s", emb_s), ("e", emb_e), ("n", un)]:
            p = str(tmp_path / f"{name}.npy")
            np.save(p, np.asarray(arr))
            paths[name] = p
        got = pipe.interpolate_single(
            0.5,
            prompt_embeds_start=load_reference_embeds(paths["s"]),
            prompt_embeds_end=load_reference_embeds(paths["e"]),
            negative_prompt_embeds=load_reference_embeds(paths["n"]),
            **kw)
        np.testing.assert_array_equal(got, want)

        # PAID guide embeds route
        emb_g, _ = pipe.encode_prompt("an animal", "blurry")
        want_g = pipe.interpolate_single(
            0.5, prompt_start="a cat", prompt_end="a dog",
            guide_prompt="an animal", negative_prompt="blurry", **kw)
        got_g = pipe.interpolate_single(
            0.5, prompt_embeds_start=emb_s, prompt_embeds_end=emb_e,
            negative_prompt_embeds=un, guide_prompt_embeds=emb_g, **kw)
        np.testing.assert_array_equal(got_g, want_g)

    def test_image_stats_shape(self):
        imgs = np.zeros((3, 16, 16, 3), np.uint8)
        st = image_stats(imgs)
        assert st["shape"] == [3, 16, 16, 3]
        assert len(st["frame_means"]) == 3
        assert np.asarray(st["corner_patches"]).shape == (3, 8, 8)
