"""SDXL interpolation pipeline (dual text encoders, micro-conditioning).

Parity target: InterpolationStableDiffusionXLPipeline
(reference pipeline_interpolated_sdxl.py:291-2411):
  * dual text encoders; embeds = concat(enc1 penultimate, enc2 penultimate),
    pooled from encoder 2 (encode_prompt, sdxl:644-870)
  * pooled prompt embeds interpolated per frame (sdxl:2020-2040)
  * add_time_ids = (orig_h, orig_w, crop_top, crop_left, target_h, target_w)
    repeated per frame (sdxl:992-1014, :2132-2133)
  * fp32 VAE decode (upcast, sdxl:2347-2385) with optional playground
    latents mean/std denorm — handled by engine.decode_latents
  * frame-by-frame decode to cap VAE memory (sdxl:2387-2390)
  * guidance default 5.0 (sdxl:1713)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from aid_tpu.ops.interp import (
    generate_beta_schedule,
    linear_interpolation,
    slerp,
    spherical_interpolation,
)
from aid_tpu.pipelines.interpolation import InterpolationPipeline


@dataclasses.dataclass
class InterpolationXLPipeline(InterpolationPipeline):
    """text_encoder/tokenizer: OpenCLIP-bigG surrogate pair 2 is
    ``text_encoder_2``/``tokenizer_2``; ``text_encoder`` is CLIP-L."""

    text_encoder_2: Any = None
    text_params_2: Any = None
    tokenizer_2: Any = None
    guidance_scale: float = 5.0
    default_size: int = 1024
    # Invisible watermark applied to every decoded frame when set (reference
    # sdxl:2398-2401 / add_watermarker flag; None = off, like the reference
    # with invisible-watermark unavailable). Use
    # aid_tpu.utils.watermark.InvisibleWatermark().
    watermarker: Any = None

    def _decode(self, latents, per_frame: bool = False):
        images = super()._decode(latents, per_frame=per_frame)
        if self.watermarker is not None:
            images = self.watermarker.apply(images)
        return images

    def _effective_steps(self, num_inference_steps: int, denoising_end: Optional[float]) -> int:
        """denoising_end support (reference sdxl:2204-2220): stop the loop at
        the discrete timestep cutoff for mixture-of-denoisers setups."""
        if denoising_end is None:
            return num_inference_steps
        if not (0.0 < denoising_end < 1.0):
            raise ValueError(
                f"denoising_end must be in (0, 1), got {denoising_end}")
        T = self.scheduler.config.num_train_timesteps if hasattr(self.scheduler, "config") else 1000
        cutoff = round(T - denoising_end * T)
        state = self.scheduler.init(num_inference_steps)
        return int(np.sum(np.asarray(state.timesteps) >= cutoff))

    def encode_prompt(self, prompt: str, negative_prompt: str = "", clip_skip: int = 0):
        """Returns (emb, neg, pooled, neg_pooled): (1,S,2048) cond/uncond
        embeds plus the pooled conditioning from encoder 2 for both
        (reference encode_prompt, sdxl:644-870). ``clip_skip`` selects
        hidden_states[-(clip_skip + 2)] from BOTH encoders (sdxl:582-586);
        the default 0 is SDXL's standard penultimate layer."""
        def enc(text):
            ids1 = jnp.asarray(self.tokenizer(text))
            ids2 = jnp.asarray(self.tokenizer_2(text))
            h1, _, hs1 = self.text_encoder.apply(self.text_params, ids1)
            h2, pooled2, hs2 = self.text_encoder_2.apply(self.text_params_2, ids2)
            layer = -(clip_skip + 2)
            emb = jnp.concatenate([hs1[layer], hs2[layer]], axis=-1)
            return emb, pooled2

        emb, pooled = enc(prompt)
        neg, neg_pooled = enc(negative_prompt)
        return emb, neg, pooled, neg_pooled

    def _time_ids(
        self,
        batch: int,
        height: int,
        width: int,
        original_size: Optional[tuple] = None,
        crops_coords_top_left: tuple = (0, 0),
        target_size: Optional[tuple] = None,
    ) -> jnp.ndarray:
        """SDXL micro-conditioning time_ids = original_size +
        crops_coords_top_left + target_size (reference _get_add_time_ids,
        sdxl:992-1014); sizes default to the output resolution
        (sdxl:1474-1476)."""
        original_size = tuple(original_size or (height, width))
        target_size = tuple(target_size or (height, width))
        ids = jnp.array([*original_size, *crops_coords_top_left, *target_size],
                        jnp.float32)
        return jnp.broadcast_to(ids[None], (batch, 6))

    def _time_ids_pair(
        self,
        batch: int,
        height: int,
        width: int,
        original_size=None,
        crops_coords_top_left=(0, 0),
        target_size=None,
        negative_original_size=None,
        negative_crops_coords_top_left=(0, 0),
        negative_target_size=None,
    ) -> tuple:
        """(cond time_ids, uncond time_ids). The negative micro-conditioning
        family changes ONLY the uncond pass's time_ids (reference sdxl:1004-
        1014: add_neg_time_ids built when negative_original_size and
        negative_target_size are supplied, else the positive ids are
        reused — sdxl:1733)."""
        time_ids = self._time_ids(batch, height, width, original_size,
                                  crops_coords_top_left, target_size)
        # Reference semantics (sdxl:1474, :2121): neg ids are built ONLY
        # when negative_original_size AND negative_target_size are both
        # supplied; otherwise the positive ids are reused — a lone negative
        # size or crop is ignored, not mixed with positive defaults.
        if negative_original_size is None or negative_target_size is None:
            return time_ids, time_ids
        neg_ids = self._time_ids(
            batch, height, width,
            negative_original_size,
            negative_crops_coords_top_left,
            negative_target_size)
        return time_ids, neg_ids

    def _cond_kwargs(self, prompt: str, negative_prompt: str, batch: int,
                     latent_hw) -> tuple:
        """SDXL micro-conditioning for the inherited vanilla entry points
        (__call__, denoising_interpolate): pooled embeds + time_ids built
        from the latent spatial size."""
        emb, uncond, pooled, neg_pooled = self.encode_prompt(prompt, negative_prompt)
        if batch > 1:
            emb = jnp.repeat(emb, batch, axis=0)
            uncond = jnp.repeat(uncond, batch, axis=0)
            pooled = jnp.repeat(pooled, batch, axis=0)
            neg_pooled = jnp.repeat(neg_pooled, batch, axis=0)
        f = 2 ** (len(self.vae.config.block_out_channels) - 1)
        time_ids = self._time_ids(batch, latent_hw[0] * f, latent_hw[1] * f)
        return emb, uncond, {
            "added_cond": {"text_embeds": pooled, "time_ids": time_ids},
            "added_cond_uncond": {"text_embeds": neg_pooled, "time_ids": time_ids},
        }

    def interpolate(
        self,
        latent_start: jnp.ndarray,
        latent_end: jnp.ndarray,
        prompt_start: str,
        prompt_end: str,
        guide_prompt: Optional[str] = None,
        negative_prompt: str = "",
        size: int = 7,
        num_inference_steps: int = 28,
        warmup_ratio: float = 0.5,
        early: str = "fused_outer",
        late: str = "self",
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        guidance_scale: Optional[float] = None,
        ts=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        denoising_end: Optional[float] = None,
        original_size: Optional[tuple] = None,
        crops_coords_top_left: tuple = (0, 0),
        target_size: Optional[tuple] = None,
        negative_original_size: Optional[tuple] = None,
        negative_crops_coords_top_left: tuple = (0, 0),
        negative_target_size: Optional[tuple] = None,
        output_type: str = "np",
        callback_on_chunk_end=None,
        callback_on_step_end=None,
    ):
        if alpha is None:
            alpha = float(num_inference_steps)
        if beta is None:
            beta = float(num_inference_steps)
        height = height or self.default_size
        width = width or self.default_size

        if ts is not None:
            # explicit per-frame coefficient points (see base interpolate):
            # latents slerp, embeds/pooled lerp AND the attention coef all
            # use these points — the batched engine behind
            # interpolate_save_gpu / the prior loops
            import numpy as _np
            ts = _np.asarray(ts, _np.float32)
            assert ts.ndim == 1 and ts[0] == 0.0 and ts[-1] == 1.0, (
                "ts must be a 1-D schedule with endpoints 0 and 1")
            size = int(ts.shape[0])
        latents = spherical_interpolation(latent_start, latent_end, size, ts=ts)
        emb_s, un_s, pooled_s, neg_pooled_s = self.encode_prompt(prompt_start, negative_prompt)
        emb_e, un_e, pooled_e, neg_pooled_e = self.encode_prompt(prompt_end, negative_prompt)

        if guide_prompt is not None:
            emb_g, un_g, pooled_g, neg_pooled_g = self.encode_prompt(guide_prompt, negative_prompt)
            embs = jnp.concatenate([emb_s] + [emb_g] * (size - 2) + [emb_e], axis=0)
            uncond = jnp.concatenate([un_s] + [un_g] * (size - 2) + [un_e], axis=0)
            pooled = jnp.concatenate([pooled_s] + [pooled_g] * (size - 2) + [pooled_e], axis=0)
            neg_pooled = jnp.concatenate(
                [neg_pooled_s] + [neg_pooled_g] * (size - 2) + [neg_pooled_e], axis=0)
        else:
            embs = linear_interpolation(emb_s, emb_e, size=size, ts=ts)
            uncond = linear_interpolation(un_s, un_e, size=size, ts=ts)
            pooled = linear_interpolation(pooled_s, pooled_e, size=size, ts=ts)
            neg_pooled = linear_interpolation(neg_pooled_s, neg_pooled_e, size=size, ts=ts)

        coef = jnp.asarray(ts) if ts is not None else jnp.asarray(
            generate_beta_schedule(size, alpha, beta, force_endpoints=True))
        time_ids, neg_time_ids = self._time_ids_pair(
            size, height, width, original_size, crops_coords_top_left,
            target_size, negative_original_size,
            negative_crops_coords_top_left, negative_target_size)
        added = {"text_embeds": pooled, "time_ids": time_ids}
        # uncond pass takes the negative pooled embeds (reference sdxl:2275-2293)
        added_uncond = {"text_embeds": neg_pooled, "time_ids": neg_time_ids}
        return self._run_sequence(
            latents, embs, uncond, coef, num_inference_steps, warmup_ratio,
            early, late, guidance_scale, added_cond=added,
            added_cond_uncond=added_uncond,
            output_type="latent" if denoising_end is not None else output_type,
            per_frame_decode=True,
            num_run_steps=self._effective_steps(num_inference_steps, denoising_end),
            callback_on_chunk_end=callback_on_chunk_end,
            callback_on_step_end=callback_on_step_end,
        )

    def interpolate_single(
        self,
        it: float,
        latent_start: Optional[jnp.ndarray] = None,
        latent_end: Optional[jnp.ndarray] = None,
        prompt_start: str = "",
        prompt_end: str = "",
        guide_prompt: Optional[str] = None,
        negative_prompt: str = "",
        num_inference_steps: int = 28,
        warmup_ratio: float = 0.5,
        early: str = "fused_outer",
        late: str = "self",
        init: str = "linear",
        guidance_scale: Optional[float] = None,
        guidance_rescale: float = 0.0,
        image_embeds_start: Optional[jnp.ndarray] = None,
        image_embeds_end: Optional[jnp.ndarray] = None,
        negative_image_embeds: Optional[jnp.ndarray] = None,
        prompt_embeds_start: Optional[jnp.ndarray] = None,
        prompt_embeds_end: Optional[jnp.ndarray] = None,
        pooled_prompt_embeds_start: Optional[jnp.ndarray] = None,
        pooled_prompt_embeds_end: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_pooled_prompt_embeds: Optional[jnp.ndarray] = None,
        guide_prompt_embeds: Optional[jnp.ndarray] = None,
        guide_pooled_prompt_embeds: Optional[jnp.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        denoising_end: Optional[float] = None,
        original_size: Optional[tuple] = None,
        crops_coords_top_left: tuple = (0, 0),
        target_size: Optional[tuple] = None,
        negative_original_size: Optional[tuple] = None,
        negative_crops_coords_top_left: tuple = (0, 0),
        negative_target_size: Optional[tuple] = None,
        seed: int = 0,
        output_type: str = "np",
        callback_on_chunk_end=None,
        callback_on_step_end=None,
    ):
        """SDXL 3-frame interpolation (reference interpolate_single,
        sdxl:1693-2411).

        ``prompt_embeds_start/end`` + ``pooled_prompt_embeds_start/end`` +
        ``negative_prompt_embeds`` + ``negative_pooled_prompt_embeds`` (each
        (1, S, 2048) / (1, 1280)) bypass both tokenizers/text-encoders — the
        SDXL prompt-embeds escape hatch (reference sdxl:449-452, 1191-1192),
        used by the parity harness to feed reference-exported embeddings
        (PARITY.md; examples/parity_run.py --sdxl).

        ``original_size``/``crops_coords_top_left``/``target_size`` and the
        ``negative_*`` family are the SDXL micro-conditioning kwargs
        (reference sdxl:992-1014, 1474-1476, 1733); negatives affect only
        the uncond pass's time_ids.
        """
        assert 0.0 < it < 1.0, "t must be between 0 and 1"
        height = height or self.default_size
        width = width or self.default_size
        if latent_start is None:
            latent_start = self.generate_latent(seed)
        if latent_end is None:
            latent_end = self.generate_latent(seed + 1)

        latent_t = slerp(latent_start, latent_end, it)
        latents = jnp.concatenate([latent_start, latent_t, latent_end], axis=0)

        if prompt_embeds_start is not None:
            needed = (prompt_embeds_end, pooled_prompt_embeds_start,
                      pooled_prompt_embeds_end, negative_prompt_embeds,
                      negative_pooled_prompt_embeds)
            assert all(x is not None for x in needed), (
                "prompt_embeds_start requires prompt_embeds_end, "
                "pooled_prompt_embeds_start/end, negative_prompt_embeds and "
                "negative_pooled_prompt_embeds")
            emb_s = jnp.asarray(prompt_embeds_start)
            emb_e = jnp.asarray(prompt_embeds_end)
            pooled_s = jnp.asarray(pooled_prompt_embeds_start)
            pooled_e = jnp.asarray(pooled_prompt_embeds_end)
            un_s = un_e = jnp.asarray(negative_prompt_embeds)
            neg_pooled_s = neg_pooled_e = jnp.asarray(negative_pooled_prompt_embeds)
            emb_g = (jnp.asarray(guide_prompt_embeds)
                     if guide_prompt_embeds is not None else None)
            pooled_g = (jnp.asarray(guide_pooled_prompt_embeds)
                        if guide_pooled_prompt_embeds is not None else None)
        else:
            emb_s, un_s, pooled_s, neg_pooled_s = self.encode_prompt(prompt_start, negative_prompt)
            emb_e, un_e, pooled_e, neg_pooled_e = self.encode_prompt(prompt_end, negative_prompt)
            emb_g = pooled_g = None
            if guide_prompt_embeds is not None:
                emb_g = jnp.asarray(guide_prompt_embeds)
                if guide_pooled_prompt_embeds is not None:
                    pooled_g = jnp.asarray(guide_pooled_prompt_embeds)
            elif guide_prompt is not None:
                emb_g, _, pooled_g, _ = self.encode_prompt(guide_prompt, negative_prompt)
        if emb_g is not None:
            emb_t = emb_g
            # guide pooled falls back to the interpolated pooled embeds when
            # not supplied (pooled conditioning is global style, not content)
            pooled_t = (pooled_g if pooled_g is not None
                        else self._interp_pair(pooled_s, pooled_e, it, init))
        else:
            emb_t = self._interp_pair(emb_s, emb_e, it, init)
            pooled_t = self._interp_pair(pooled_s, pooled_e, it, init)
        un_t = self._interp_pair(un_s, un_e, it, init)
        neg_pooled_t = self._interp_pair(neg_pooled_s, neg_pooled_e, it, init)

        embs = jnp.concatenate([emb_s, emb_t, emb_e], axis=0)
        uncond = jnp.concatenate([un_s, un_t, un_e], axis=0)
        pooled = jnp.concatenate([pooled_s, pooled_t, pooled_e], axis=0)
        neg_pooled = jnp.concatenate([neg_pooled_s, neg_pooled_t, neg_pooled_e], axis=0)

        ip_cond = ip_uncond = None
        if image_embeds_end is not None:
            if negative_image_embeds is None:
                negative_image_embeds = jnp.zeros_like(image_embeds_end)
            if image_embeds_start is None:
                image_embeds_start = negative_image_embeds
            ip_t = self._interp_pair(image_embeds_start, image_embeds_end, it, init)
            ip_cond = jnp.concatenate([image_embeds_start, ip_t, image_embeds_end], axis=0)
            ip_uncond = jnp.concatenate([negative_image_embeds] * 3, axis=0)

        coef = jnp.array([0.0, it, 1.0], jnp.float32)
        time_ids, neg_time_ids = self._time_ids_pair(
            3, height, width, original_size, crops_coords_top_left,
            target_size, negative_original_size,
            negative_crops_coords_top_left, negative_target_size)
        added = {"text_embeds": pooled, "time_ids": time_ids}
        added_uncond = {"text_embeds": neg_pooled, "time_ids": neg_time_ids}
        return self._run_sequence(
            latents, embs, uncond, coef, num_inference_steps, warmup_ratio,
            early, late, guidance_scale, guidance_rescale,
            ip_image_embeds=ip_cond, ip_uncond_image_embeds=ip_uncond,
            added_cond=added,
            added_cond_uncond=added_uncond,
            output_type="latent" if denoising_end is not None else output_type,
            per_frame_decode=True,
            num_run_steps=self._effective_steps(num_inference_steps, denoising_end),
            callback_on_chunk_end=callback_on_chunk_end,
            callback_on_step_end=callback_on_step_end,
        )
