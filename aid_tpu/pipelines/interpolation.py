"""Interpolation pipelines: the reference's public API, TPU-native.

API parity targets:
  * gradio_src/pipeline_interpolated_stable_diffusion.py:163-304
    ``interpolate``        — full-sequence batched generation (PRIMARY here:
                             all N frames + warmup split in one program)
  * :306-392  ``interpolate_save_gpu``  — frame-at-a-time stitching
  * :394-521  ``interpolate_single``    — 3-frame [A, interp, B]
  * :523-583  ``denoising_interpolate`` — embedding-switch baseline
  * :92-119   ``generate_latent``, :121-160 ``prompt_to_embedding``
  * pipeline_interpolated_sd.py:950-1020 ``load_aid`` / ``load_aid_ip_adapter``
    / ``activate_aid`` / ``deactivate_aid`` (state -> explicit arguments)
  * pipeline_interpolated_sd.py:1407-1963 ``interpolate_single`` kwargs
    (guide_prompt PAID, warmup_ratio, init linear/slerp, IP image embeds)

Layout: latents and images are NHWC on device (TPU conv layout). The
float32 CFG/scheduler math happens inside the jitted engine; the UNet
compute dtype is configurable (bf16 recommended on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.models.layers import AidMode
from aid_tpu.ops.interp import (
    generate_beta_schedule,
    lerp,
    linear_interpolation,
    slerp,
    spherical_interpolation,
)
from aid_tpu.pipelines import engine
from aid_tpu.schedulers.ddim import DDIMScheduler


@dataclasses.dataclass
class InterpolationPipeline:
    """SD 1.x / 2.x attention-interpolation pipeline.

    Parameters are explicit pytrees; modules are flax modules. ``tokenizer``
    is any callable ``prompt -> (1, max_len) int32 ids``.
    """

    unet: Any
    unet_params: Any
    vae: Any
    vae_params: Any
    text_encoder: Any
    text_params: Any
    tokenizer: Any
    scheduler: Any = dataclasses.field(default_factory=DDIMScheduler)
    vae_scale_factor: int = 8
    guidance_scale: float = 7.5
    # Default AID config (reference load_aid defaults: t=0.5, fused outer,
    # pipeline_interpolated_sd.py:950-951).
    default_early: str = "fused_outer"
    default_late: str = "self"
    # Safety checker (reference runs it on every SD decode, sd:1939-1941;
    # None = skip, matching the reference's safety_checker=None path).
    safety_checker: Any = None
    safety_params: Any = None
    # IP-Adapter attachments (None until load_aid_ip_adapter equivalent).
    ip_proj: Any = None
    ip_proj_params: Any = None
    ip_scale: float = 1.0
    scale_control: bool = False
    # "sequential" = reference's two UNet passes per step; "batched" = one
    # 2N-batch pass (mathematically identical; see engine.denoise_sequence).
    cfg_mode: str = "sequential"
    # Cooperative cancel (reference ``self._interrupt`` checked every denoise
    # step, pipeline_interpolated_sd.py:1216, 1835-1836). When
    # ``denoise_chunk_size`` is set, generation runs as ceil(steps/chunk)
    # jitted ``engine.denoise_steps`` segments and ``interrupt()`` is honored
    # between chunks (remaining steps skipped, current latents decoded —
    # matching the reference's skip-to-decode behavior on interrupt).
    denoise_chunk_size: Optional[int] = None
    _interrupt: bool = dataclasses.field(default=False, repr=False)
    # Spatial VAE tiling for >1024px decodes (reference enable_vae_tiling,
    # StableDiffusionMixin sd:175-181). None = off; set to the latent tile
    # edge (64 = 512px tiles) via enable_vae_tiling().
    vae_tile_latent_size: Optional[int] = None

    # ------------------------------------------------------------------
    # plumbing
    # ------------------------------------------------------------------
    def interrupt(self) -> None:
        """Request cooperative cancel of the in-flight generation (reference
        ``self._interrupt``, sd:1216). Takes effect at the next chunk
        boundary when ``denoise_chunk_size`` is set; callable from another
        thread (e.g. a UI cancel button) while ``interpolate()`` blocks."""
        self._interrupt = True

    @property
    def has_ip(self) -> bool:
        return self.ip_proj is not None

    @property
    def latent_channels(self) -> int:
        return self.unet.config.in_channels

    def _latent_hw(self, height: Optional[int], width: Optional[int]):
        size = self.unet.config.sample_size
        h = (height // self.vae_scale_factor) if height else size
        w = (width // self.vae_scale_factor) if width else size
        return h, w

    def generate_latent(self, seed: int = 0, height: Optional[int] = None, width: Optional[int] = None) -> jnp.ndarray:
        """Random (1, h, w, C) latent (reference generate_latent, gradio :92-119)."""
        h, w = self._latent_hw(height, width)
        return jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, self.latent_channels), jnp.float32)

    def encode_prompt(self, prompt: str, negative_prompt: str = "", clip_skip: int = 0):
        """Prompt -> (cond, uncond) embeddings, each (1, S, D).

        Reference prompt_to_embedding (gradio :121-160) / encode_prompt
        (pipeline_interpolated_sd.py:472-660).
        """
        ids = jnp.asarray(self.tokenizer(prompt))
        neg_ids = jnp.asarray(self.tokenizer(negative_prompt))
        emb, _, _ = self.text_encoder.apply(self.text_params, ids, clip_skip=clip_skip)
        neg, _, _ = self.text_encoder.apply(self.text_params, neg_ids, clip_skip=clip_skip)
        return emb, neg

    def _interp_pair(self, a, b, t, init: str):
        return lerp(a, b, t) if init == "linear" else slerp(a, b, t)

    def enable_vae_tiling(self, tile_latent_size: int = 64):
        """Decode in overlapping spatial tiles so large (>1024px) outputs
        fit in HBM (reference enable_vae_tiling, sd:175-181)."""
        self.vae_tile_latent_size = tile_latent_size
        return self

    def disable_vae_tiling(self):
        self.vae_tile_latent_size = None
        return self

    def enable_bf16_vae_decode(self):
        """Decode in bfloat16 (TPU-native option). The reference force-
        upcasts the VAE to fp32 because fp16's 5-bit exponent overflows in
        the decoder (diffusers ``force_upcast``; sdxl:2359-2369 upcast path);
        bfloat16 shares float32's exponent range so the overflow rationale
        does not apply on TPU — this trades mantissa bits that are invisible
        at uint8 output for ~8% faster decode (tools/opt3_results.jsonl
        r3vae_decode_f32 704 ms vs bf16 646 ms, 7-frame 1024px). The default
        stays float32 for numerical parity with the reference."""
        self.vae = self.vae.clone(dtype=jnp.bfloat16)
        return self

    def _decode(self, latents: jnp.ndarray, per_frame: bool = False) -> np.ndarray:
        cfg = self.vae.config
        images = engine.decode_latents(
            self.vae, self.vae_params, latents, cfg.scaling_factor,
            latents_mean=cfg.latents_mean, latents_std=cfg.latents_std,
            per_frame=per_frame, tile_latent_size=self.vae_tile_latent_size,
        )
        images = engine.to_uint8(images)
        if self.safety_checker is not None:
            images, _ = self.run_safety(images)
        return images

    def run_safety(self, images: np.ndarray):
        """Apply the safety checker: returns (images-with-flagged-frames-
        blacked-out, has_nsfw flags). The reference runs this on every SD
        decode and returns the flags in its pipeline output (sd:1939-1963);
        here the blackout is applied inline by _decode and callers needing
        the flags call this explicitly."""
        from aid_tpu.models.safety import run_safety_checker

        return run_safety_checker(images, self.safety_checker, self.safety_params)

    def _project_ip(self, image_embeds: Optional[jnp.ndarray]):
        """CLIP image embeds (B, D) -> IP tokens (B, T, cross_dim)."""
        if image_embeds is None:
            return None
        return self.ip_proj.apply(self.ip_proj_params, image_embeds)

    def _aid_modes(self, early: str, late: str):
        early_mode = AidMode.from_name(early, has_ip=self.has_ip)
        late_mode = AidMode.from_name(late, has_ip=self.has_ip)
        if self.scale_control:
            early_mode = AidMode.from_name("scale_control")
            late_mode = AidMode.vanilla(scale_control=True)
        return early_mode, late_mode

    # ------------------------------------------------------------------
    # AID / IP-Adapter configuration (reference load_aid /
    # load_aid_ip_adapter / activate_aid / deactivate_aid,
    # pipeline_interpolated_sd.py:950-1020 — explicit state, no
    # monkey-patching: these set defaults consumed per call)
    # ------------------------------------------------------------------
    def load_aid(self, is_fused: bool = True, atype: str = "outer"):
        """Set the default early interpolation mode (reference load_aid)."""
        prefix = "fused" if is_fused else "pure"
        self.default_early = f"{prefix}_{atype}"
        return self

    def load_aid_ip_adapter(
        self,
        checkpoint,
        image_encoder=None,
        image_encoder_params=None,
        scale: float = 1.0,
        early: str = "fused_outer",
    ):
        """Attach IP-Adapter weights (reference load_aid_ip_adapter).

        ``checkpoint``: a torch-format IP-Adapter state dict (keys
        image_proj / ip_adapter) or a path to its .safetensors/.bin.
        Merges the per-layer to_k_ip/to_v_ip kernels into the UNet params
        (the UNet config must have ip_num_tokens > 0) and attaches the
        image projection. Plus variants (resampler image_proj, detected by
        the 'latents' key) project the CLIP vision PENULTIMATE hidden
        states — encode_image switches automatically. ``early=
        'scale_control'`` selects the ScaleControl behavior.
        """
        import numpy as np

        from aid_tpu.models.ip_adapter import ImageProjection, Resampler
        from aid_tpu.models.params import (
            convert_ip_adapter_state_dict,
            load_safetensors,
            merge_params,
            unet_attention_order,
        )

        if isinstance(checkpoint, str):
            flat = load_safetensors(checkpoint)
            checkpoint = {"image_proj": {}, "ip_adapter": {}}
            for k, v in flat.items():
                group, rest = k.split(".", 1)
                checkpoint[group][rest] = v
        order = unet_attention_order(self.unet.config)
        ip_tree, proj_params = convert_ip_adapter_state_dict(checkpoint, order)
        self.unet_params = merge_params(self.unet_params, ip_tree)
        if "latents" in checkpoint["image_proj"]:  # plus variant
            lat = np.asarray(checkpoint["image_proj"]["latents"])
            hidden_dim, nq = lat.shape[2], lat.shape[1]
            assert nq == self.unet.config.ip_num_tokens, (
                f"plus checkpoint has {nq} queries, UNet config expects "
                f"{self.unet.config.ip_num_tokens} ip tokens")
            depth = 1 + max(int(k.split(".")[1]) for k in checkpoint["image_proj"]
                            if k.startswith("layers."))
            self.ip_proj = Resampler(
                cross_attention_dim=self.unet.config.cross_attention_dim,
                embed_dim=np.asarray(checkpoint["image_proj"]["proj_in.weight"]).shape[1],
                hidden_dim=hidden_dim, depth=depth,
                heads=max(1, hidden_dim // 64),  # h94 plus: 768->12, 1280->20
                num_queries=nq,
            )
            self.ip_plus = True
        else:
            self.ip_proj = ImageProjection(
                cross_attention_dim=self.unet.config.cross_attention_dim,
                num_tokens=self.unet.config.ip_num_tokens,
            )
            self.ip_plus = False
        self.ip_proj_params = proj_params
        self.ip_scale = scale
        self.scale_control = early == "scale_control"
        self.default_early = early if early != "scale_control" else "fused_outer"
        self.image_encoder = image_encoder
        self.image_encoder_params = image_encoder_params
        return self

    def load_textual_inversion(self, checkpoint, token: Optional[str] = None):
        """Load a textual-inversion embedding into the text encoder
        (reference TextualInversionLoaderMixin surface)."""
        from aid_tpu.models.clip import CLIPTextModel
        from aid_tpu.models.params import load_textual_inversion

        self.text_params, n_added = load_textual_inversion(
            self.text_params, self.tokenizer, checkpoint, token)
        cfg = dataclasses.replace(
            self.text_encoder.config,
            vocab_size=self.text_encoder.config.vocab_size + n_added)
        self.text_encoder = CLIPTextModel(cfg, dtype=self.text_encoder.dtype)
        return self

    def encode_image(self, images) -> jnp.ndarray:
        """Images (N,H,W,3) -> CLIP image embeds via the attached encoder
        (reference encode_image, sd:661-692). Standard adapters take the
        projected pooled embeds (N, D); plus adapters take the PENULTIMATE
        hidden states (N, S, D) — selected by the loaded adapter type
        (reference passes output_hidden_states for plus, sd:676-690)."""
        assert getattr(self, "image_encoder", None) is not None, "no image encoder attached"
        from aid_tpu.prior.clip_scorer import preprocess

        px = preprocess(jnp.asarray(images), self.image_encoder.config.image_size)
        embeds, penultimate = self.image_encoder.apply(self.image_encoder_params, px)
        return penultimate if getattr(self, "ip_plus", False) else embeds

    # ------------------------------------------------------------------
    # core generation
    # ------------------------------------------------------------------
    def _run_sequence(
        self,
        latents: jnp.ndarray,  # (B, h, w, C)
        embs: jnp.ndarray,
        uncond_embs: jnp.ndarray,
        coef: jnp.ndarray,
        num_inference_steps: int,
        warmup_ratio: float,
        early: str,
        late: str,
        guidance_scale: Optional[float],
        guidance_rescale: float = 0.0,
        ip_image_embeds: Optional[jnp.ndarray] = None,
        ip_uncond_image_embeds: Optional[jnp.ndarray] = None,
        added_cond: Optional[dict] = None,
        added_cond_uncond: Optional[dict] = None,
        output_type: str = "np",
        per_frame_decode: bool = False,
        num_run_steps: Optional[int] = None,  # denoising_end truncation
        callback_on_chunk_end=None,  # fn(pipe, step_index, latents) -> latents|None
        callback_on_step_end=None,  # reference-style fn(pipe, i, t, kwargs)->dict
    ):
        if guidance_scale is None:
            guidance_scale = self.guidance_scale
        sched_state = self.scheduler.init(num_inference_steps, latent_shape=latents.shape)
        latents = latents * sched_state.init_noise_sigma
        if num_run_steps is None:
            # loop over the scheduler's ACTUAL timestep array: equal to
            # num_inference_steps for every scheduler except PNDM, whose
            # skip-PRK corrector adds one evaluation (timesteps has n+1
            # entries — diffusers pipelines likewise iterate
            # scheduler.timesteps, reference sd:1832)
            num_run_steps = int(sched_state.timesteps.shape[0])
        self._interrupt = False
        # Early mode runs for steps i < warmup_steps, 0-based — matching the
        # root pipelines (pipeline_interpolated_sd.py:1845 `i < warmup_step`
        # with i starting at 0). NOTE the gradio pipelines increment i BEFORE
        # the check (gradio_src/pipeline_interpolated_stable_diffusion.py:
        # 271-282), so they run early for warmup_step-1 steps; we deliberately
        # keep the root-pipeline convention for every entry point (one extra
        # early-mode step vs the gradio-anchored interpolate()).
        warmup_steps = min(int(num_inference_steps * warmup_ratio), num_run_steps)
        early_mode, late_mode = self._aid_modes(early, late)

        common = dict(
            early=early_mode,
            late=late_mode,
            warmup_steps=warmup_steps,
            guidance_rescale=guidance_rescale,
            ip_embeds=self._project_ip(ip_image_embeds),
            ip_uncond_embeds=self._project_ip(ip_uncond_image_embeds),
            ip_scale=self.ip_scale,
            added_cond=added_cond,
            added_cond_uncond=added_cond_uncond,
            cfg_mode=self.cfg_mode,
        )
        args = (self.unet, self.scheduler, self.unet_params)
        chunk = self.denoise_chunk_size
        if callback_on_step_end is not None:
            # Reference-signature adapter (pipeline_interpolated_sd.py:
            # 1919-1928): ``fn(pipe, i, t, {"latents": ...}) -> dict`` at
            # per-step granularity — forces chunk size 1 so every step is a
            # chunk boundary. Tensor inputs beyond latents are not carried
            # (the jitted loop keeps embeddings on-device between steps).
            if callback_on_chunk_end is not None:
                raise ValueError(
                    "pass callback_on_step_end or callback_on_chunk_end, not both")
            timesteps = sched_state.timesteps

            def callback_on_chunk_end(pipe, step_end, latents,
                                      _cb=callback_on_step_end):
                out = _cb(pipe, step_end - 1, timesteps[step_end - 1],
                          {"latents": latents})
                return None if out is None else out.get("latents")

            chunk = 1
        if chunk is None and callback_on_chunk_end is None:
            final = engine.denoise_sequence(
                *args, latents, embs, uncond_embs, coef, sched_state,
                jnp.float32(guidance_scale), num_steps=num_run_steps, **common,
            )
        else:
            # Interruptible path: ceil(steps/chunk) jitted segments with the
            # cancel flag (and optional latents-editing callback, the
            # reference's callback_on_step_end at chunk granularity,
            # sd:1919-1928) checked between them.
            chunk = chunk or num_run_steps
            final, state = latents, sched_state
            for s in range(0, num_run_steps, chunk):
                final, state = engine.denoise_steps(
                    *args, final, embs, uncond_embs, coef, state,
                    jnp.float32(guidance_scale),
                    start=s, end=min(s + chunk, num_run_steps), **common,
                )
                if callback_on_chunk_end is not None:
                    out = callback_on_chunk_end(self, min(s + chunk, num_run_steps), final)
                    if out is not None:
                        final = out
                if self._interrupt:
                    break
        if output_type == "latent":
            return final
        return self._decode(final, per_frame=per_frame_decode)

    def interpolate(
        self,
        latent_start: jnp.ndarray,
        latent_end: jnp.ndarray,
        prompt_start: str,
        prompt_end: str,
        guide_prompt: Optional[str] = None,
        negative_prompt: str = "",
        size: int = 7,
        num_inference_steps: int = 25,
        warmup_ratio: float = 0.5,
        early: str = "fused_outer",
        late: str = "self",
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        guidance_scale: Optional[float] = None,
        ts=None,
        output_type: str = "np",
        callback_on_chunk_end=None,
        callback_on_step_end=None,
    ):
        """Full-sequence batched interpolation — one device program.

        Reference gradio interpolate (:163-304): latents slerp at UNIFORM
        spacing, text embeds lerp at UNIFORM spacing (or guide-prompt
        broadcast for PAID), while the per-frame attention coefficients
        follow the Beta(alpha, beta) PPF schedule (alpha/beta default to
        num_inference_steps, :203-206).

        ``ts`` (optional, (N,) floats with ts[0]=0, ts[-1]=1): explicit
        per-frame coefficient points — latents slerp, embeds lerp AND the
        attention coef all use these points, overriding size/alpha/beta.
        Because every AID mode sources K/V only from the endpoint rows,
        each frame of such a run is mathematically identical to the middle
        frame of a 3-frame ``interpolate_single(ts[i])`` run — this is the
        batched engine behind ``interpolate_save_gpu``'s fast path and the
        prior/selection loops (SURVEY §7 "batch candidate points per
        round"; reference per-frame loops at /root/reference/prior.py:94,
        :398-412 re-denoise both endpoints per call, which this avoids).
        """
        if alpha is None:
            alpha = float(num_inference_steps)
        if beta is None:
            beta = float(num_inference_steps)

        if ts is not None:
            ts = np.asarray(ts, np.float32)
            assert ts.ndim == 1 and ts[0] == 0.0 and ts[-1] == 1.0, (
                "ts must be a 1-D schedule with endpoints 0 and 1")
            size = int(ts.shape[0])
        latents = spherical_interpolation(latent_start, latent_end, size, ts=ts)
        emb_s, un_s = self.encode_prompt(prompt_start, negative_prompt)
        emb_e, un_e = self.encode_prompt(prompt_end, negative_prompt)
        if guide_prompt is not None:
            emb_g, un_g = self.encode_prompt(guide_prompt, negative_prompt)
            embs = jnp.concatenate([emb_s] + [emb_g] * (size - 2) + [emb_e], axis=0)
            uncond = jnp.concatenate([un_s] + [un_g] * (size - 2) + [un_e], axis=0)
        else:
            embs = linear_interpolation(emb_s, emb_e, size=size, ts=ts)
            uncond = linear_interpolation(un_s, un_e, size=size, ts=ts)

        coef = jnp.asarray(ts) if ts is not None else jnp.asarray(
            generate_beta_schedule(size, alpha, beta, force_endpoints=True))
        return self._run_sequence(
            latents, embs, uncond, coef, num_inference_steps, warmup_ratio,
            early, late, guidance_scale, output_type=output_type,
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
        num_inference_steps: int = 25,
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
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        guide_prompt_embeds: Optional[jnp.ndarray] = None,
        seed: int = 0,
        output_type: str = "np",
        callback_on_chunk_end=None,
        callback_on_step_end=None,
    ):
        """3-frame [source A, interpolated, source B] generation.

        Reference interpolate_single (pipeline_interpolated_sd.py:1407-1963,
        gradio :394-521): latent_target = slerp(start, end, it); target text
        embeds = guide prompt (PAID) or lerp/slerp by ``init``; coef vector
        [0, it, 1]; warmup split early/late.

        IP-Adapter: ``image_embeds_start/end`` are CLIP image embeds
        (reference prepare_ip_adapter_image_embeds + lerp/slerp,
        sd:1762-1814). Scale-control (image_end only) passes
        ``image_embeds_start=None`` with ``negative_image_embeds`` as the
        start endpoint (sd:1772-1774).

        ``prompt_embeds_start/end`` + ``negative_prompt_embeds`` (each
        (1, S, D)) bypass the tokenizer/text-encoder entirely — the
        diffusers prompt_embeds escape hatch (reference encode_prompt's
        prompt_embeds shortcut, sd:509-517), used by the parity harness to
        feed reference-exported embeddings (PARITY.md).
        """
        assert 0.0 < it < 1.0, "t must be between 0 and 1"
        if latent_start is None:
            latent_start = self.generate_latent(seed)
        if latent_end is None:
            latent_end = self.generate_latent(seed + 1)

        latent_t = slerp(latent_start, latent_end, it)
        latents = jnp.concatenate([latent_start, latent_t, latent_end], axis=0)

        if prompt_embeds_start is not None:
            assert prompt_embeds_end is not None and negative_prompt_embeds is not None, (
                "prompt_embeds_start requires prompt_embeds_end and "
                "negative_prompt_embeds")
            emb_s = jnp.asarray(prompt_embeds_start)
            emb_e = jnp.asarray(prompt_embeds_end)
            un_s = un_e = jnp.asarray(negative_prompt_embeds)
            emb_g = jnp.asarray(guide_prompt_embeds) if guide_prompt_embeds is not None else None
        else:
            emb_s, un_s = self.encode_prompt(prompt_start, negative_prompt)
            emb_e, un_e = self.encode_prompt(prompt_end, negative_prompt)
            if guide_prompt_embeds is not None:
                # pre-computed guide embeds are honored with or without
                # pre-computed endpoint embeds
                emb_g = jnp.asarray(guide_prompt_embeds)
            else:
                emb_g = self.encode_prompt(guide_prompt, negative_prompt)[0] if guide_prompt is not None else None
        if emb_g is not None:
            emb_t = emb_g
        else:
            emb_t = self._interp_pair(emb_s, emb_e, it, init)
        un_t = self._interp_pair(un_s, un_e, it, init)
        embs = jnp.concatenate([emb_s, emb_t, emb_e], axis=0)
        uncond = jnp.concatenate([un_s, un_t, un_e], axis=0)

        ip_cond = ip_uncond = None
        if image_embeds_end is not None:
            if negative_image_embeds is None:
                negative_image_embeds = jnp.zeros_like(image_embeds_end)
            if image_embeds_start is None:
                # scale-control: start endpoint is the negative embed (sd:1772-1774)
                image_embeds_start = negative_image_embeds
            ip_t = self._interp_pair(image_embeds_start, image_embeds_end, it, init)
            ip_cond = jnp.concatenate([image_embeds_start, ip_t, image_embeds_end], axis=0)
            ip_uncond = jnp.concatenate([negative_image_embeds] * 3, axis=0)

        coef = jnp.array([0.0, it, 1.0], jnp.float32)
        return self._run_sequence(
            latents, embs, uncond, coef, num_inference_steps, warmup_ratio,
            early, late, guidance_scale, guidance_rescale,
            ip_image_embeds=ip_cond, ip_uncond_image_embeds=ip_uncond,
            output_type=output_type,
            callback_on_chunk_end=callback_on_chunk_end,
            callback_on_step_end=callback_on_step_end,
        )

    def interpolate_save_gpu(
        self,
        latent_start: jnp.ndarray,
        latent_end: jnp.ndarray,
        prompt_start: str,
        prompt_end: str,
        guide_prompt: Optional[str] = None,
        negative_prompt: str = "",
        size: int = 7,
        num_inference_steps: int = 25,
        warmup_ratio: float = 0.5,
        early: str = "fused_outer",
        late: str = "self",
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        init: str = "linear",
        guidance_scale: Optional[float] = None,
        batched: bool = False,
    ) -> np.ndarray:
        """Frame-at-a-time stitched generation (reference gradio :306-392).

        Reference semantics (the default): (size-2) 3-frame runs at
        Beta-PPF points, stitched [first 2] + middles + [last] — which
        re-denoises BOTH endpoint frames on every call (3(size-2)
        frame-denoises for size frames) but caps peak memory at one
        3-frame program: this API exists precisely as the memory-light
        mode, so a large ``size`` must keep fitting where it used to.
        ``batched=True`` opts into the mathematically identical sequence
        in ONE size-frame batched run via ``interpolate(ts=...)`` — every
        AID mode sources K/V only from the endpoint rows, so each middle
        frame depends only on its own latent/embeds and the two endpoint
        trajectories (SURVEY §7; equivalence pinned in
        tests/test_pipeline.py) — at `size/3(size-2)` the frame-denoise
        cost, with the whole sequence resident on device.
        ``init='denoising'`` routes to the denoising-interpolation
        baseline; non-linear ``init`` falls back to the sequential path
        (the batched engine lerps embeds).
        """
        if alpha is None:
            alpha = float(num_inference_steps)
        if beta is None:
            beta = float(num_inference_steps)
        betas = generate_beta_schedule(size, alpha, beta, force_endpoints=True)
        if batched and init == "linear":
            return self.interpolate(
                latent_start, latent_end, prompt_start, prompt_end,
                guide_prompt=guide_prompt, negative_prompt=negative_prompt,
                size=size, num_inference_steps=num_inference_steps,
                warmup_ratio=warmup_ratio, early=early, late=late,
                guidance_scale=guidance_scale, ts=betas,
            )
        final = None
        for i in range(size - 2):
            it = float(betas[i + 1])
            if init == "denoising":
                images = self.denoising_interpolate(
                    latent_start, prompt_start, prompt_end, negative_prompt,
                    interpolated_ratio=it, timesteps=num_inference_steps,
                )
            else:
                images = self.interpolate_single(
                    it, latent_start, latent_end, prompt_start, prompt_end,
                    guide_prompt=guide_prompt, negative_prompt=negative_prompt,
                    num_inference_steps=num_inference_steps,
                    warmup_ratio=warmup_ratio, early=early, late=late,
                    init=init, guidance_scale=guidance_scale,
                )
            if size == 3:
                return images
            if i == 0:
                final = images[:2]
            elif i == size - 3:
                final = np.concatenate([final, images[1:]], axis=0)
            else:
                final = np.concatenate([final, images[1:2]], axis=0)
        return final

    def _cond_kwargs(self, prompt: str, negative_prompt: str, batch: int,
                     latent_hw) -> tuple:
        """(cond embeds, uncond embeds, extra engine kwargs) for a vanilla
        CFG run, repeated to ``batch`` rows. The SDXL subclass overrides
        this to supply the added_cond micro-conditioning dicts its UNet
        requires, which makes the inherited ``__call__`` and
        ``denoising_interpolate`` work unchanged on SDXL."""
        emb, uncond = self.encode_prompt(prompt, negative_prompt)[:2]
        if batch > 1:
            emb = jnp.repeat(emb, batch, axis=0)
            uncond = jnp.repeat(uncond, batch, axis=0)
        return emb, uncond, {}

    def denoising_interpolate(
        self,
        latents: jnp.ndarray,
        text_1: str,
        text_2: str,
        negative_prompt: str = "",
        interpolated_ratio: float = 1.0,
        timesteps: int = 25,
        guidance_scale: Optional[float] = None,
    ) -> np.ndarray:
        """Baseline: switch conditioning text at a step ratio, no AID
        (reference gradio :523-583)."""
        if guidance_scale is None:
            guidance_scale = self.guidance_scale
        n = latents.shape[0]
        emb1, uncond, extra1 = self._cond_kwargs(text_1, negative_prompt, n, latents.shape[1:3])
        emb2, _, extra2 = self._cond_kwargs(text_2, negative_prompt, n, latents.shape[1:3])

        state = self.scheduler.init(timesteps, latent_shape=latents.shape)
        latents = latents * state.init_noise_sigma
        # switch counts NOMINAL steps (reference gradio :560 computes it
        # from the requested count); the loop covers the actual timestep
        # array (== nominal except PNDM's +1 corrector entry)
        switch = int(timesteps * interpolated_ratio)
        end = int(state.timesteps.shape[0])
        g = jnp.float32(guidance_scale)
        latents, state = engine.denoise_range(
            self.unet, self.scheduler, self.unet_params, latents, emb1, uncond,
            state, g, start=0, end=switch, **extra1,
        )
        latents, state = engine.denoise_range(
            self.unet, self.scheduler, self.unet_params, latents, emb2, uncond,
            state, g, start=switch, end=end, **extra2,
        )
        return self._decode(latents)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: Optional[float] = None,
        num_images_per_prompt: int = 1,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "np",
    ):
        """Plain text-to-image (reference __call__, sd:1055-1403). Unlike the
        reference — which leaves freshly-loaded AID processors active in
        __call__ (a quirk; SURVEY.md §2.2) — plain generation here is always
        vanilla attention. ``num_images_per_prompt`` batches independent
        samples from per-seed latents (reference sd:1075, prompt embeds
        repeated per image)."""
        if guidance_scale is None:
            guidance_scale = self.guidance_scale
        if latents is None:
            latents = jnp.concatenate([
                self.generate_latent(seed + i, height, width)
                for i in range(num_images_per_prompt)
            ], axis=0)
        elif num_images_per_prompt != 1 and num_images_per_prompt != latents.shape[0]:
            raise ValueError(
                f"num_images_per_prompt={num_images_per_prompt} but explicit "
                f"latents have batch {latents.shape[0]}; pass matching "
                "latents or omit one of the two (diffusers requires the "
                "same consistency in prepare_latents)")
        emb, uncond, extra = self._cond_kwargs(
            prompt, negative_prompt, latents.shape[0], latents.shape[1:3])
        state = self.scheduler.init(num_inference_steps, latent_shape=latents.shape)
        latents = latents * state.init_noise_sigma
        final, _ = engine.denoise_range(
            self.unet, self.scheduler, self.unet_params, latents,
            emb, uncond, state, jnp.float32(guidance_scale),
            start=0, end=int(state.timesteps.shape[0]), **extra,
        )
        if output_type == "latent":
            return final
        return self._decode(final)
