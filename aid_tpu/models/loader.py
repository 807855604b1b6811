"""Assemble pipelines from local diffusers-format checkpoint directories.

The reference's `from_pretrained` path (pipeline_interpolated_sd.py:283-438,
gradio_src/pipeline_interpolated_stable_diffusion.py:31-86): read each
subfolder's config.json + safetensors, convert to flax trees, build the
matching aid_tpu modules. Zero-egress: paths must be local (a pre-populated
HF cache works).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp

from aid_tpu.models import configs as C
from aid_tpu.models.clip import CLIPTextModel
from aid_tpu.models.params import (
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    load_safetensors,
)
from aid_tpu.models.unet import UNet2DCondition
from aid_tpu.models.vae import AutoencoderKL
from aid_tpu.utils.tokenizer import load_tokenizer


def _read_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def unet_config_from_diffusers(cfg: dict) -> C.UNetConfig:
    """diffusers UNet2DConditionModel config.json -> UNetConfig."""
    down_types = cfg["down_block_types"]
    levels = len(down_types)
    cross = tuple("CrossAttn" in t for t in down_types)

    def per_level(v, default):
        v = cfg.get(v, default)
        return tuple(v) if isinstance(v, (list, tuple)) else (v,) * levels

    # diffusers legacy quirk: attention_head_dim is the HEAD COUNT when
    # num_attention_heads is unset (SD1.x: 8 means 8 heads)
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)
    heads = tuple(heads) if isinstance(heads, (list, tuple)) else (heads,) * levels

    return C.UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        cross_attention_levels=cross,
        layers_per_block=cfg.get("layers_per_block", 2),
        transformer_layers_per_block=per_level("transformer_layers_per_block", 1),
        num_attention_heads=heads,
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        use_linear_projection=cfg.get("use_linear_projection", False),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        freq_shift=cfg.get("freq_shift", 0),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim") or 256,
        projection_class_embeddings_input_dim=cfg.get("projection_class_embeddings_input_dim"),
    )


def vae_config_from_diffusers(cfg: dict) -> C.VAEConfig:
    lm = cfg.get("latents_mean")
    ls = cfg.get("latents_std")
    return C.VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
        latents_mean=tuple(lm) if lm else None,
        latents_std=tuple(ls) if ls else None,
        force_upcast=cfg.get("force_upcast", True),
    )


def clip_text_config_from_transformers(cfg: dict) -> C.CLIPTextConfig:
    proj = None
    if "CLIPTextModelWithProjection" in (cfg.get("architectures") or []):
        proj = cfg.get("projection_dim")
    return C.CLIPTextConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        projection_dim=proj,
        eos_token_id=cfg.get("eos_token_id", 49407),
    )


def _convert_cached(kind: str, path: str, convert, cache_dir):
    """safetensors -> pytree conversion, optionally cached on disk.

    With ``cache_dir`` set, the converted flax tree is stored via orbax
    (utils/cache.py, SURVEY.md §5.4) keyed by component kind + source path,
    so subsequent loads skip the safetensors read + layout transposes
    entirely. The key is the path — delete the cache entry to pick up a
    checkpoint replaced in place.
    """
    if cache_dir is None:
        return convert(load_safetensors(path))
    import hashlib

    from aid_tpu.utils.cache import cached_convert

    tag = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
    return cached_convert(lambda p: convert(load_safetensors(p)), path,
                          cache_dir, f"{kind}-{tag}")


def load_unet(path: str, dtype=jnp.bfloat16, cache_dir=None):
    cfg = unet_config_from_diffusers(_read_config(path))
    module = UNet2DCondition(cfg, dtype=dtype)
    params = _convert_cached("unet", path, convert_unet_state_dict, cache_dir)
    return module, params


def vae_decode_dtype(cfg: C.VAEConfig):
    """force_upcast=True -> float32, False -> bfloat16 (see load_vae)."""
    return jnp.float32 if cfg.force_upcast else jnp.bfloat16


def load_vae(path: str, dtype=None, cache_dir=None):
    """dtype=None honors the checkpoint's ``force_upcast``: True (SD/SDXL
    default) -> float32 decode (reference upcast_vae,
    pipeline_interpolated_sdxl.py:2347-2357); False (sdxl-vae-fp16-fix,
    playground-v2.5) -> bfloat16 decode — the reference runs those VAEs in
    fp16, bf16 is the TPU-native half precision (~3x faster decode on v5e,
    tools/opt3_results.jsonl r3vae_decode_*)."""
    cfg = vae_config_from_diffusers(_read_config(path))
    if dtype is None:
        dtype = vae_decode_dtype(cfg)
    module = AutoencoderKL(cfg, dtype=dtype)
    params = _convert_cached("vae", path, convert_vae_state_dict, cache_dir)
    return module, params


def load_text_encoder(path: str, dtype=jnp.float32, cache_dir=None):
    cfg = clip_text_config_from_transformers(_read_config(path))
    module = CLIPTextModel(cfg, dtype=dtype)
    params = _convert_cached("text", path, convert_clip_text_state_dict, cache_dir)
    return module, params


def clip_vision_config_from_transformers(cfg: dict) -> C.CLIPVisionConfig:
    # safety_checker / image_encoder config.json may nest the vision tower
    # under "vision_config" (CLIPConfig format)
    vc = cfg.get("vision_config", cfg)
    return C.CLIPVisionConfig(
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 32),
        hidden_size=vc.get("hidden_size", 768),
        intermediate_size=vc.get("intermediate_size", 3072),
        num_hidden_layers=vc.get("num_hidden_layers", 12),
        num_attention_heads=vc.get("num_attention_heads", 12),
        projection_dim=cfg.get("projection_dim", vc.get("projection_dim", 512)),
        hidden_act=vc.get("hidden_act", "quick_gelu"),
    )


def load_safety_checker(path: str):
    """Build a SafetyChecker from a checkpoint's safety_checker/ directory
    (reference constructs it via from_pretrained and runs it on every decode,
    pipeline_interpolated_sd.py:328-438, :1939-1941)."""
    from aid_tpu.models.safety import SafetyChecker, convert_safety_checker_state_dict

    cfg = clip_vision_config_from_transformers(_read_config(path))
    module = SafetyChecker(cfg)
    params = convert_safety_checker_state_dict(load_safetensors(path))
    return module, params


def load_scheduler(repo_path: str, scheduler_name: str = "auto"):
    """Build a scheduler from <repo_path>/scheduler/scheduler_config.json.

    ``scheduler_name='auto'`` dispatches on the config's ``_class_name``
    (reference: from_pretrained instantiates whatever class the checkpoint
    pins — playground-v2.5 ships EDMDPMSolverMultistepScheduler,
    play_sdxl_trial.ipynb cell 3); explicit names override. EDM sigma
    parameters (sigma_min/max/data, rho) are read from the config."""
    from aid_tpu.schedulers import (
        DDIMScheduler,
        EDMDPMSolverScheduler,
        EulerDiscreteScheduler,
        PNDMScheduler,
        SchedulerConfig,
        UniPCScheduler,
    )

    sc = {}
    sch_path = os.path.join(repo_path, "scheduler", "scheduler_config.json")
    if os.path.exists(sch_path):
        with open(sch_path) as f:
            sc = json.load(f)

    if scheduler_name == "auto":
        cls = sc.get("_class_name", "DDIMScheduler")
        scheduler_name = {
            "DDIMScheduler": "ddim",
            "PNDMScheduler": "pndm",  # the SD-1.x-derivative default (the
            # reference notebooks' checkpoints Realistic_Vision_V4.0 and
            # YiffyMix ship it)
            "UniPCMultistepScheduler": "unipc",
            "EulerDiscreteScheduler": "euler",
            "EDMDPMSolverMultistepScheduler": "edm",
            "DPMSolverMultistepScheduler": "unipc",  # closest functional match
        }.get(cls, "ddim")

    if scheduler_name == "edm":
        return EDMDPMSolverScheduler(
            sigma_min=sc.get("sigma_min", 0.002),
            sigma_max=sc.get("sigma_max", 80.0),
            sigma_data=sc.get("sigma_data", 0.5),
            rho=sc.get("rho", 7.0),
            prediction_type=sc.get("prediction_type", "epsilon"),
        )

    sch_cfg = SchedulerConfig(
        num_train_timesteps=sc.get("num_train_timesteps", 1000),
        beta_start=sc.get("beta_start", 0.00085),
        beta_end=sc.get("beta_end", 0.012),
        beta_schedule=sc.get("beta_schedule", "scaled_linear"),
        prediction_type=sc.get("prediction_type", "epsilon"),
        timestep_spacing=sc.get("timestep_spacing", "leading"),
        steps_offset=sc.get("steps_offset", 1),
        set_alpha_to_one=sc.get("set_alpha_to_one", False),
        clip_sample=sc.get("clip_sample", False),
        rescale_betas_zero_snr=sc.get("rescale_betas_zero_snr", False),
    )
    if scheduler_name == "euler":
        # honor the checkpoint's Karras-sigma pin (diffusers from_pretrained
        # reads it from the same config)
        return EulerDiscreteScheduler(
            sch_cfg, use_karras_sigmas=sc.get("use_karras_sigmas", False))
    if scheduler_name == "pndm":
        return PNDMScheduler(
            sch_cfg, skip_prk_steps=sc.get("skip_prk_steps", True))
    return {
        "ddim": DDIMScheduler,
        "unipc": UniPCScheduler,
    }[scheduler_name](sch_cfg)


def load_interpolation_pipeline(
    repo_path: str,
    scheduler_name: Optional[str] = None,
    dtype=jnp.bfloat16,
    guidance_scale: Optional[float] = None,
    cache_dir: Optional[str] = None,
):
    """Build an InterpolationPipeline from a local SD1.x/2.x checkpoint dir.

    Layout: unet/ vae/ text_encoder/ tokenizer/ (scheduler config is read
    for prediction_type when present). Reference equivalent:
    InterpolationStableDiffusionPipeline.from_pretrained + load_aid.
    SDXL-family directories (dual text encoders) are auto-detected and
    delegated to load_interpolation_xl_pipeline, so this is the single
    entry point whatever the checkpoint family. ``scheduler_name=None``
    means the family default (ddim for SD, the checkpoint's configured
    scheduler for SDXL); an explicit name is honored either way, as is
    ``guidance_scale`` (family defaults 7.5 / 5.0).
    """
    from aid_tpu.pipelines import InterpolationPipeline

    if os.path.isdir(os.path.join(repo_path, "text_encoder_2")):
        return load_interpolation_xl_pipeline(
            repo_path,
            scheduler_name="auto" if scheduler_name is None else scheduler_name,
            dtype=dtype,
            guidance_scale=guidance_scale,
            cache_dir=cache_dir,
        )
    if scheduler_name is None:
        scheduler_name = "ddim"
    if guidance_scale is None:
        guidance_scale = 7.5

    unet, unet_params = load_unet(os.path.join(repo_path, "unet"), dtype=dtype, cache_dir=cache_dir)
    vae, vae_params = load_vae(os.path.join(repo_path, "vae"), cache_dir=cache_dir)
    text, text_params = load_text_encoder(os.path.join(repo_path, "text_encoder"), cache_dir=cache_dir)
    tokenizer = load_tokenizer(os.path.join(repo_path, "tokenizer"))
    scheduler = load_scheduler(repo_path, scheduler_name)

    safety, safety_params = None, None
    safety_dir = os.path.join(repo_path, "safety_checker")
    if os.path.isdir(safety_dir) and os.path.exists(os.path.join(safety_dir, "config.json")):
        safety, safety_params = load_safety_checker(safety_dir)

    return InterpolationPipeline(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=tokenizer, scheduler=scheduler,
        guidance_scale=guidance_scale,
        safety_checker=safety, safety_params=safety_params,
    )


def infer_single_file_prediction_type(cross_dim: int, global_step) -> str:
    """SD2.x v-prediction detection for single-file checkpoints.

    Single-file checkpoints carry no scheduler config, but the SD2.x 768-v
    releases are distinguishable by the training ``global_step`` metadata
    stored alongside ``state_dict`` in the torch .ckpt (diffusers'
    from_single_file heuristic: >= 875_000 -> the v2/768 v-objective run;
    the 512 base run stopped earlier). Only meaningful for the
    1024-cross-dim (SD2.x) UNet layout; SD1.x is always epsilon. Bare
    safetensors exports lack the metadata and default to epsilon — pass an
    explicit scheduler for those."""
    if cross_dim == 1024 and global_step is not None and int(global_step) >= 875_000:
        return "v_prediction"
    return "epsilon"


def apply_prediction_type(scheduler, prediction_type: str):
    """Return ``scheduler`` with its prediction objective pinned.

    Most schedulers carry a nested frozen ``config`` dataclass; the EDM
    solver stores ``prediction_type`` as a direct dataclass field
    (schedulers/edm_dpm.py:44) — a hasattr-config guard alone would
    silently drop an explicit pin for it."""
    import dataclasses

    if hasattr(scheduler, "config"):
        return dataclasses.replace(
            scheduler,
            config=dataclasses.replace(scheduler.config,
                                       prediction_type=prediction_type))
    return dataclasses.replace(scheduler, prediction_type=prediction_type)


def resolve_single_file_prediction_type(
    ckpt_dir: str,
    explicit: Optional[str],
    cross_dim: int,
    global_step,
) -> Optional[str]:
    """Resolve the scheduler prediction objective for a single-file load.

    Precedence: an ``explicit`` user value wins; next, a sidecar
    ``scheduler/scheduler_config.json`` next to the checkpoint that pins
    prediction_type defers to that config (returns None — load_scheduler
    already read it; an explicit user config must never be clobbered by
    metadata from a resumed fine-tune); last, the SD2.x ``global_step``
    heuristic (``infer_single_file_prediction_type``). SD2.x 768-v bare
    safetensors exports carry neither config nor metadata — a warning
    fires on that undetectable combination and epsilon is assumed."""
    if explicit is not None:
        return explicit
    sidecar = os.path.join(ckpt_dir, "scheduler", "scheduler_config.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            if "prediction_type" in json.load(f):
                return None
    if cross_dim == 1024 and global_step is None:
        import warnings

        warnings.warn(
            "SD2.x single-file checkpoint without global_step metadata "
            "(typical of bare safetensors exports): cannot detect whether "
            "this is a 768-v model; defaulting to epsilon. Pass "
            "prediction_type='v_prediction' if this is a v-objective "
            "(768px) checkpoint.",
            stacklevel=3,
        )
    return infer_single_file_prediction_type(cross_dim, global_step)


def load_single_file_pipeline(
    checkpoint_path: str,
    tokenizer_path: str,
    scheduler_name: str = "ddim",
    dtype=jnp.bfloat16,
    guidance_scale: Optional[float] = None,
    tokenizer_2_path: Optional[str] = None,
    prediction_type: Optional[str] = None,
):
    """Build an InterpolationPipeline (or InterpolationXLPipeline) from an
    original single-file checkpoint (.safetensors or torch .ckpt).

    Reference FromSingleFileMixin surface on BOTH pipelines
    (pipeline_interpolated_sd.py:283-289, pipeline_interpolated_sdxl.py:
    291-298). Model configs are inferred from checkpoint tensor shapes
    (cross-attention width 768 -> SD1.x, 1024 -> SD2.x, 2048 -> SDXL; the
    SDXL layout is auto-detected from its conditioner.embedders.* keys).
    The original format carries no tokenizer, so a local tokenizer
    directory (any SD checkpoint's tokenizer/ subfolder) must be supplied
    — and for SDXL a ``tokenizer_2_path``. When ``tokenizer_2_path`` is
    omitted, ``tokenizer_path``'s vocab is reused but the pad token is
    FORCED to SDXL's tokenizer_2 convention "!" (id 0) — an SD tokenizer
    directory's own config (EOS pad) must not govern the bigG encoder;
    an explicit ``tokenizer_2_path`` keeps its per-directory config.

    ``prediction_type`` ('epsilon' / 'v_prediction') pins the scheduler
    objective explicitly. When omitted, precedence is: a sidecar
    ``scheduler/scheduler_config.json`` next to the checkpoint that pins
    prediction_type, then the SD2.x ``global_step`` heuristic
    (``infer_single_file_prediction_type``). SD2.x 768-v *safetensors*
    exports carry neither config nor metadata — pass
    ``prediction_type='v_prediction'`` for those (a warning fires on the
    undetectable combination)."""
    from aid_tpu.models.params import (
        convert_clip_text_state_dict,
        convert_ldm_checkpoint,
        convert_ldm_checkpoint_xl,
        convert_unet_state_dict,
        convert_vae_state_dict,
    )
    from aid_tpu.pipelines import InterpolationPipeline

    if checkpoint_path.endswith(".safetensors"):
        sd = load_safetensors(checkpoint_path)
    else:
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    global_step = sd.get("global_step")  # training step metadata (torch
    # .ckpt top level, alongside state_dict) — used for the SD2.x
    # v-prediction heuristic below; absent from bare safetensors exports
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]

    def _infer_text(text_sd, hidden_act="quick_gelu", projection_dim=None):
        emb = text_sd["text_model.embeddings.token_embedding.weight"]
        n_layers = 1 + max(
            int(k.split(".")[3]) for k in text_sd
            if k.startswith("text_model.encoder.layers."))
        hidden = emb.shape[1]
        cfg = C.CLIPTextConfig(
            vocab_size=emb.shape[0], hidden_size=hidden,
            intermediate_size=4 * hidden, num_hidden_layers=n_layers,
            num_attention_heads=hidden // 64, hidden_act=hidden_act,
            projection_dim=projection_dim,
        )
        return CLIPTextModel(cfg), convert_clip_text_state_dict(text_sd)

    if any(k.startswith("conditioner.embedders.") for k in sd):
        from aid_tpu.pipelines.sdxl import InterpolationXLPipeline

        unet_sd, vae_sd, text_sd, text2_sd = convert_ldm_checkpoint_xl(sd)
        unet = UNet2DCondition(C.SDXL_UNET, dtype=dtype)
        unet_params = convert_unet_state_dict(unet_sd)
        vae = AutoencoderKL(C.SDXL_VAE)
        vae_params = convert_vae_state_dict(vae_sd)
        text, text_params = _infer_text(text_sd)
        proj_dim = text2_sd["text_projection.weight"].shape[0]
        text2, text2_params = _infer_text(text2_sd, hidden_act="gelu",
                                          projection_dim=proj_dim)
        scheduler = load_scheduler(os.path.dirname(checkpoint_path) or ".", scheduler_name)
        return InterpolationXLPipeline(
            unet=unet, unet_params=unet_params,
            vae=vae, vae_params=vae_params,
            text_encoder=text, text_params=text_params,
            tokenizer=load_tokenizer(tokenizer_path),
            text_encoder_2=text2, text_params_2=text2_params,
            # SDXL's tokenizer_2 pads with "!" (id 0), NOT EOS. When only an
            # SD-style tokenizer dir is supplied, its config would silently
            # impose EOS padding on the bigG encoder — whose pad-position
            # hidden states feed cross-attention for every short prompt
            # (reference pipeline_interpolated_sdxl.py:644-730) — so force
            # the SDXL pad convention unless an explicit tokenizer_2 dir
            # provides its own config.
            tokenizer_2=(load_tokenizer(tokenizer_2_path) if tokenizer_2_path
                         else load_tokenizer(tokenizer_path, pad_token="!")),
            scheduler=scheduler,
            guidance_scale=5.0 if guidance_scale is None else guidance_scale,
        )

    unet_sd, vae_sd, text_sd = convert_ldm_checkpoint(sd)

    cross_dim = unet_sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"].shape[1]
    linear_proj = unet_sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 2
    unet_cfg = C.SD21_UNET if cross_dim == 1024 else C.SD15_UNET
    if linear_proj != unet_cfg.use_linear_projection:
        import dataclasses

        unet_cfg = dataclasses.replace(unet_cfg, use_linear_projection=linear_proj)
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    unet_params = convert_unet_state_dict(unet_sd)

    vae = AutoencoderKL(C.VAEConfig())
    vae_params = convert_vae_state_dict(vae_sd)

    # SD2.x ships an OpenCLIP ViT-H text tower (gelu MLPs; already
    # converted to transformers naming by convert_ldm_checkpoint)
    text, text_params = _infer_text(
        text_sd, hidden_act="gelu" if cross_dim == 1024 else "quick_gelu")

    # no scheduler_config.json in single-file checkpoints: load_scheduler
    # degrades to the SD-1.x defaults (scaled_linear 0.00085-0.012) and
    # keeps the name->class dispatch in ONE place; prediction-type
    # precedence lives in resolve_single_file_prediction_type.
    ckpt_dir = os.path.dirname(checkpoint_path) or "."
    scheduler = load_scheduler(ckpt_dir, scheduler_name)
    prediction_type = resolve_single_file_prediction_type(
        ckpt_dir, prediction_type, cross_dim, global_step)
    if prediction_type is not None:
        scheduler = apply_prediction_type(scheduler, prediction_type)

    return InterpolationPipeline(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        # SD2.x's OpenCLIP ViT-H tower was trained with id-0 ("!") padding
        # (the SD2 tokenizer dirs ship pad_token "!"), while SD1.x
        # tokenizer dirs pad with EOS — and the docstring blesses "any SD
        # checkpoint's tokenizer/ subfolder". Pad-position hidden states
        # feed cross-attention for every short prompt, so force the
        # OpenCLIP convention for the 1024-cross-dim layout (mirrors the
        # SDXL tokenizer_2 handling above).
        tokenizer=(load_tokenizer(tokenizer_path, pad_token="!")
                   if cross_dim == 1024 else load_tokenizer(tokenizer_path)),
        scheduler=scheduler,
        guidance_scale=7.5 if guidance_scale is None else guidance_scale,
    )


def load_interpolation_xl_pipeline(repo_path: str, scheduler_name: str = "auto", dtype=jnp.bfloat16,
                                   guidance_scale: Optional[float] = None,
                                   cache_dir: Optional[str] = None):
    """Build an InterpolationXLPipeline from a local SDXL checkpoint dir.

    scheduler_name='auto' honors the checkpoint's scheduler_config.json
    _class_name — this is how the playground-v2.5 EDM path loads end-to-end
    (reference play_sdxl_trial.ipynb cell 3)."""
    from aid_tpu.pipelines.sdxl import InterpolationXLPipeline

    unet, unet_params = load_unet(os.path.join(repo_path, "unet"), dtype=dtype, cache_dir=cache_dir)
    vae, vae_params = load_vae(os.path.join(repo_path, "vae"), cache_dir=cache_dir)
    text, text_params = load_text_encoder(os.path.join(repo_path, "text_encoder"), cache_dir=cache_dir)
    text2, text2_params = load_text_encoder(os.path.join(repo_path, "text_encoder_2"), cache_dir=cache_dir)
    scheduler = load_scheduler(repo_path, scheduler_name)

    return InterpolationXLPipeline(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        tokenizer=load_tokenizer(os.path.join(repo_path, "tokenizer")),
        text_encoder_2=text2, text_params_2=text2_params,
        tokenizer_2=load_tokenizer(os.path.join(repo_path, "tokenizer_2")),
        scheduler=scheduler,
        **({} if guidance_scale is None else {"guidance_scale": guidance_scale}),
    )
