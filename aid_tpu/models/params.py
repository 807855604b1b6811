"""Checkpoint conversion: HF/diffusers torch state dicts -> flax param trees.

The reference loads checkpoints via diffusers from_pretrained /
load_ip_adapter (reference pipeline_interpolated_sd.py:283-289, :986-991;
model zoo in README.md:175-184). Here the equivalent is a pure
numpy/safetensors converter (no torch needed at load time) mapping
diffusers/transformers parameter names onto aid_tpu module trees:

  * Linear:   weight (out, in)      -> kernel (in, out)          [transpose]
  * Conv2d:   weight (o, i, kh, kw) -> kernel (kh, kw, i, o)     [transpose]
  * Norms:    weight/bias           -> scale/bias
  * Embedding: weight               -> embedding

Converted trees can be cached with orbax for fast reload (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# generic machinery
# ---------------------------------------------------------------------------

def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _assign(tree: Dict, path, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_leaf(name: str, w: np.ndarray, kind: str) -> Tuple[str, np.ndarray]:
    """Map a torch parameter leaf to (flax_name, flax_array)."""
    if kind == "embedding":
        return "embedding", w
    if name == "weight":
        if w.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", w.transpose(2, 3, 1, 0)
        if w.ndim == 2:  # linear (out,in) -> (in,out)
            return "kernel", w.transpose(1, 0)
        return "scale", w  # norm
    return name, w  # bias


_EMBEDDING_MODULES = ("token_embedding", "position_embedding")


def _torch_path_to_flax(parts) -> Tuple[tuple, str]:
    """Collapse indexed diffusers segments into aid_tpu module names.

    'down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight' ->
    (('down_blocks_0_attentions_1', 'transformer_blocks_0', 'attn1', 'to_q'), 'weight')
    """
    out = []
    i = 0
    n = len(parts)
    while i < n - 1:  # last part is the leaf name
        p = parts[i]
        if p in ("down_blocks", "up_blocks") and i + 3 < n and parts[i + 1].isdigit():
            # down_blocks.I.(resnets|attentions|downsamplers|upsamplers).J
            blk, idx, sub, j = parts[i], parts[i + 1], parts[i + 2], parts[i + 3]
            out.append(f"{blk}_{idx}_{sub}_{j}")
            i += 4
        elif p == "mid_block" and i + 2 < n and parts[i + 2].isdigit() and parts[i + 1] in ("resnets", "attentions"):
            out.append(f"mid_block_{parts[i + 1]}_{parts[i + 2]}")
            i += 3
        elif p in ("transformer_blocks", "layers") and i + 1 < n and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p in ("net", "to_out") and i + 1 < n and parts[i + 1].isdigit():
            # ff.net.0.proj -> net_0_proj ; to_out.0 -> to_out_0
            if parts[i + 1] == "0" and i + 2 < n - 1 and parts[i + 2] == "proj":
                out.append("net_0_proj")
                i += 3
            else:
                out.append(f"{p}_{parts[i + 1]}")
                i += 2
        elif p == "mlp" and i + 1 < n and parts[i + 1] in ("fc1", "fc2"):
            out.append(f"mlp_{parts[i + 1]}")
            i += 2
        elif p in ("to_k_ip", "to_v_ip") and i + 1 < n and parts[i + 1].isdigit():
            out.append(p)  # diffusers wraps these in a ModuleList of 1
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out), parts[-1]


def convert_torch_state_dict(state_dict: Dict[str, Any], strip_prefixes=()) -> Dict:
    """Generic diffusers/transformers torch state dict -> flax params tree."""
    tree: Dict = {}
    for key, value in state_dict.items():
        for pre in strip_prefixes:
            if key.startswith(pre):
                key = key[len(pre):]
        parts = key.split(".")
        if parts[-1] in ("num_batches_tracked",):
            continue
        w = _to_numpy(value)
        # transformers vision tower class_embedding is a bare parameter
        if parts[-1] == "class_embedding":
            _assign(tree, tuple(parts), w)
            continue
        path, leaf = _torch_path_to_flax(parts)
        kind = "embedding" if (path and path[-1] in _EMBEDDING_MODULES and leaf == "weight") else ""
        name, w = _convert_leaf(leaf, w, kind)
        _assign(tree, path + (name,), w)
    return {"params": tree}


# ---------------------------------------------------------------------------
# model-specific wrappers
# ---------------------------------------------------------------------------

def convert_unet_state_dict(sd: Dict[str, Any]) -> Dict:
    """diffusers UNet2DConditionModel state dict -> UNet2DCondition params.

    Note: diffusers FeedForward GEGLU is 'ff.net.0.proj' + 'ff.net.2';
    Transformer2D proj_in/proj_out are conv or linear depending on
    use_linear_projection — ndim-based transposes handle both.
    """
    return convert_torch_state_dict(sd)


def convert_vae_state_dict(sd: Dict[str, Any]) -> Dict:
    """diffusers AutoencoderKL state dict -> AutoencoderKL params.

    The VAE flax tree nests the mid block ('mid_block' submodule containing
    resnets_0/attentions_0), unlike the UNet's flat 'mid_block_attentions_0'
    naming — pre-join the sub-indices so the generic converter keeps the
    nesting instead of collapsing to the UNet layout."""
    import re

    remapped = {
        re.sub(r"mid_block\.(resnets|attentions)\.(\d+)", r"mid_block.\1_\2", k): v
        for k, v in sd.items()
    }
    return convert_torch_state_dict(remapped)


def convert_clip_text_state_dict(sd: Dict[str, Any]) -> Dict:
    """transformers CLIPTextModel(WithProjection) -> CLIPTextModel params."""
    remapped = {}
    for k, v in sd.items():
        k = k.replace("text_model.", "")
        k = k.replace("embeddings.", "").replace("encoder.", "")
        remapped[k] = v
    return convert_torch_state_dict(remapped)


def convert_clip_vision_state_dict(sd: Dict[str, Any]) -> Dict:
    """transformers CLIPVisionModelWithProjection -> CLIPVisionModel params."""
    remapped = {}
    for k, v in sd.items():
        k = k.replace("vision_model.", "")
        k = k.replace("embeddings.", "").replace("encoder.", "")
        remapped[k] = v
    return convert_torch_state_dict(remapped)


def convert_resampler_state_dict(sd: Dict[str, Any]) -> Dict:
    """IP-Adapter-Plus image_proj (perceiver resampler) -> Resampler params.

    Original checkpoint layout (h94/IP-Adapter plus variants):
      latents, proj_in/out.*, norm_out.*,
      layers.<i>.0.{norm1,norm2,to_q,to_kv,to_out}.*   (PerceiverAttention)
      layers.<i>.1.{0,1,3}.*                            (LN, fc1, GELU, fc2)
    """
    tree: Dict = {}
    for k, v in sd.items():
        w = _to_numpy(v)
        if k == "latents":
            tree["latents"] = w
            continue
        parts = k.split(".")
        if parts[0] in ("proj_in", "proj_out", "norm_out"):
            name, w = _convert_leaf(parts[1], w, "")
            _assign(tree, (parts[0], name), w)
        elif parts[0] == "layers":
            i = parts[1]
            if parts[2] == "0":  # attention block
                name, w = _convert_leaf(parts[4], w, "")
                _assign(tree, (f"layers_{i}_attn", parts[3], name), w)
            else:  # ffn Sequential: 0=LayerNorm, 1=fc1, 3=fc2
                sub = {"0": "ff_norm", "1": "ff_fc1", "3": "ff_fc2"}[parts[3]]
                name, w = _convert_leaf(parts[4], w, "")
                _assign(tree, (f"layers_{i}_{sub}", name), w)
    return {"params": tree}


def convert_ip_adapter_state_dict(sd: Dict[str, Any], unet_cross_attn_names) -> Tuple[Dict, Dict]:
    """IP-Adapter checkpoint -> (per-layer to_k_ip/to_v_ip tree, image-projection params).

    Checkpoint format (h94/IP-Adapter): {'image_proj': {proj|norm...},
    'ip_adapter': {'<idx>.to_k_ip.weight', ...}} where <idx> counts UNet
    attention processors in diffusers order and only odd indices (attn2)
    carry weights. ``unet_cross_attn_names``: flax module paths of the
    cross-attention layers in that same order (see unet_attention_order).
    Plus variants (resampler image_proj, detected by the 'latents' key)
    convert via convert_resampler_state_dict.
    """
    if "latents" in sd["image_proj"]:
        image_proj = convert_resampler_state_dict(sd["image_proj"])
    else:
        image_proj = convert_torch_state_dict(sd["image_proj"])

    ip = sd["ip_adapter"]
    idxs = sorted({int(k.split(".")[0]) for k in ip.keys()})
    assert len(idxs) == len(unet_cross_attn_names), (
        f"IP checkpoint has {len(idxs)} cross-attn entries, UNet has {len(unet_cross_attn_names)}"
    )
    tree: Dict = {}
    for idx, path in zip(idxs, unet_cross_attn_names):
        for proj in ("to_k_ip", "to_v_ip"):
            w = _to_numpy(ip[f"{idx}.{proj}.weight"]).transpose(1, 0)
            _assign(tree, tuple(path) + (proj, "kernel"), w)
    return {"params": tree}, image_proj


def unet_attention_order(config) -> list:
    """Flax module paths of cross-attention (attn2) layers in diffusers
    attn_processors order: down blocks, UP blocks, then mid block LAST.

    diffusers UNet2DConditionModel.__init__ assigns the (empty) up_blocks
    ModuleList before mid_block, and torch registers children by attribute
    ASSIGNMENT order, so named_children() — which attn_processors (and
    therefore IP-Adapter checkpoint key indices, e.g. h94/IP-Adapter
    '<idx>.to_k_ip.weight') walks — yields down -> up -> mid. SD1.5: attn2
    indices 1..29 are down+up, 31 is the mid block."""
    names = []

    def add(base, level):
        for ti in range(max(config.transformer_layers_per_block[level], 1)):
            names.append((base, f"transformer_blocks_{ti}", "attn2"))

    for level in range(config.num_levels):
        if config.cross_attention_levels[level]:
            for j in range(config.layers_per_block):
                add(f"down_blocks_{level}_attentions_{j}", level)
    for up_idx, level in enumerate(reversed(range(config.num_levels))):
        if config.cross_attention_levels[level]:
            for j in range(config.layers_per_block + 1):
                add(f"up_blocks_{up_idx}_attentions_{j}", level)
    top = config.num_levels - 1
    mid_level = top if config.cross_attention_levels[top] else next(
        i for i in reversed(range(config.num_levels)) if config.cross_attention_levels[i]
    )
    add("mid_block_attentions_0", mid_level)
    return names


# ---------------------------------------------------------------------------
# single-file (original LDM .ckpt/.safetensors) checkpoints
# ---------------------------------------------------------------------------

_LDM_RES_MAP = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}

_LDM_VAE_ATTN_MAP = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0"}


def _ldm_unet_key(key: str, layers_per_block: int = 2) -> Optional[str]:
    """One 'model.diffusion_model.'-stripped LDM UNet key -> diffusers key."""
    per = layers_per_block + 1  # resnets + the downsample slot per level
    parts = key.split(".")

    def map_res(rest: str) -> str:
        for src, dst in _LDM_RES_MAP.items():
            if rest.startswith(src + "."):
                return dst + rest[len(src):]
        return rest

    if key.startswith("time_embed.0."):
        return "time_embedding.linear_1." + key[len("time_embed.0."):]
    if key.startswith("time_embed.2."):
        return "time_embedding.linear_2." + key[len("time_embed.2."):]
    if key.startswith("out.0."):
        return "conv_norm_out." + key[len("out.0."):]
    if key.startswith("out.2."):
        return "conv_out." + key[len("out.2."):]
    if key.startswith("input_blocks.0.0."):
        return "conv_in." + key[len("input_blocks.0.0."):]
    # SDXL text_time additional conditioning MLP (label_emb in LDM naming)
    if key.startswith("label_emb.0.0."):
        return "add_embedding.linear_1." + key[len("label_emb.0.0."):]
    if key.startswith("label_emb.0.2."):
        return "add_embedding.linear_2." + key[len("label_emb.0.2."):]

    if parts[0] == "input_blocks":
        i, j = int(parts[1]), int(parts[2])
        rest = ".".join(parts[3:])
        block_id, layer = (i - 1) // per, (i - 1) % per
        if rest.startswith("op."):  # downsample conv
            return f"down_blocks.{block_id}.downsamplers.0.conv." + rest[len("op."):]
        if j == 0:
            return f"down_blocks.{block_id}.resnets.{layer}." + map_res(rest)
        return f"down_blocks.{block_id}.attentions.{layer}." + rest

    if parts[0] == "middle_block":
        j = int(parts[1])
        rest = ".".join(parts[2:])
        if j == 0:
            return "mid_block.resnets.0." + map_res(rest)
        if j == 1:
            return "mid_block.attentions.0." + rest
        return "mid_block.resnets.1." + map_res(rest)

    if parts[0] == "output_blocks":
        i, j = int(parts[1]), int(parts[2])
        rest = ".".join(parts[3:])
        block_id, layer = i // per, i % per
        if j == 0:
            return f"up_blocks.{block_id}.resnets.{layer}." + map_res(rest)
        if rest.startswith("conv."):  # upsample (last sub-module of the block)
            return f"up_blocks.{block_id}.upsamplers.0." + rest
        return f"up_blocks.{block_id}.attentions.{layer}." + rest
    return None


def _ldm_vae_key(key: str, num_levels: int = 4) -> Optional[str]:
    """One 'first_stage_model.'-stripped LDM VAE key -> diffusers key."""
    parts = key.split(".")

    def map_res(rest: str) -> str:
        return rest.replace("nin_shortcut", "conv_shortcut", 1)

    for side in ("encoder", "decoder"):
        if parts[0] != side:
            continue
        if parts[1] == "conv_in" or parts[1] == "conv_out":
            return key
        if parts[1] == "norm_out":
            return f"{side}.conv_norm_out." + ".".join(parts[2:])
        if parts[1] == "mid":
            rest = ".".join(parts[3:])
            if parts[2] == "block_1":
                return f"{side}.mid_block.resnets.0." + map_res(rest)
            if parts[2] == "block_2":
                return f"{side}.mid_block.resnets.1." + map_res(rest)
            if parts[2] == "attn_1":
                sub = parts[3]
                leaf = ".".join(parts[4:])
                return f"{side}.mid_block.attentions.0.{_LDM_VAE_ATTN_MAP[sub]}.{leaf}"
        if parts[1] == "down":
            i = int(parts[2])
            if parts[3] == "block":
                return f"encoder.down_blocks.{i}.resnets.{parts[4]}." + map_res(".".join(parts[5:]))
            if parts[3] == "downsample":
                return f"encoder.down_blocks.{i}.downsamplers.0." + ".".join(parts[4:])
        if parts[1] == "up":
            # LDM indexes decoder blocks high-res-first; diffusers/our decoder
            # index in processing order (low-res first)
            i = num_levels - 1 - int(parts[2])
            if parts[3] == "block":
                return f"decoder.up_blocks.{i}.resnets.{parts[4]}." + map_res(".".join(parts[5:]))
            if parts[3] == "upsample":
                return f"decoder.up_blocks.{i}.upsamplers.0." + ".".join(parts[4:])
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return key
    return None


def convert_ldm_checkpoint(sd: Dict[str, Any], layers_per_block: int = 2,
                           vae_levels: int = 4) -> Tuple[Dict, Dict, Dict]:
    """Split an original single-file SD checkpoint into (unet_sd, vae_sd,
    text_sd) in diffusers key format, feedable to the per-model converters.

    Covers the reference's FromSingleFileMixin surface (reference
    pipeline_interpolated_sd.py:283-289) for SD1.x-format checkpoints
    (CLIP text encoder under ``cond_stage_model.transformer.``,
    transformers naming passed through) AND SD2.x-format checkpoints
    (OpenCLIP ViT-H text tower under ``cond_stage_model.model.``,
    converted via :func:`convert_open_clip_text_state_dict` — the same
    mapper SDXL's bigG encoder uses — with the LAST resblock dropped:
    SD2.x conditions on the PENULTIMATE hidden state, and diffusers'
    single-file conversion realizes that by building a 23-layer
    transformers CLIPTextModel whose final_layer_norm is ln_final, so
    final-layer output == penultimate + ln_final). model_ema weights are
    ignored.
    """
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    if any(k.startswith("conditioner.embedders.") for k in sd):
        raise ValueError(
            "this is an SDXL-format single-file checkpoint; use "
            "convert_ldm_checkpoint_xl / load_single_file_pipeline (which "
            "auto-detects the layout)")

    unet_sd, vae_sd, text_sd, open_clip_sd = {}, {}, {}, {}
    for k, v in sd.items():
        if k.startswith("model_ema."):
            continue
        if k.startswith("model.diffusion_model."):
            nk = _ldm_unet_key(k[len("model.diffusion_model."):], layers_per_block)
            if nk is not None:
                unet_sd[nk] = v
        elif k.startswith("first_stage_model."):
            nk = _ldm_vae_key(k[len("first_stage_model."):], vae_levels)
            if nk is not None:
                # LDM VAE attention q/k/v/proj_out are 1x1 convs; our
                # attention is linear — squeeze to 2D
                w = _to_numpy(v)
                if ".attentions.0.to_" in nk and w.ndim == 4:
                    w = w.reshape(w.shape[0], w.shape[1])
                vae_sd[nk] = w
        elif k.startswith("cond_stage_model.transformer."):
            text_sd[k[len("cond_stage_model.transformer."):]] = v
        elif k.startswith("cond_stage_model.model."):
            open_clip_sd[k[len("cond_stage_model.model."):]] = v
    if open_clip_sd:
        text_sd = convert_open_clip_text_state_dict(open_clip_sd)
        # penultimate-layer conditioning: drop the last resblock, SD2.x's
        # text_projection is unused for conditioning
        layer_idxs = [int(k.split(".")[3]) for k in text_sd
                      if k.startswith("text_model.encoder.layers.")]
        if not layer_idxs:
            raise ValueError(
                "cond_stage_model.model.* present but no "
                "transformer.resblocks.* layers found — truncated or "
                "non-text OpenCLIP state dict in SD2.x checkpoint")
        last = max(layer_idxs)
        text_sd = {k: v for k, v in text_sd.items()
                   if not k.startswith(f"text_model.encoder.layers.{last}.")
                   and k != "text_projection.weight"}
    return unet_sd, vae_sd, text_sd


def convert_open_clip_text_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """OpenCLIP text-tower state dict -> transformers-format keys.

    SDXL single-file checkpoints carry the second (bigG) text encoder in
    original open_clip naming under ``conditioner.embedders.1.model.``
    (the layout FromSingleFileMixin converts in diffusers; reference
    pipeline_interpolated_sdxl.py:291-298). Maps resblocks -> encoder
    layers, splits the packed ``attn.in_proj_*`` into q/k/v, and
    transposes ``text_projection`` (open_clip applies ``pooled @ P`` with
    P (width, proj); transformers stores the Linear weight (proj, width)).
    Feed the result to :func:`convert_clip_text_state_dict`.
    """
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        w = _to_numpy(v)
        if k == "token_embedding.weight":
            out["text_model.embeddings.token_embedding.weight"] = w
        elif k == "positional_embedding":
            out["text_model.embeddings.position_embedding.weight"] = w
        elif k in ("ln_final.weight", "ln_final.bias"):
            out["text_model.final_layer_norm." + k.split(".")[1]] = w
        elif k == "text_projection":
            out["text_projection.weight"] = w.T
        elif k == "text_projection.weight":  # some exports use nn.Linear
            out["text_projection.weight"] = w
        elif k.startswith("transformer.resblocks."):
            parts = k.split(".")
            n, rest = parts[2], ".".join(parts[3:])
            prefix = f"text_model.encoder.layers.{n}."
            if rest in ("attn.in_proj_weight", "attn.in_proj_bias"):
                leaf = "weight" if rest.endswith("weight") else "bias"
                q, kk, vv = np.split(w, 3, axis=0)
                out[prefix + f"self_attn.q_proj.{leaf}"] = q
                out[prefix + f"self_attn.k_proj.{leaf}"] = kk
                out[prefix + f"self_attn.v_proj.{leaf}"] = vv
            elif rest.startswith("attn.out_proj."):
                out[prefix + "self_attn.out_proj." + rest.split(".")[-1]] = w
            elif rest.startswith("ln_1."):
                out[prefix + "layer_norm1." + rest.split(".")[-1]] = w
            elif rest.startswith("ln_2."):
                out[prefix + "layer_norm2." + rest.split(".")[-1]] = w
            elif rest.startswith("mlp.c_fc."):
                out[prefix + "mlp.fc1." + rest.split(".")[-1]] = w
            elif rest.startswith("mlp.c_proj."):
                out[prefix + "mlp.fc2." + rest.split(".")[-1]] = w
        # logit_scale / attn_mask buffers are dropped (inference-irrelevant)
    return out


def convert_ldm_checkpoint_xl(
    sd: Dict[str, Any], layers_per_block: int = 2, vae_levels: int = 4,
) -> Tuple[Dict, Dict, Dict, Dict]:
    """Split an original SDXL single-file checkpoint into (unet_sd, vae_sd,
    text_sd, text2_sd), each in diffusers/transformers key format.

    SDXL layout (reference FromSingleFileMixin on
    pipeline_interpolated_sdxl.py:291-298): UNet/VAE as in SD plus
    ``label_emb`` (-> add_embedding); text encoders under
    ``conditioner.embedders.0.transformer.`` (CLIP-L, transformers naming)
    and ``conditioner.embedders.1.model.`` (OpenCLIP bigG naming,
    converted via :func:`convert_open_clip_text_state_dict`).
    """
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    if not any(k.startswith("conditioner.embedders.") for k in sd):
        raise ValueError(
            "not an SDXL single-file checkpoint (no conditioner.embedders.*)")

    unet_sd, vae_sd, text_sd, open_clip_sd = {}, {}, {}, {}
    for k, v in sd.items():
        if k.startswith("model_ema."):
            continue
        if k.startswith("model.diffusion_model."):
            nk = _ldm_unet_key(k[len("model.diffusion_model."):], layers_per_block)
            if nk is not None:
                unet_sd[nk] = v
        elif k.startswith("first_stage_model."):
            nk = _ldm_vae_key(k[len("first_stage_model."):], vae_levels)
            if nk is not None:
                w = _to_numpy(v)
                if ".attentions.0.to_" in nk and w.ndim == 4:
                    w = w.reshape(w.shape[0], w.shape[1])
                vae_sd[nk] = w
        elif k.startswith("conditioner.embedders.0.transformer."):
            text_sd[k[len("conditioner.embedders.0.transformer."):]] = v
        elif k.startswith("conditioner.embedders.1.model."):
            open_clip_sd[k[len("conditioner.embedders.1.model."):]] = v
    text2_sd = convert_open_clip_text_state_dict(open_clip_sd)
    return unet_sd, vae_sd, text_sd, text2_sd


def merge_params(base: Dict, extra: Dict) -> Dict:
    """Deep-merge ``extra`` into a structural copy of ``base`` (e.g. IP
    weights into a converted UNet tree — the reference's load_ip_adapter
    step). Unmodified array leaves are shared, not copied."""
    out = _shallow_tree_copy(base)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                rec(dst[k], v)
            else:
                dst[k] = v

    rec(out, extra)
    return out


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors file (or all shards in a directory) as numpy."""
    from safetensors import safe_open

    files = [path]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
        )
    sd = {}
    for f in files:
        with safe_open(f, framework="numpy") as st:
            for k in st.keys():
                sd[k] = st.get_tensor(k)
    return sd


def convert_lpips_state_dict(sd: Dict[str, Any]) -> Dict:
    """torch ``lpips.LPIPS(net='vgg')`` checkpoint -> metrics.LPIPS params.

    torch keys: net.slice{1..5}.<idx>.weight/bias (VGG convs by sequential
    index) and lin{0..4}.model.1.weight (1x1 heads).
    """
    from aid_tpu.metrics.lpips import VGG16_STAGES

    # sequential index -> (stage, conv-in-stage)
    seq_to_pos = {}
    seq = 0
    for si, (ch, n_convs) in enumerate(VGG16_STAGES):
        for ci in range(n_convs):
            seq_to_pos[seq] = (si, ci)
            seq += 1  # conv
            seq += 1  # relu
        seq += 1  # maxpool

    tree: Dict = {}
    for k, v in sd.items():
        w = _to_numpy(v)
        if k.startswith("net.slice"):
            # the lpips wrapper's slices keep torchvision's GLOBAL sequential
            # indices (add_module by original index), which is what this maps;
            # a re-saved model with slice-local indices would silently collide,
            # so cross-check the slice number and fail loudly instead
            parts = k.split(".")
            slice_no = int(parts[1][len("slice"):])
            idx = int(parts[2])
            si, ci = seq_to_pos.get(idx, (None, None))
            if si != slice_no - 1:
                raise ValueError(
                    f"unexpected LPIPS key {k}: slice{slice_no} with "
                    f"non-global layer index {idx} (re-saved slice-local "
                    "checkpoint?)")
            name, w = _convert_leaf(parts[-1], w, "")
            _assign(tree, ("vgg", f"conv{si}_{ci}", name), w)
        elif k.startswith("lin"):
            si = int(k[3])
            _assign(tree, (f"lin{si}", "kernel"), w.transpose(2, 3, 1, 0))
    return {"params": tree}


def _shallow_tree_copy(tree):
    """Rebuild the dict structure while SHARING array leaves — merge
    operations replace a handful of leaves, so deep-copying a multi-GB
    UNet tree (the previous behavior) wasted seconds and doubled host RAM."""
    if isinstance(tree, dict):
        return {k: _shallow_tree_copy(v) for k, v in tree.items()}
    return tree


def _resolve_underscore_path(name: str, node) -> Optional[tuple]:
    """Resolve a kohya underscore-joined module name against the params
    tree by greedy longest-prefix matching at each level (no name table:
    the tree's own keys define the segmentation)."""
    path = []
    while name:
        if not isinstance(node, dict):
            return None
        matches = [k for k in node.keys() if name == k or name.startswith(k + "_")]
        if not matches:
            return None
        k = max(matches, key=len)
        path.append(k)
        node = node[k]
        name = name[len(k):].lstrip("_")
    return tuple(path)


def merge_lora(params: Dict, lora_state_dict: Dict[str, Any], scale: float = 1.0) -> Dict:
    """Merge LoRA weights into a converted UNet/text-encoder tree.

    The reference inherits LoRA loading from diffusers mixins (reference
    pipeline_interpolated_sd.py:283-289 FromSingleFileMixin/
    TextualInversionLoaderMixin family). Here LoRA pairs are merged into
    the base kernels at load time (W += scale * alpha/r * B @ A), which is
    exactly equivalent at inference and keeps the compiled program
    unchanged.

    Accepts diffusers/PEFT-format keys:
      <module path>.lora_A.weight (r, in) / <module path>.lora_B.weight (out, r)
      (also ``lora.down`` / ``lora.up`` and ``lora_down`` / ``lora_up``)
    and kohya-format keys (``lora_unet_<underscore_joined_path>.lora_down.
    weight``; the stem is resolved by a greedy longest-prefix walk of the
    params tree, so no name table is needed). Text-encoder keys
    (``text_encoder.*`` / ``lora_te*``) are skipped when merging into a
    UNet tree. Conv LoRAs (4-d down weights) are merged in HWIO layout.
    Optional per-module ``.alpha`` scalars rescale by alpha/r.
    """
    out = _shallow_tree_copy(params)

    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in lora_state_dict.items():
        k = key
        if k.startswith(("text_encoder.", "text_encoder_2.", "lora_te")):
            continue  # text-encoder LoRA: not part of this tree
        for pre in ("unet.", "base_model.model.", "lora_unet_"):
            if k.startswith(pre):
                k = k[len(pre):]
        k = k.replace(".lora.down.", ".lora_A.").replace(".lora.up.", ".lora_B.")
        k = k.replace(".lora_down.", ".lora_A.").replace(".lora_up.", ".lora_B.")
        if ".lora_A." in k:
            stem, role = k.split(".lora_A.")[0], "A"
        elif ".lora_B." in k:
            stem, role = k.split(".lora_B.")[0], "B"
        elif k.endswith(".alpha"):
            stem, role = k[: -len(".alpha")], "alpha"
        else:
            continue
        pairs.setdefault(stem, {})[role] = _to_numpy(value)

    for stem, d in pairs.items():
        if "A" not in d or "B" not in d:
            continue
        A, B = d["A"], d["B"]  # (r, in[, kh, kw]), (out, r[, 1, 1])
        r = A.shape[0]
        alpha = float(d.get("alpha", r))
        if "." in stem:
            path, _ = _torch_path_to_flax(stem.split(".") + ["weight"])
        else:  # kohya: underscore-joined module path
            path = _resolve_underscore_path(stem, params["params"])
            if path is None:
                raise KeyError(f"kohya LoRA target not found in params: {stem}")
        node = out["params"]
        try:
            for p in path:
                node = node[p]
        except KeyError:
            raise KeyError(f"LoRA target not found in params: {stem} -> {path}")
        kernel = node["kernel"]
        if A.ndim == 4:  # conv LoRA: A (r, in, kh, kw), B (out, r, 1, 1)
            kh, kw = A.shape[2], A.shape[3]
            delta = (B.reshape(B.shape[0], -1) @ A.reshape(r, -1)) * (scale * alpha / r)
            delta = delta.reshape(B.shape[0], A.shape[1], kh, kw)  # (out,in,kh,kw)
            node["kernel"] = kernel + delta.transpose(2, 3, 1, 0).astype(kernel.dtype)
        elif kernel.ndim == 2:  # linear: flax (in, out)
            delta = (B @ A) * (scale * alpha / r)  # (out, in) torch layout
            node["kernel"] = kernel + delta.transpose(1, 0).astype(kernel.dtype)
        else:  # conv 1x1 LoRA with 2-d factors: (out, in, 1, 1) -> HWIO
            delta = (B @ A) * (scale * alpha / r)
            node["kernel"] = kernel + delta.reshape(*delta.shape, 1, 1).transpose(2, 3, 1, 0).astype(kernel.dtype)
    return out


def load_textual_inversion(text_params: Dict, tokenizer, checkpoint, token: Optional[str] = None) -> Dict:
    """Load a textual-inversion embedding (reference TextualInversionLoaderMixin,
    pipeline_interpolated_sd.py:283-289).

    ``checkpoint``: dict in either diffusers format {token: (n, dim)} or
    A1111 format {'string_to_param': {'*': (n, dim)}, 'name': ...}, or a
    path to a .safetensors file containing one tensor.
    Appends rows to the token embedding table and registers the placeholder
    with the tokenizer (requires tokenizer.add_tokens). Returns
    (new_params, n_added) — rebuild the text encoder with vocab_size grown
    by n_added (flax nn.Embed validates the table against the config).
    """
    import os as _os

    name_hint = None
    if isinstance(checkpoint, str):
        name_hint = _os.path.splitext(_os.path.basename(checkpoint))[0]
        checkpoint = load_safetensors(checkpoint)

    if "string_to_param" in checkpoint:  # A1111 .pt layout
        embedding = _to_numpy(checkpoint["string_to_param"]["*"])
        token = token or checkpoint.get("name", name_hint or "<concept>")
    elif "emb_params" in checkpoint:  # A1111/civitai .safetensors layout
        embedding = _to_numpy(checkpoint["emb_params"])
        token = token or name_hint or "<concept>"
    elif token is not None and token in checkpoint:
        embedding = _to_numpy(checkpoint[token])
    elif len(checkpoint) == 1:
        # single-tensor file keyed by an arbitrary name: the tensor is the
        # embedding; the placeholder is the explicit token or the filename
        only_key = next(iter(checkpoint.keys()))
        embedding = _to_numpy(checkpoint[only_key])
        token = token or (name_hint or only_key)
    else:
        if token is None:
            token = next(iter(checkpoint.keys()))
        embedding = _to_numpy(checkpoint[token])
    if embedding.ndim == 1:
        embedding = embedding[None]

    out = _shallow_tree_copy(text_params)
    table = np.asarray(out["params"]["token_embedding"]["embedding"])
    n_new = embedding.shape[0]
    new_ids = list(range(table.shape[0], table.shape[0] + n_new))
    out["params"]["token_embedding"]["embedding"] = np.concatenate(
        [table, embedding.astype(table.dtype)], axis=0)
    tokenizer.add_tokens(token, new_ids)
    return out, n_new
