"""Single-file (original LDM) checkpoint conversion tests.

Reference surface: FromSingleFileMixin (pipeline_interpolated_sd.py:283-289).
Strategy: build an LDM-format dict from the tiny flax trees via an inverse
key map written HERE (non-circular vs the production mapping), run it
through convert_ldm_checkpoint + the standard converters, and require the
EXACT same tree as the subfolder-layout path.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DCondition, configs
from aid_tpu.models.params import (
    convert_clip_text_state_dict,
    convert_ldm_checkpoint,
    convert_unet_state_dict,
    convert_vae_state_dict,
)

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_params import _flax_to_torch  # noqa: E402

_RES_INV = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}


def _unet_diffusers_to_ldm(key: str, cfg) -> str:
    per = cfg.layers_per_block + 1
    lb = cfg.layers_per_block

    def inv_res(rest):
        head = rest.split(".")[0]
        return rest.replace(head, _RES_INV[head], 1) if head in _RES_INV else rest

    m = re.match(r"time_embedding\.linear_(\d)\.(.*)", key)
    if m:
        return f"time_embed.{(int(m.group(1)) - 1) * 2}.{m.group(2)}"
    if key.startswith("conv_in."):
        return "input_blocks.0.0." + key[len("conv_in."):]
    if key.startswith("conv_norm_out."):
        return "out.0." + key[len("conv_norm_out."):]
    if key.startswith("conv_out."):
        return "out.2." + key[len("conv_out."):]
    m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", key)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return f"input_blocks.{1 + b * per + l}.0.{inv_res(rest)}"
    m = re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", key)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return f"input_blocks.{1 + b * per + l}.1.{rest}"
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", key)
    if m:
        b = int(m.group(1))
        return f"input_blocks.{1 + b * per + lb}.0.op.{m.group(2)}"
    m = re.match(r"mid_block\.resnets\.(\d)\.(.*)", key)
    if m:
        return f"middle_block.{int(m.group(1)) * 2}.{inv_res(m.group(2))}"
    m = re.match(r"mid_block\.attentions\.0\.(.*)", key)
    if m:
        return f"middle_block.1.{m.group(1)}"
    m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", key)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return f"output_blocks.{b * per + l}.0.{inv_res(rest)}"
    m = re.match(r"up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", key)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return f"output_blocks.{b * per + l}.1.{rest}"
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", key)
    if m:
        b = int(m.group(1))
        # upsample is sub-module 2 when the block carries attention, else 1
        level = cfg.num_levels - 1 - b  # up block b mirrors this level
        j = 2 if cfg.cross_attention_levels[level] else 1
        return f"output_blocks.{b * per + lb}.{j}.conv.{m.group(2)}"
    raise KeyError(key)


def _vae_diffusers_to_ldm(key: str, num_levels: int):
    attn_inv = {"group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v",
                "to_out.0": "proj_out"}
    k = key.replace("conv_shortcut", "nin_shortcut")
    k = k.replace("conv_norm_out", "norm_out")
    m = re.match(r"(encoder|decoder)\.mid_block\.resnets\.(\d)\.(.*)", k)
    if m:
        return f"{m.group(1)}.mid.block_{int(m.group(2)) + 1}.{m.group(3)}", False
    m = re.match(r"(encoder|decoder)\.mid_block\.attentions\.0\.(to_out\.0|\w+)\.(.*)", k)
    if m:
        return f"{m.group(1)}.mid.attn_1.{attn_inv[m.group(2)]}.{m.group(3)}", True
    m = re.match(r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
    if m:
        return f"encoder.down.{m.group(1)}.block.{m.group(2)}.{m.group(3)}", False
    m = re.match(r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.(.*)", k)
    if m:
        return f"encoder.down.{m.group(1)}.downsample.{m.group(2)}", False
    m = re.match(r"decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
    if m:
        i = num_levels - 1 - int(m.group(1))
        return f"decoder.up.{i}.block.{m.group(2)}.{m.group(3)}", False
    m = re.match(r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.(.*)", k)
    if m:
        i = num_levels - 1 - int(m.group(1))
        return f"decoder.up.{i}.upsample.{m.group(2)}", False
    return k, False  # conv_in/out, norm_out, quant convs


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves_with_path(b)
    assert len(fa) == len(fb)
    for (pa, va), (pb, vb) in zip(sorted(fa, key=lambda t: str(t[0])),
                                  sorted(fb, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb), f"{pa} != {pb}"
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


class TestSingleFileConversion:
    def test_unet_matches_subfolder_path(self):
        cfg = configs.TINY_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        params = unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)))
        dsd = _flax_to_torch(params["params"])
        ldm = {"model.diffusion_model." + _unet_diffusers_to_ldm(k, cfg): v
               for k, v in dsd.items()}
        unet_sd, _, _ = convert_ldm_checkpoint(ldm, layers_per_block=cfg.layers_per_block)
        assert set(unet_sd.keys()) == set(dsd.keys())
        _tree_equal(convert_unet_state_dict(unet_sd), params)

    def test_vae_matches_subfolder_path(self):
        cfg = configs.TINY_VAE
        vae = AutoencoderKL(cfg)
        params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        dsd = _flax_to_torch(params["params"])
        n = len(cfg.block_out_channels)
        ldm = {}
        for k, v in dsd.items():
            nk, is_attn = _vae_diffusers_to_ldm(k, n)
            if is_attn and v.ndim == 2:  # LDM VAE attention is 1x1 conv
                v = v.reshape(*v.shape, 1, 1)
            ldm["first_stage_model." + nk] = v
        _, vae_sd, _ = convert_ldm_checkpoint(ldm, vae_levels=n)
        assert set(vae_sd.keys()) == set(dsd.keys())
        _tree_equal(convert_vae_state_dict(vae_sd), params)

    def test_text_encoder_and_ema_skip(self):
        cfg = configs.TINY_CLIP_TEXT
        model = CLIPTextModel(cfg)
        params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 16), jnp.int32))
        sd = {}
        for k, v in _flax_to_torch(params["params"]).items():
            if "token_embedding" in k or "position_embedding" in k:
                k = "embeddings." + k
            elif k.startswith("layers."):
                k = "encoder." + k
            sd["cond_stage_model.transformer.text_model." + k] = v
        sd["model_ema.decay"] = np.float32(0.999)  # must be ignored
        _, _, text_sd = convert_ldm_checkpoint(sd)
        converted = convert_clip_text_state_dict(text_sd)
        ids = jnp.array([[1, 5, 2, 2]])
        a, _, _ = model.apply(params, ids)
        b, _, _ = model.apply(converted, ids)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_state_dict_unwrap(self):
        inner = {"model.diffusion_model.out.0.weight": np.ones(3, np.float32)}
        unet_sd, _, _ = convert_ldm_checkpoint({"state_dict": inner})
        assert "conv_norm_out.weight" in unet_sd


def _openclip_inverse(hf_sd):
    """transformers-format text-encoder keys -> original open_clip naming
    (inverse of convert_open_clip_text_state_dict, written independently)."""
    import collections

    out = {}
    packed = collections.defaultdict(dict)
    for k, v in hf_sd.items():
        if k == "token_embedding.weight":
            out["token_embedding.weight"] = v
        elif k == "position_embedding.weight":
            out["positional_embedding"] = v
        elif k.startswith("final_layer_norm."):
            out["ln_final." + k.split(".")[-1]] = v
        elif k == "text_projection.weight":
            out["text_projection"] = v.T
        else:
            m = re.match(r"layers\.(\d+)\.(.*)", k)
            assert m, k
            n, rest = m.group(1), m.group(2)
            pre = f"transformer.resblocks.{n}."
            qkv = re.match(r"self_attn\.([qkv])_proj\.(weight|bias)", rest)
            if qkv:
                packed[(n, qkv.group(2))][qkv.group(1)] = v
            elif rest.startswith("self_attn.out_proj."):
                out[pre + "attn.out_proj." + rest.split(".")[-1]] = v
            elif rest.startswith("layer_norm1."):
                out[pre + "ln_1." + rest.split(".")[-1]] = v
            elif rest.startswith("layer_norm2."):
                out[pre + "ln_2." + rest.split(".")[-1]] = v
            elif rest.startswith("mlp.fc1."):
                out[pre + "mlp.c_fc." + rest.split(".")[-1]] = v
            elif rest.startswith("mlp.fc2."):
                out[pre + "mlp.c_proj." + rest.split(".")[-1]] = v
            else:
                raise KeyError(k)
    for (n, leaf), parts in packed.items():
        out[f"transformer.resblocks.{n}.attn.in_proj_{leaf}"] = np.concatenate(
            [parts["q"], parts["k"], parts["v"]], axis=0)
    return out


class TestSingleFileXL:
    """SDXL single-file layout (VERDICT r3 missing #4; reference
    FromSingleFileMixin on pipeline_interpolated_sdxl.py:291-298)."""

    def _xl_text_cfg(self, projection_dim=None, act="quick_gelu"):
        import dataclasses as dc

        return dc.replace(configs.TINY_CLIP_TEXT, projection_dim=projection_dim,
                          hidden_act=act)

    def test_full_checkpoint_roundtrip(self):
        from aid_tpu.models.params import convert_ldm_checkpoint_xl

        cfg = configs.TINY_SDXL_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        added = {"text_embeds": jnp.zeros((1, 24)), "time_ids": jnp.zeros((1, 6))}
        uparams = unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)), None, added)
        vcfg = configs.TINY_VAE
        vae = AutoencoderKL(vcfg)
        vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        text1 = CLIPTextModel(self._xl_text_cfg())
        t1params = text1.init(jax.random.PRNGKey(2), jnp.zeros((1, 16), jnp.int32))
        text2 = CLIPTextModel(self._xl_text_cfg(projection_dim=24, act="gelu"))
        t2params = text2.init(jax.random.PRNGKey(3), jnp.zeros((1, 16), jnp.int32))

        sd = {"model_ema.decay": np.float32(0.999)}  # must be ignored
        for k, v in _flax_to_torch(uparams["params"]).items():
            m = re.match(r"add_embedding\.linear_(\d)\.(.*)", k)
            nk = (f"label_emb.0.{(int(m.group(1)) - 1) * 2}.{m.group(2)}"
                  if m else _unet_diffusers_to_ldm(k, cfg))
            sd["model.diffusion_model." + nk] = v
        n = len(vcfg.block_out_channels)
        for k, v in _flax_to_torch(vparams["params"]).items():
            nk, is_attn = _vae_diffusers_to_ldm(k, n)
            if is_attn and v.ndim == 2:
                v = v.reshape(*v.shape, 1, 1)
            sd["first_stage_model." + nk] = v
        for k, v in _flax_to_torch(t1params["params"]).items():
            if "token_embedding" in k or "position_embedding" in k:
                k = "embeddings." + k
            elif k.startswith("layers."):
                k = "encoder." + k
            sd["conditioner.embedders.0.transformer.text_model." + k] = v
        for k, v in _openclip_inverse(_flax_to_torch(t2params["params"])).items():
            sd["conditioner.embedders.1.model." + k] = v
        sd["conditioner.embedders.1.model.logit_scale"] = np.float32(4.6)  # dropped

        unet_sd, vae_sd, text_sd, text2_sd = convert_ldm_checkpoint_xl(
            sd, layers_per_block=cfg.layers_per_block, vae_levels=n)
        _tree_equal(convert_unet_state_dict(unet_sd), uparams)
        _tree_equal(convert_vae_state_dict(vae_sd), vparams)

        ids = jnp.array([[1, 5, 2, 2]])
        a1, _, _ = text1.apply(t1params, ids)
        b1, _, _ = text1.apply(convert_clip_text_state_dict(text_sd), ids)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), rtol=1e-6)
        a2, ap, _ = text2.apply(t2params, ids)
        b2, bp, _ = text2.apply(convert_clip_text_state_dict(text2_sd), ids)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=1e-6)
        # pooled path exercises the transposed text_projection
        np.testing.assert_allclose(np.asarray(ap), np.asarray(bp), rtol=1e-6)

    def test_sd_converter_redirects_xl(self):
        with pytest.raises(ValueError, match="SDXL"):
            convert_ldm_checkpoint(
                {"conditioner.embedders.0.transformer.x": np.zeros(2)})


class TestSingleFileSD2:
    """SD2.x single-file layout (VERDICT r4 next #5): OpenCLIP ViT-H text
    tower under cond_stage_model.model.*, converted via the same mapper as
    SDXL's bigG encoder, with the LAST resblock dropped (penultimate-layer
    conditioning) and text_projection discarded."""

    def test_openclip_text_tower_roundtrip_with_penultimate_drop(self):
        import dataclasses as dc

        cfg = dc.replace(configs.TINY_CLIP_TEXT, hidden_act="gelu")
        model = CLIPTextModel(cfg)  # the 2-layer model we expect AFTER conversion
        params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 16), jnp.int32))

        oc = _openclip_inverse(_flax_to_torch(params["params"]))
        # the original checkpoint has one MORE resblock (the final layer the
        # conversion must drop) plus a text_projection it must discard
        n_layers = cfg.num_hidden_layers
        rng = np.random.default_rng(0)
        for leaf in ("weight", "bias"):
            for sub in (f"attn.in_proj_{leaf}",):
                ref = oc[f"transformer.resblocks.0.{sub}"]
                oc[f"transformer.resblocks.{n_layers}.{sub}"] = rng.normal(
                    size=ref.shape).astype(np.float32)
        for sub in ("attn.out_proj.weight", "attn.out_proj.bias",
                    "ln_1.weight", "ln_1.bias", "ln_2.weight", "ln_2.bias",
                    "mlp.c_fc.weight", "mlp.c_fc.bias",
                    "mlp.c_proj.weight", "mlp.c_proj.bias"):
            ref = oc[f"transformer.resblocks.0.{sub}"]
            oc[f"transformer.resblocks.{n_layers}.{sub}"] = rng.normal(
                size=ref.shape).astype(np.float32)
        oc["text_projection"] = rng.normal(
            size=(cfg.hidden_size, cfg.hidden_size)).astype(np.float32)
        oc["logit_scale"] = np.float32(4.6)

        sd = {"cond_stage_model.model." + k: v for k, v in oc.items()}
        sd["model_ema.decay"] = np.float32(0.999)  # must be ignored
        _, _, text_sd = convert_ldm_checkpoint(sd)
        assert "text_projection.weight" not in text_sd
        assert not any(f".layers.{n_layers}." in k for k in text_sd)

        converted = convert_clip_text_state_dict(text_sd)
        ids = jnp.array([[1, 5, 2, 2]])
        a, _, _ = model.apply(params, ids)
        b, _, _ = model.apply(converted, ids)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_v_prediction_heuristic(self):
        from aid_tpu.models.loader import infer_single_file_prediction_type

        assert infer_single_file_prediction_type(1024, 875_000) == "v_prediction"
        assert infer_single_file_prediction_type(1024, 220_000) == "epsilon"
        assert infer_single_file_prediction_type(1024, None) == "epsilon"
        assert infer_single_file_prediction_type(768, 875_000) == "epsilon"

    def test_resolve_prediction_type_precedence(self, tmp_path):
        """Explicit arg > sidecar scheduler config > global_step heuristic
        (loader.resolve_single_file_prediction_type)."""
        import json as _json
        import warnings

        from aid_tpu.models.loader import resolve_single_file_prediction_type

        d = str(tmp_path)
        # explicit always wins, even over a pinning sidecar
        sched_dir = tmp_path / "scheduler"
        sched_dir.mkdir()
        (sched_dir / "scheduler_config.json").write_text(
            _json.dumps({"prediction_type": "epsilon"}))
        assert resolve_single_file_prediction_type(
            d, "v_prediction", 1024, None) == "v_prediction"
        # a pinning sidecar defers to load_scheduler (returns None), and
        # suppresses the heuristic + the undetectable-SD2.x warning
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert resolve_single_file_prediction_type(
                d, None, 1024, None) is None
        # a sidecar WITHOUT prediction_type does not pin: heuristic applies
        (sched_dir / "scheduler_config.json").write_text(
            _json.dumps({"_class_name": "DDIMScheduler"}))
        assert resolve_single_file_prediction_type(
            d, None, 1024, 875_000) == "v_prediction"
        # no sidecar at all: heuristic
        assert resolve_single_file_prediction_type(
            str(tmp_path / "nosuch"), None, 1024, 875_000) == "v_prediction"
        assert resolve_single_file_prediction_type(
            str(tmp_path / "nosuch"), None, 768, None) == "epsilon"

    def test_resolve_prediction_type_warns_undetectable_sd2(self, tmp_path):
        """SD2.x (cross_dim=1024) bare safetensors (no global_step, no
        sidecar) is undetectable: warn and default to epsilon; SD1.x must
        stay silent."""
        import warnings

        from aid_tpu.models.loader import resolve_single_file_prediction_type

        with pytest.warns(UserWarning, match="v-objective"):
            got = resolve_single_file_prediction_type(
                str(tmp_path), None, 1024, None)
        assert got == "epsilon"
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert resolve_single_file_prediction_type(
                str(tmp_path), None, 768, None) == "epsilon"

    def test_apply_prediction_type_both_scheduler_layouts(self):
        """Nested-config schedulers AND the EDM solver (direct field —
        a hasattr-config guard alone silently dropped the pin there)."""
        from aid_tpu.models.loader import apply_prediction_type
        from aid_tpu.schedulers.ddim import DDIMScheduler
        from aid_tpu.schedulers.edm_dpm import EDMDPMSolverScheduler

        d = apply_prediction_type(DDIMScheduler(), "v_prediction")
        assert d.config.prediction_type == "v_prediction"
        e = apply_prediction_type(EDMDPMSolverScheduler(), "v_prediction")
        assert e.prediction_type == "v_prediction"

    def test_openclip_converter_rejects_truncated_text_tower(self):
        """cond_stage_model.model.* present but no resblocks: a truncated
        or non-text OpenCLIP state dict must fail loudly, not max() on an
        empty sequence (params.py guard)."""
        with pytest.raises(ValueError, match="truncated or"):
            convert_ldm_checkpoint({
                "model.diffusion_model.x": np.zeros(2),
                "cond_stage_model.model.token_embedding.weight":
                    np.zeros((4, 8), np.float32),
            })

    def test_xl_converter_rejects_sd(self):
        from aid_tpu.models.params import convert_ldm_checkpoint_xl

        with pytest.raises(ValueError, match="conditioner"):
            convert_ldm_checkpoint_xl(
                {"cond_stage_model.transformer.x": np.zeros(2)})
