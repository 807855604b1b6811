"""Weight-converter tests: synthetic diffusers/transformers-format state
dicts (correct names + torch shape conventions) -> flax trees that load into
the models and change outputs accordingly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DCondition, configs
from aid_tpu.models.params import (
    convert_clip_text_state_dict,
    convert_ip_adapter_state_dict,
    convert_lpips_state_dict,
    convert_torch_state_dict,
    convert_unet_state_dict,
    merge_params,
    unet_attention_order,
)


def _flax_to_torch(tree, prefix=""):
    """Inverse mapping: flax params -> diffusers-style torch state dict.
    Used to build synthetic checkpoints for roundtrip testing."""
    sd = {}
    for k, v in tree.items():
        name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            sd.update(_flax_to_torch(v, name))
        else:
            w = np.asarray(v)
            leaf = k
            if k == "kernel":
                if w.ndim == 4:
                    w = w.transpose(3, 2, 0, 1)
                else:
                    w = w.transpose(1, 0)
                leaf = "weight"
            elif k == "scale":
                leaf = "weight"
            elif k == "embedding":
                leaf = "weight"
            torch_name = name.rsplit(".", 1)[0] + "." + leaf
            # undo module-name flattening back to diffusers dotted form
            torch_name = (
                torch_name
                .replace("net_0_proj", "net.0.proj")
                .replace("net_2", "net.2")
                .replace("to_out_0", "to_out.0")
                .replace("mlp_fc", "mlp.fc")
            )
            import re

            torch_name = re.sub(r"transformer_blocks_(\d+)", r"transformer_blocks.\1", torch_name)
            torch_name = re.sub(r"layers_(\d+)", r"layers.\1", torch_name)
            torch_name = re.sub(
                r"(down_blocks|up_blocks)_(\d+)_(resnets|attentions|downsamplers|upsamplers)_(\d+)",
                r"\1.\2.\3.\4", torch_name)
            torch_name = re.sub(r"mid_block_(resnets|attentions)_(\d+)", r"mid_block.\1.\2", torch_name)
            # VAE nested mid block: mid_block.attentions_0 -> mid_block.attentions.0
            torch_name = re.sub(r"mid_block\.(resnets|attentions)_(\d+)", r"mid_block.\1.\2", torch_name)
            sd[torch_name] = w
    return sd


class TestUNetRoundtrip:
    def test_roundtrip_exact(self):
        cfg = configs.TINY_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        params = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        sd = _flax_to_torch(params["params"])
        # sanity: the synthetic dict uses diffusers-style dotted names
        assert any(k.startswith("down_blocks.0.resnets.0.norm1") for k in sd)
        assert any("transformer_blocks.0.attn1.to_q.weight" in k for k in sd)
        assert any("ff.net.0.proj.weight" in k for k in sd)

        converted = convert_unet_state_dict(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(converted)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                      sorted(flat_b, key=lambda t: str(t[0]))):
            assert str(pa) == str(pb), f"{pa} != {pb}"
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_converted_params_run(self):
        cfg = configs.TINY_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        params = unet.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        converted = convert_unet_state_dict(_flax_to_torch(params["params"]))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, s, s, 4))
        e = jax.random.normal(jax.random.PRNGKey(3), (2, 7, cfg.cross_attention_dim))
        a = unet.apply(params, x, jnp.array(5), e)
        b = unet.apply(converted, x, jnp.array(5), e)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestVAERoundtrip:
    def test_roundtrip_exact_and_runs(self):
        """VAE conversion must produce the NESTED mid_block tree the flax
        module uses (mid_block/attentions_0), not the UNet's flat naming —
        a real diffusers VAE checkpoint exercises exactly these keys."""
        from aid_tpu.models import AutoencoderKL
        from aid_tpu.models.params import convert_vae_state_dict

        cfg = configs.TINY_VAE
        vae = AutoencoderKL(cfg)
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        sd = _flax_to_torch(params["params"])
        assert any(k.startswith("encoder.mid_block.attentions.0.to_q") for k in sd)
        assert any(k.startswith("decoder.up_blocks.0.resnets.0") for k in sd)

        converted = convert_vae_state_dict(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(converted)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                      sorted(flat_b, key=lambda t: str(t[0]))):
            assert str(pa) == str(pb), f"{pa} != {pb}"
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, cfg.latent_channels))
        a = vae.apply(params, x, method=AutoencoderKL.decode)
        b = vae.apply(converted, x, method=AutoencoderKL.decode)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestCLIPTextConversion:
    def test_transformers_style_keys(self):
        cfg = configs.TINY_CLIP_TEXT
        model = CLIPTextModel(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7), jnp.int32))
        p = params["params"]
        rng = np.random.default_rng(0)

        sd = {
            "text_model.embeddings.token_embedding.weight": np.asarray(p["token_embedding"]["embedding"]),
            "text_model.embeddings.position_embedding.weight": np.asarray(p["position_embedding"]["embedding"]),
            "text_model.final_layer_norm.weight": np.asarray(p["final_layer_norm"]["scale"]),
            "text_model.final_layer_norm.bias": np.asarray(p["final_layer_norm"]["bias"]),
        }
        for i in range(cfg.num_hidden_layers):
            lp = p[f"layers_{i}"]
            base = f"text_model.encoder.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{base}.self_attn.{proj}.weight"] = np.asarray(lp["self_attn"][proj]["kernel"]).T
                sd[f"{base}.self_attn.{proj}.bias"] = np.asarray(lp["self_attn"][proj]["bias"])
            for ln in ("layer_norm1", "layer_norm2"):
                sd[f"{base}.{ln}.weight"] = np.asarray(lp[ln]["scale"])
                sd[f"{base}.{ln}.bias"] = np.asarray(lp[ln]["bias"])
            sd[f"{base}.mlp.fc1.weight"] = np.asarray(lp["mlp_fc1"]["kernel"]).T
            sd[f"{base}.mlp.fc1.bias"] = np.asarray(lp["mlp_fc1"]["bias"])
            sd[f"{base}.mlp.fc2.weight"] = np.asarray(lp["mlp_fc2"]["kernel"]).T
            sd[f"{base}.mlp.fc2.bias"] = np.asarray(lp["mlp_fc2"]["bias"])

        converted = convert_clip_text_state_dict(sd)
        ids = jnp.array([[1, 4, 9, 2, 2, 2, 2]])
        a, _, _ = model.apply(params, ids)
        b, _, _ = model.apply(converted, ids)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestIPAdapterConversion:
    def test_layer_order_and_merge(self):
        cfg = configs.TINY_UNET_IP
        order = unet_attention_order(cfg)
        # TINY_UNET_IP: level0 cross (1 layer/block -> 1 down attn), mid, 2 up
        assert order[0][0].startswith("down_blocks_0_attentions_0")
        assert any(p[0] == "mid_block_attentions_0" for p in order)

        rng = np.random.default_rng(0)
        inner = cfg.block_out_channels[0] // cfg.num_attention_heads[0] * cfg.num_attention_heads[0]
        sd = {
            "image_proj": {
                "proj.weight": rng.normal(size=(cfg.ip_num_tokens * cfg.cross_attention_dim, cfg.ip_hidden_dim)).astype(np.float32),
                "proj.bias": np.zeros(cfg.ip_num_tokens * cfg.cross_attention_dim, np.float32),
                "norm.weight": np.ones(cfg.cross_attention_dim, np.float32),
                "norm.bias": np.zeros(cfg.cross_attention_dim, np.float32),
            },
            "ip_adapter": {},
        }
        for li, path in enumerate(order):
            # channel dim per attention layer differs by level; use the block channel
            level_ch = cfg.block_out_channels[0] if "down" in path[0] or path[0].startswith("up_blocks_1") else cfg.block_out_channels[-1]
            for proj in ("to_k_ip", "to_v_ip"):
                sd["ip_adapter"][f"{2 * li + 1}.{proj}.weight"] = rng.normal(
                    size=(level_ch, cfg.cross_attention_dim)).astype(np.float32)

        ip_tree, image_proj = convert_ip_adapter_state_dict(sd, order)
        assert "proj" in image_proj["params"] and "norm" in image_proj["params"]
        # merging into a UNet tree places kernels at the right paths
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        params = unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        merged = merge_params(params, ip_tree)
        for path in order:
            node = merged["params"]
            for pp in path:
                node = node[pp]
            assert node["to_k_ip"]["kernel"].shape[0] == cfg.cross_attention_dim

    def test_sd15_attention_order_pins_diffusers_layout(self):
        """Non-circular pin of the diffusers attn_processors enumeration for
        the SD1.5 config: down blocks, then UP blocks, then mid LAST. torch
        registers children by attribute ASSIGNMENT order and diffusers
        UNet2DConditionModel.__init__ assigns the empty up_blocks ModuleList
        before mid_block, so named_children() — the order that defines
        h94/IP-Adapter checkpoint key indices 1,3,...,31 — is down/up/mid.
        The first up-block attn2 must directly follow the last down-block
        one, and the mid block must map to checkpoint index 31."""
        order = unet_attention_order(configs.SD15_UNET)
        expected = []
        for level in range(3):  # cross levels 0-2; level 3 has no attention
            for j in range(2):  # layers_per_block
                expected.append((f"down_blocks_{level}_attentions_{j}",
                                 "transformer_blocks_0", "attn2"))
        for up in (1, 2, 3):  # up_blocks_0 mirrors level 3 (no attention)
            for j in range(3):  # layers_per_block + 1
                expected.append((f"up_blocks_{up}_attentions_{j}",
                                 "transformer_blocks_0", "attn2"))
        expected.append(("mid_block_attentions_0", "transformer_blocks_0", "attn2"))
        assert order == expected
        assert len(order) == 16  # checkpoint idx 2*i+1 -> mid at 31


class TestLPIPSConversion:
    def test_vgg_slice_mapping(self):
        rng = np.random.default_rng(0)
        sd = {}
        # build a full torch-lpips-style dict with global sequential indices
        from aid_tpu.metrics.lpips import VGG16_STAGES

        seq = 0
        in_ch = 3
        for si, (ch, n_convs) in enumerate(VGG16_STAGES):
            for ci in range(n_convs):
                sd[f"net.slice{si + 1}.{seq}.weight"] = rng.normal(size=(ch, in_ch, 3, 3)).astype(np.float32)
                sd[f"net.slice{si + 1}.{seq}.bias"] = np.zeros(ch, np.float32)
                in_ch = ch
                seq += 2
            seq += 1
        for si, (ch, _) in enumerate(VGG16_STAGES):
            sd[f"lin{si}.model.1.weight"] = rng.normal(size=(1, ch, 1, 1)).astype(np.float32)

        params = convert_lpips_state_dict(sd)
        from aid_tpu.metrics import LPIPS

        model = LPIPS()
        x = jnp.zeros((2, 32, 32, 3))
        ref = model.init(jax.random.PRNGKey(0), x, x)
        want_paths = {str(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
        # converted tree has no biases for lin heads; compare conv paths only
        got_paths = {str(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
        assert got_paths <= want_paths
        missing = {p for p in want_paths - got_paths}
        assert all("lin" in p and "bias" in p or False for p in missing) or not missing

        d = model.apply(params, x, x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


class TestLoRAMerge:
    def test_merge_changes_target_kernels_only(self):
        from aid_tpu.models.params import merge_lora

        cfg = configs.TINY_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        params = unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        inner = cfg.block_out_channels[0]
        rng = np.random.default_rng(0)
        r = 4
        sd = {
            "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
                rng.normal(size=(r, inner)).astype(np.float32),
            "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
                rng.normal(size=(inner, r)).astype(np.float32),
        }
        merged = merge_lora(params, sd, scale=0.5)
        base_k = params["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
        new_k = merged["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
        A, B = sd[list(sd)[0]], sd[list(sd)[1]]
        want = np.asarray(base_k) + 0.5 * (B @ A).T  # alpha defaults to r
        np.testing.assert_allclose(np.asarray(new_k), want, rtol=1e-5)
        # untouched kernel unchanged
        other_a = params["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
        other_b = merged["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
        np.testing.assert_array_equal(np.asarray(other_a), np.asarray(other_b))

    def test_alpha_rescaling(self):
        from aid_tpu.models.params import merge_lora

        cfg = configs.TINY_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        params = unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        inner = cfg.block_out_channels[-1]  # mid block channels
        rng = np.random.default_rng(1)
        r = 4
        stem = "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0"
        sd = {
            f"{stem}.lora_A.weight": rng.normal(size=(r, inner)).astype(np.float32),
            f"{stem}.lora_B.weight": rng.normal(size=(inner, r)).astype(np.float32),
            f"{stem}.alpha": np.float32(8.0),
        }
        merged = merge_lora(params, sd, scale=1.0)
        base = params["params"]["mid_block_attentions_0"]["transformer_blocks_0"]["attn2"]["to_out_0"]["kernel"]
        new = merged["params"]["mid_block_attentions_0"]["transformer_blocks_0"]["attn2"]["to_out_0"]["kernel"]
        A, B = sd[f"{stem}.lora_A.weight"], sd[f"{stem}.lora_B.weight"]
        want = np.asarray(base) + (8.0 / r) * (B @ A).T
        np.testing.assert_allclose(np.asarray(new), want, rtol=1e-5)


class TestLoRAKohyaAndConv:
    """Review r3c: kohya-format keys (underscore stems), conv LoRAs, and
    text-encoder key skipping."""

    def _unet_params(self):
        cfg = configs.TINY_UNET
        unet = UNet2DCondition(cfg)
        s = cfg.sample_size
        return cfg, unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)), jnp.array(0),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )

    def test_kohya_keys_merge(self):
        from aid_tpu.models.params import merge_lora

        cfg, params = self._unet_params()
        inner = cfg.block_out_channels[0]
        rng = np.random.default_rng(1)
        r = 4
        stem = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        sd = {
            f"{stem}.lora_down.weight": rng.normal(size=(r, inner)).astype(np.float32),
            f"{stem}.lora_up.weight": rng.normal(size=(inner, r)).astype(np.float32),
            f"{stem}.alpha": np.float32(2.0),
            # text-encoder LoRA keys must be skipped, not crash
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight":
                rng.normal(size=(r, 8)).astype(np.float32),
            "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight":
                rng.normal(size=(8, r)).astype(np.float32),
        }
        merged = merge_lora(params, sd, scale=1.0)
        base = params["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
        new = merged["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
        A = sd[f"{stem}.lora_down.weight"]
        B = sd[f"{stem}.lora_up.weight"]
        want = np.asarray(base) + (2.0 / r) * (B @ A).T
        np.testing.assert_allclose(np.asarray(new), want, rtol=1e-5)

    def test_conv_lora_4d_factors(self):
        from aid_tpu.models.params import merge_lora

        cfg, params = self._unet_params()
        node = params["params"]["down_blocks_0_resnets_0"]["conv1"]
        kh, kw, cin, cout = np.asarray(node["kernel"]).shape
        rng = np.random.default_rng(2)
        r = 2
        A = rng.normal(size=(r, cin, kh, kw)).astype(np.float32)
        B = rng.normal(size=(cout, r, 1, 1)).astype(np.float32)
        sd = {
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": A,
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": B,
        }
        merged = merge_lora(params, sd, scale=1.0)
        delta = (B.reshape(cout, r) @ A.reshape(r, -1)).reshape(cout, cin, kh, kw)
        want = np.asarray(node["kernel"]) + delta.transpose(2, 3, 1, 0)
        np.testing.assert_allclose(
            np.asarray(merged["params"]["down_blocks_0_resnets_0"]["conv1"]["kernel"]),
            want, rtol=1e-4)

    def test_merge_shares_untouched_leaves(self):
        """No deepcopy: unmodified leaves must be the SAME array objects."""
        from aid_tpu.models.params import merge_lora

        cfg, params = self._unet_params()
        inner = cfg.block_out_channels[0]
        r = 2
        sd = {
            "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
                np.zeros((r, inner), np.float32),
            "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
                np.zeros((inner, r), np.float32),
        }
        merged = merge_lora(params, sd)
        a = params["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
        b = merged["params"]["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
        assert a is b


class TestTextualInversionFormats:
    def _text_params(self, dim=16, vocab=32):
        return {"params": {"token_embedding": {"embedding": np.zeros((vocab, dim), np.float32)}}}

    class _Tok:
        def __init__(self):
            self.added = []

        def add_tokens(self, token, ids):
            self.added.append((token, ids))

    def test_emb_params_layout_with_token(self):
        from aid_tpu.models.params import load_textual_inversion

        tok = self._Tok()
        ckpt = {"emb_params": np.ones((2, 16), np.float32)}
        out, n = load_textual_inversion(self._text_params(), tok, ckpt,
                                        token="easynegative")
        assert n == 2
        assert tok.added == [("easynegative", [32, 33])]
        assert out["params"]["token_embedding"]["embedding"].shape == (34, 16)

    def test_single_unknown_key_uses_token(self):
        from aid_tpu.models.params import load_textual_inversion

        tok = self._Tok()
        ckpt = {"whatever_key": np.ones((1, 16), np.float32)}
        out, n = load_textual_inversion(self._text_params(), tok, ckpt,
                                        token="<trigger>")
        assert n == 1 and tok.added == [("<trigger>", [32])]
