"""LDM single-file checkpoint key mapping (io/ldm_convert.py)."""

import numpy as np
import pytest

from sliders_conceptmod_tpu.io import ldm_convert as lc


@pytest.mark.parametrize(
    "ldm,expected",
    [
        ("time_embed.0.weight", "time_embedding.linear_1.weight"),
        ("time_embed.2.bias", "time_embedding.linear_2.bias"),
        ("input_blocks.0.0.weight", "conv_in.weight"),
        ("input_blocks.1.0.in_layers.2.weight", "down_blocks.0.resnets.0.conv1.weight"),
        ("input_blocks.2.0.emb_layers.1.weight", "down_blocks.0.resnets.1.time_emb_proj.weight"),
        (
            "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        ),
        ("input_blocks.3.0.op.weight", "down_blocks.0.downsamplers.0.conv.weight"),
        ("input_blocks.4.0.skip_connection.weight", "down_blocks.1.resnets.0.conv_shortcut.weight"),
        ("middle_block.0.out_layers.3.weight", "mid_block.resnets.0.conv2.weight"),
        ("middle_block.1.proj_in.weight", "mid_block.attentions.0.proj_in.weight"),
        ("middle_block.2.in_layers.0.weight", "mid_block.resnets.1.norm1.weight"),
        ("output_blocks.0.0.in_layers.2.weight", "up_blocks.0.resnets.0.conv1.weight"),
        ("output_blocks.2.1.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"),
        (
            "output_blocks.3.1.transformer_blocks.0.attn2.to_k.weight",
            "up_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        ),
        ("out.0.weight", "conv_norm_out.weight"),
        ("out.2.weight", "conv_out.weight"),
    ],
)
def test_unet_key_mapping(ldm, expected):
    assert lc._rename_unet_key(ldm) == expected


def test_downsampler_op_special_case():
    # "op" is the conv itself in LDM; the mapped tail keeps working through
    # torch_entry_to_flax because 'conv.op.weight' — adjust: mapping must
    # produce 'conv.weight'
    mapped = lc._rename_unet_key("input_blocks.3.0.op.weight")
    # accept either exact diffusers name or the op-tail variant the converter
    # strips later
    assert "down_blocks.0.downsamplers.0.conv" in mapped


@pytest.mark.parametrize(
    "ldm,expected,squeeze",
    [
        ("encoder.conv_in.weight", "encoder.conv_in.weight", False),
        ("encoder.down.0.block.1.nin_shortcut.weight", "encoder.down_blocks.0.resnets.1.conv_shortcut.weight", False),
        ("encoder.down.1.downsample.conv.weight", "encoder.down_blocks.1.downsamplers.0.conv.weight", False),
        ("encoder.mid.block_1.conv1.weight", "encoder.mid_block.resnets.0.conv1.weight", False),
        ("encoder.mid.attn_1.q.weight", "encoder.mid_block.attentions.0.to_q.weight", True),
        ("encoder.mid.attn_1.norm.weight", "encoder.mid_block.attentions.0.group_norm.weight", False),
        ("encoder.norm_out.weight", "encoder.conv_norm_out.weight", False),
        # decoder up indices reversed: LDM up.0 == diffusers up_blocks.3
        ("decoder.up.0.block.0.conv1.weight", "decoder.up_blocks.3.resnets.0.conv1.weight", False),
        ("decoder.up.3.upsample.conv.weight", "decoder.up_blocks.0.upsamplers.0.conv.weight", False),
        ("quant_conv.weight", "quant_conv.weight", False),
    ],
)
def test_vae_key_mapping(ldm, expected, squeeze):
    mapped, sq = lc._rename_vae_key(ldm)
    assert mapped == expected
    assert sq == squeeze


def test_full_convert_smoke():
    sd = {
        "model.diffusion_model.time_embed.0.weight": np.zeros((1280, 320), np.float32),
        "model.diffusion_model.input_blocks.0.0.weight": np.zeros((320, 4, 3, 3), np.float32),
        "first_stage_model.encoder.mid.attn_1.q.weight": np.zeros((512, 512, 1, 1), np.float32),
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": np.zeros((768,), np.float32),
    }
    out = lc.convert_ldm_checkpoint(sd)
    assert out["unet"]["time_embedding"]["linear_1"]["kernel"].shape == (320, 1280)
    assert out["unet"]["conv_in"]["kernel"].shape == (3, 3, 4, 320)
    # VAE attention 1x1 conv squeezed to Linear layout
    assert out["vae"]["encoder"]["mid_block"]["attentions_0"]["to_q"]["kernel"].shape == (512, 512)
    assert out["text_encoder"]["final_layer_norm"]["scale"].shape == (768,)


def _openclip_sd_from_hf(hf_sd, n_layers):
    """Inverse-map a transformers CLIPText state dict into the OpenCLIP
    on-disk layout SD2 checkpoints use (fused qkv, ln_1/ln_2, c_fc/c_proj)."""
    oc = {
        "token_embedding.weight": hf_sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": hf_sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf_sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf_sd["text_model.final_layer_norm.bias"],
        "text_projection": hf_sd["text_projection.weight"].T,
        "logit_scale": np.float32(4.6),
    }
    for i in range(n_layers):
        src = f"text_model.encoder.layers.{i}."
        dst = f"transformer.resblocks.{i}."
        oc[dst + "attn.in_proj_weight"] = np.concatenate(
            [hf_sd[src + f"self_attn.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")], axis=0
        )
        oc[dst + "attn.in_proj_bias"] = np.concatenate(
            [hf_sd[src + f"self_attn.{n}.bias"] for n in ("q_proj", "k_proj", "v_proj")], axis=0
        )
        oc[dst + "attn_mask"] = np.zeros((4, 4), np.float32)
        for a, b in (
            ("attn.out_proj", "self_attn.out_proj"),
            ("ln_1", "layer_norm1"),
            ("ln_2", "layer_norm2"),
            ("mlp.c_fc", "mlp.fc1"),
            ("mlp.c_proj", "mlp.fc2"),
        ):
            oc[dst + a + ".weight"] = hf_sd[src + b + ".weight"]
            oc[dst + a + ".bias"] = hf_sd[src + b + ".bias"]
    return oc


def test_openclip_text_tower_roundtrip():
    """convert_openclip_text_state_dict(inverse(hf_sd)) == the HF conversion —
    validates the SD2 text-tower mapping leaf-for-leaf against the HF path
    that tests/test_hf_parity.py already proves numerically correct."""
    pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import torch

    from sliders_conceptmod_tpu.io.torch_convert import (
        convert_clip_text_state_dict,
        convert_openclip_text_state_dict,
    )

    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(
        transformers.CLIPTextConfig(
            vocab_size=99,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            max_position_embeddings=16,
            projection_dim=16,
        )
    )
    hf_sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    expected = convert_clip_text_state_dict(hf_sd)

    got = convert_openclip_text_state_dict(_openclip_sd_from_hf(hf_sd, 3))

    import jax as _jax

    e = {_jax.tree_util.keystr(p): v for p, v in _jax.tree_util.tree_flatten_with_path(expected)[0]}
    g = {_jax.tree_util.keystr(p): v for p, v in _jax.tree_util.tree_flatten_with_path(got)[0]}
    assert set(e) == set(g)
    for k in e:
        np.testing.assert_array_equal(e[k], g[k], err_msg=k)

    # penultimate-layer deployment trims trailing blocks (SD2 keeps 23/24)
    trimmed = convert_openclip_text_state_dict(_openclip_sd_from_hf(hf_sd, 3), max_layers=2)
    assert "layers_2" not in trimmed
    assert "layers_1" in trimmed


def test_full_convert_routes_openclip_tower():
    sd = {
        "cond_stage_model.model.ln_final.weight": np.ones((8,), np.float32),
        "cond_stage_model.model.ln_final.bias": np.zeros((8,), np.float32),
        "cond_stage_model.model.token_embedding.weight": np.zeros((9, 8), np.float32),
        "cond_stage_model.model.positional_embedding": np.zeros((4, 8), np.float32),
        "cond_stage_model.model.transformer.resblocks.0.ln_1.weight": np.ones((8,), np.float32),
        "cond_stage_model.model.transformer.resblocks.0.ln_1.bias": np.zeros((8,), np.float32),
    }
    out = lc.convert_ldm_checkpoint(sd)
    te = out["text_encoder"]
    assert te["final_layer_norm"]["scale"].shape == (8,)
    assert te["token_embedding"]["embedding"].shape == (9, 8)
    assert te["layers_0"]["layer_norm1"]["scale"].shape == (8,)


def test_ldm_export_roundtrip():
    """export (io/ldm_export) → convert (io/ldm_convert) reproduces every
    leaf bit-for-bit across UNet + OpenCLIP text tower + VAE — a loss-free
    round trip through the entire LDM key mapping."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from sliders_conceptmod_tpu.models.unet import UNetConfig, UNet2DConditionModel
    from sliders_conceptmod_tpu.models.vae import AutoencoderKL, VAEConfig

    ucfg = dataclasses.replace(UNetConfig.tiny(), layers_per_block=2)
    unet = UNet2DConditionModel(ucfg)
    up = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)), jnp.zeros((1, 5, 32))
    )["params"]
    te = CLIPTextEncoder(CLIPTextConfig.tiny())
    tp = te.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))["params"]
    vae = AutoencoderKL(VAEConfig.tiny())
    vp = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 3, 16, 16)))["params"]

    sd = le.export_ldm_checkpoint(up, tp, vp)
    trees = lc.convert_ldm_checkpoint(sd)

    from jax.tree_util import keystr, tree_flatten_with_path

    for name, original in (("unet", up), ("text_encoder", tp), ("vae", vp)):
        exp = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(original)[0]}
        got = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(trees[name])[0]}
        missing, extra = set(exp) - set(got), set(got) - set(exp)
        assert not missing and not extra, f"{name}: missing={sorted(missing)[:4]} extra={sorted(extra)[:4]}"
        for k in exp:
            np.testing.assert_array_equal(exp[k], got[k], err_msg=f"{name} {k}")


def test_ldm_export_roundtrip_sd1_text_layout():
    """v2=False export writes the transformers layout
    (cond_stage_model.transformer.*) and round-trips bit-exactly."""
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

    te = CLIPTextEncoder(CLIPTextConfig.tiny(projection_dim=16))
    tp = te.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))["params"]
    sd = le.export_clip_text(tp)
    assert all(k.startswith("cond_stage_model.transformer.") for k in sd)
    trees = lc.convert_ldm_checkpoint(sd)

    from jax.tree_util import keystr, tree_flatten_with_path

    exp = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(tp)[0]}
    got = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(trees["text_encoder"])[0]}
    assert set(exp) == set(got), (sorted(set(exp) - set(got))[:4], sorted(set(got) - set(exp))[:4])
    for k in exp:
        np.testing.assert_array_equal(exp[k], got[k], err_msg=k)


def test_sdxl_single_file_roundtrip():
    """SDXL SGM layout (conditioner.embedders.{0,1}, label_emb add-embedding)
    round-trips bit-exactly through export_sdxl_checkpoint -> convert."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from sliders_conceptmod_tpu.models.unet import UNetConfig, UNet2DConditionModel

    ucfg = dataclasses.replace(UNetConfig.tiny_xl(), layers_per_block=2)
    unet = UNet2DConditionModel(ucfg)
    added = {"text_embeds": jnp.zeros((1, 32)), "time_ids": jnp.zeros((1, 6))}
    up = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 8, 8)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, 32)),
        added_cond_kwargs=added,
    )["params"]
    te1 = CLIPTextEncoder(CLIPTextConfig.tiny(hidden_size=16))
    tp1 = te1.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))["params"]
    te2 = CLIPTextEncoder(CLIPTextConfig.tiny(hidden_size=16, projection_dim=32))
    tp2 = te2.init(jax.random.PRNGKey(2), jnp.zeros((1, 77), jnp.int32))["params"]

    sd = le.export_sdxl_checkpoint(up, tp1, tp2)
    assert any(k.startswith("model.diffusion_model.label_emb.0.0.") for k in sd)
    trees = lc.convert_ldm_checkpoint(sd)

    from jax.tree_util import keystr, tree_flatten_with_path

    for name, original in (("unet", up), ("text_encoder", tp1), ("text_encoder_2", tp2)):
        exp = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(original)[0]}
        got = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(trees[name])[0]}
        missing, extra = set(exp) - set(got), set(got) - set(exp)
        assert not missing and not extra, f"{name}: missing={sorted(missing)[:4]} extra={sorted(extra)[:4]}"
        for k in exp:
            np.testing.assert_array_equal(exp[k], got[k], err_msg=f"{name} {k}")


def test_sd3_single_file_roundtrip():
    """SD3 SGM layout (joint_blocks, fused qkv, adaLN swaps) round-trips
    bit-exactly through export_sd3_checkpoint -> convert."""
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel

    cfg = MMDiTConfig.tiny()
    model = SD3Transformer2DModel(cfg)
    mp = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, 8, 8)),
        jnp.zeros((1,)),
        jnp.zeros((1, 2, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)),
    )["params"]
    te1 = CLIPTextEncoder(CLIPTextConfig.tiny(hidden_size=16, projection_dim=16))
    tp1 = te1.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))["params"]

    sd = le.export_sd3_checkpoint(mp, tp1)
    assert any(k.startswith("model.diffusion_model.joint_blocks.0.x_block.attn.qkv") for k in sd)
    trees = lc.convert_ldm_checkpoint(sd)

    from jax.tree_util import keystr, tree_flatten_with_path

    for name, original in (("transformer", mp), ("text_encoder", tp1)):
        exp = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(original)[0]}
        got = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(trees[name])[0]}
        missing, extra = set(exp) - set(got), set(got) - set(exp)
        assert not missing and not extra, f"{name}: missing={sorted(missing)[:4]} extra={sorted(extra)[:4]}"
        for k in exp:
            np.testing.assert_array_equal(exp[k], got[k], err_msg=f"{name} {k}")


def test_flux_bfl_single_file_roundtrip():
    """BFL flux1-dev layout (double/single blocks, fused qkv(+mlp) linears,
    img_/txt_ streams) round-trips bit-exactly."""
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models import flux as flux_mod

    cfg = flux_mod.FluxConfig.tiny()
    model = flux_mod.FluxTransformer2DModel(cfg)
    img_ids = jnp.asarray(flux_mod.prepare_latent_image_ids(4, 4))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, cfg.in_channels)),
        jnp.asarray([0.5]),
        jnp.zeros((1, 2, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)),
        jnp.zeros((2, 3)),
        img_ids,
    )["params"]

    sd = le.export_flux_bfl(params)
    assert any(k.startswith("double_blocks.0.img_attn.qkv") for k in sd)
    assert any(k.startswith("single_blocks.0.linear1") for k in sd)
    trees = lc.convert_ldm_checkpoint(sd)

    from jax.tree_util import keystr, tree_flatten_with_path

    exp = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(params)[0]}
    got = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(trees["transformer"])[0]}
    missing, extra = set(exp) - set(got), set(got) - set(exp)
    assert not missing and not extra, (sorted(missing)[:4], sorted(extra)[:4])
    for k in exp:
        np.testing.assert_array_equal(exp[k], got[k], err_msg=k)
