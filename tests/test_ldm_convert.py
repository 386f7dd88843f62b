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
