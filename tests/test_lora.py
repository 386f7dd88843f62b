"""LoRA overlay: site selection / key schema / merge math / checkpoint I/O.

Parity targets cited per-test against reference conceptmod/textsliders/lora.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig


@pytest.fixture(scope="module")
def sd15_param_shapes():
    """Full SD1.5 UNet param *structure* via eval_shape (no compute)."""
    cfg = UNetConfig.sd15()
    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((1, 4, 64, 64))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, 768))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), sample, t, ctx))
    return variables["params"]


@pytest.fixture(scope="module")
def tiny_params():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((1, 4, 16, 16))
    variables = model.init(jax.random.PRNGKey(0), sample, jnp.zeros((1,)), jnp.zeros((1, 7, 32)))
    return variables["params"]


def test_sd15_attention_site_count_and_names(sd15_param_shapes):
    """SD1.5 has 16 Transformer2DModel blocks -> 32 Attention modules -> 128
    adapted Linears for target ["Attention"], train_method full
    (reference defaults, lora.py:30,149-151)."""
    sites = lora.create_sites(sd15_param_shapes, rank=4, train_method="full")
    assert len(sites) == 128
    names = {s.lora_name for s in sites}
    # spot-check exact reference key names (schema lora.py:239-240)
    assert "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q" in names
    assert "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_out_0" in names
    assert "lora_unet_up_blocks_3_attentions_2_transformer_blocks_0_attn2_to_v" in names
    # all names follow the prefix + underscore-path schema
    assert all(n.startswith("lora_unet_") for n in names)


def test_train_method_filters(sd15_param_shapes):
    """Filters operate on parent module names — reference lora.py:207-238."""
    all_sites = lora.create_sites(sd15_param_shapes, train_method="full")
    xattn = lora.create_sites(sd15_param_shapes, train_method="xattn")
    selfattn = lora.create_sites(sd15_param_shapes, train_method="selfattn")
    noxattn = lora.create_sites(sd15_param_shapes, train_method="noxattn")
    strict = lora.create_sites(sd15_param_shapes, train_method="xattn-strict")

    assert all("attn2" in s.lora_name for s in xattn)
    assert all("attn1" in s.lora_name for s in selfattn)
    assert len(xattn) + len(selfattn) == len(all_sites)
    assert all("attn2" not in s.lora_name for s in noxattn)
    # xattn-strict drops to_out (child contains "out", lora.py:230-232)
    assert all("to_out" not in s.lora_name for s in strict)
    assert len(strict) == len(xattn) - len([s for s in xattn if "to_out" in s.lora_name])


def test_c3lier_conv_sites(sd15_param_shapes):
    """c3lier adds ResnetBlock2D/Downsample2D/Upsample2D convs
    (reference lora.py:19-26); conv rank is clamped to min(rank,in,out)
    (lora.py:104-106)."""
    sites = lora.create_sites(
        sd15_param_shapes,
        rank=4,
        target_replace=lora.UNET_TARGET_REPLACE_MODULE_TRANSFORMER
        + lora.UNET_TARGET_REPLACE_MODULE_CONV,
        train_method="noxattn",
    )
    names = {s.lora_name for s in sites}
    assert "lora_unet_down_blocks_0_resnets_0_conv1" in names
    assert "lora_unet_down_blocks_0_downsamplers_0_conv" in names
    assert "lora_unet_up_blocks_0_upsamplers_0_conv" in names
    assert "lora_unet_down_blocks_0_resnets_0_time_emb_proj" in names
    # shortcut convs exist only where channels change
    assert "lora_unet_down_blocks_1_resnets_0_conv_shortcut" in names
    conv_sites = [s for s in sites if s.kind == "conv"]
    assert conv_sites and all(s.rank == 4 for s in conv_sites)


def test_noxattn_hspace_last(sd15_param_shapes):
    """Only mid_block resnets.1 conv2 (reference lora.py:236-238)."""
    sites = lora.create_sites(
        sd15_param_shapes,
        target_replace=lora.UNET_TARGET_REPLACE_MODULE_CONV,
        train_method="noxattn-hspace-last",
    )
    assert [s.lora_name for s in sites] == ["lora_unet_mid_block_resnets_1_conv2"]


def test_merge_matches_explicit_lora_forward(tiny_params):
    """merged-W forward == base forward + up(down(x))·mult·(α/r)
    (reference LoRAModule.forward, lora.py:134-138)."""
    sites = lora.create_sites(tiny_params, rank=2, alpha=4.0, train_method="full")
    key = jax.random.PRNGKey(3)
    lp = lora.init_lora_params(key, sites)
    # give up-weights nonzero values so the test is non-trivial
    lp = jax.tree.map(lambda x: x + 0.01, lp)

    site = sites[0]
    kernel_path = site.module_path + ("kernel",)

    def get(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    W = get(tiny_params, kernel_path)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, W.shape[0]))
    mult = 0.7

    merged = lora.merge_lora_params(tiny_params, sites, lp, mult)
    Wm = get(merged, kernel_path)

    leaf = lp[site.lora_name]
    expected = x @ W + mult * (site.alpha / site.rank) * ((x @ leaf["down"]) @ leaf["up"])
    np.testing.assert_allclose(np.asarray(x @ Wm), np.asarray(expected), atol=1e-5)

    # multiplier 0 == identity (teacher branch, reference lora.py:299-301)
    merged0 = lora.merge_lora_params(tiny_params, sites, lp, 0.0)
    np.testing.assert_allclose(np.asarray(get(merged0, kernel_path)), np.asarray(W), atol=0)


def test_save_load_roundtrip_and_torch_layout(tmp_path, tiny_params):
    """Exported keys/layouts follow reference lora.py:274-291 conventions."""
    sites = lora.create_sites(
        tiny_params,
        rank=2,
        alpha=1.0,
        target_replace=["Attention", "ResnetBlock2D"],
        train_method="full",
    )
    lp = lora.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda x: x + 0.5, lp)

    path = tmp_path / "slider.safetensors"
    lora.save_weights(str(path), sites, lp)

    from safetensors.numpy import load_file

    sd = load_file(str(path))
    for site in sites:
        down = sd[f"{site.lora_name}.lora_down.weight"]
        up = sd[f"{site.lora_name}.lora_up.weight"]
        alpha = sd[f"{site.lora_name}.alpha"]
        assert alpha.shape == ()
        if site.kind == "dense":
            assert down.shape == (site.rank, site.in_dim)
            assert up.shape == (site.out_dim, site.rank)
        else:
            kh, kw = site.kernel_size
            assert down.shape == (site.rank, site.in_dim, kh, kw)
            assert up.shape == (site.out_dim, site.rank, 1, 1)

    lp2 = lora.load_weights(str(path), sites)
    for name in lp:
        np.testing.assert_allclose(np.asarray(lp[name]["down"]), np.asarray(lp2[name]["down"]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(lp[name]["up"]), np.asarray(lp2[name]["up"]), atol=1e-7)


def test_init_statistics():
    """down: kaiming_uniform(a=1) bound sqrt(3/fan_in); up: zeros
    (reference lora.py:122-124)."""
    site = lora.LoRASite(("m",), "lora_unet_m", "dense", 8, 1.0, 256, 128)
    lp = lora.init_lora_params(jax.random.PRNGKey(0), [site])
    down = np.asarray(lp["lora_unet_m"]["down"])
    up = np.asarray(lp["lora_unet_m"]["up"])
    bound = (3.0 / 256) ** 0.5
    assert np.abs(down).max() <= bound
    assert np.abs(down).max() > 0.5 * bound
    assert np.all(up == 0)
