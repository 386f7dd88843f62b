"""torch→flax conversion: synthetic diffusers/transformers state dicts must
convert into exactly the flax param structure our modules initialize.

(diffusers itself is not installed here; the synthetic dicts are built by
inverting the documented layout rules, which independently cross-checks the
converter's path/transpose logic against flax's module structure.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.io import torch_convert as tc
from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
from sliders_conceptmod_tpu.models.vae import AutoencoderKL, VAEConfig

# containers whose flax segment `<name>_<i>` corresponds to torch `<name>.<i>`
_LIST_CONTAINERS = (
    "down_blocks",
    "up_blocks",
    "attentions",
    "resnets",
    "transformer_blocks",
    "downsamplers",
    "upsamplers",
    "net",
    "to_out",
    "layers",
)


def _flax_path_to_torch_key(path):
    parts = []
    for seg in path[:-1]:
        for cont in _LIST_CONTAINERS:
            if seg.startswith(cont + "_") and seg[len(cont) + 1 :].isdigit():
                parts.extend([cont, seg[len(cont) + 1 :]])
                break
        else:
            parts.append(seg)
    leaf = path[-1]
    if leaf in ("kernel", "scale", "embedding"):
        parts.append("weight")
    else:
        parts.append(leaf)
    return ".".join(parts)


def _tree_to_torch_sd(tree):
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        key = _flax_path_to_torch_key(path)
        arr = np.asarray(leaf)
        if path[-1] == "kernel" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif path[-1] == "kernel" and arr.ndim == 2:
            arr = arr.T
        sd[key] = arr
    return sd


def test_unet_roundtrip():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)), jnp.zeros((1, 7, 32))
    )["params"]

    sd = _tree_to_torch_sd(params)
    # keys look like diffusers keys
    assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q") for k in sd)
    assert "conv_in.weight" in sd and sd["conv_in.weight"].shape[0] == 32  # torch [out,in,kh,kw]

    converted = tc.convert_diffusers_state_dict(sd)
    assert tc.verify_tree_shapes(converted, params) == []
    # value fidelity through the double transpose
    np.testing.assert_allclose(
        converted["conv_in"]["kernel"], np.asarray(params["conv_in"]["kernel"]), atol=0
    )


def test_vae_roundtrip():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))["params"]
    sd = _tree_to_torch_sd(params)
    assert any(k.startswith("encoder.down_blocks.0.resnets.0.conv1") for k in sd)
    assert any(k.startswith("encoder.down_blocks.0.downsamplers.0.conv") for k in sd)
    converted = tc.convert_diffusers_state_dict(sd)
    assert tc.verify_tree_shapes(converted, params) == []


def test_clip_roundtrip():
    cfg = CLIPTextConfig.tiny(projection_dim=16)
    model = CLIPTextEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), dtype=jnp.int32))["params"]

    # build a transformers-style state dict by hand
    sd = {}
    sd["text_model.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["embedding"]
    )
    sd["text_model.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]["embedding"]
    )
    sd["text_model.embeddings.position_ids"] = np.arange(16)[None]  # buffer, must be ignored
    for i in range(cfg.num_hidden_layers):
        lp = params[f"layers_{i}"]
        pre = f"text_model.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{proj}.weight"] = np.asarray(lp["self_attn"][proj]["kernel"]).T
            sd[f"{pre}.self_attn.{proj}.bias"] = np.asarray(lp["self_attn"][proj]["bias"])
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{pre}.{ln}.weight"] = np.asarray(lp[ln]["scale"])
            sd[f"{pre}.{ln}.bias"] = np.asarray(lp[ln]["bias"])
        sd[f"{pre}.mlp.fc1.weight"] = np.asarray(lp["mlp_fc1"]["kernel"]).T
        sd[f"{pre}.mlp.fc1.bias"] = np.asarray(lp["mlp_fc1"]["bias"])
        sd[f"{pre}.mlp.fc2.weight"] = np.asarray(lp["mlp_fc2"]["kernel"]).T
        sd[f"{pre}.mlp.fc2.bias"] = np.asarray(lp["mlp_fc2"]["bias"])
    sd["text_model.final_layer_norm.weight"] = np.asarray(params["final_layer_norm"]["scale"])
    sd["text_model.final_layer_norm.bias"] = np.asarray(params["final_layer_norm"]["bias"])
    sd["text_projection.weight"] = np.asarray(params["text_projection"]["kernel"]).T

    converted = tc.convert_clip_text_state_dict(sd)
    assert tc.verify_tree_shapes(converted, params) == []
    np.testing.assert_allclose(
        converted["layers_0"]["self_attn"]["q_proj"]["kernel"],
        np.asarray(params["layers_0"]["self_attn"]["q_proj"]["kernel"]),
        atol=0,
    )


def test_tree_to_jax_bulk_path_matches_per_leaf():
    """The bulk chunk+carve transfer (tree_to_jax with bulk_min_bytes=0) must
    be bit-identical to the per-leaf path on a tree full of the converter's
    lazy transposed views — 2D linear .T views, 4D conv (2,3,1,0) views,
    contiguous biases, 0-d scalars, mixed fp16/fp32 sources — for both a
    bf16 target cast and dtype=None passthrough."""
    import jax

    rng = np.random.default_rng(7)
    tree = {
        "a": {
            # linear weight as the converter emits it: torch [out,in] -> .T view
            "kernel": np.transpose(rng.standard_normal((48, 32)).astype(np.float16)),
            "bias": rng.standard_normal((48,)).astype(np.float16),
        },
        "conv": {
            # conv kernel: torch OIHW -> (2,3,1,0) HWIO view
            "kernel": np.transpose(
                rng.standard_normal((24, 16, 3, 3)).astype(np.float16), (2, 3, 1, 0)
            ),
            "bias": rng.standard_normal((24,)).astype(np.float32),
        },
        "norm": {"scale": rng.standard_normal((32,)).astype(np.float32)},
        "scalar": np.asarray(rng.standard_normal(), np.float32),
        # a big leaf to span a chunk boundary when chunk size is tiny
        "big": rng.standard_normal((64, 64, 9)).astype(np.float16),
    }
    for dtype in (jnp.bfloat16, jnp.float32, None):
        bulk = tc.tree_to_jax(tree, dtype=dtype, bulk_min_bytes=0)
        ref = tc.tree_to_jax(tree, dtype=dtype, bulk_min_bytes=1 << 62)
        for b, r in zip(jax.tree.leaves(bulk), jax.tree.leaves(ref)):
            assert b.dtype == r.dtype and b.shape == r.shape
            np.testing.assert_array_equal(np.asarray(b), np.asarray(r))


def test_tree_to_jax_bulk_mixed_dtypes_and_views(monkeypatch):
    """The per-leaf bulk path reassembles transposed views and mixed source
    dtypes exactly (the finish program un-permutes + casts device-side)."""
    rng = np.random.default_rng(8)
    tree = {
        f"leaf{i}": np.transpose(rng.standard_normal((40, 30)).astype(np.float16))
        for i in range(5)
    }
    tree["huge"] = rng.standard_normal((5000,)).astype(np.float32)
    tree["conv"] = np.transpose(
        rng.standard_normal((8, 4, 3, 3)).astype(np.float16), (2, 3, 1, 0)
    )  # the OIHW->HWIO lazy view torch_entry_to_flax emits
    bulk = tc.tree_to_jax(tree, dtype=jnp.float32, bulk_min_bytes=0)
    for k, v in tree.items():
        np.testing.assert_allclose(
            np.asarray(bulk[k]), np.asarray(v, np.float32), atol=0
        )
