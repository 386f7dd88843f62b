"""In-framework consumption of text-encoder (notrigger) sliders.

Closes the loop the reference delegates to diffusers/PEFT loaders: train a
notrigger slider → combine (combine_loras.py:26-62) → apply inside OUR
CLIP encoders at generation time (VERDICT r2 task 1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.adapters import slider_file as sfile
from sliders_conceptmod_tpu.cli.combine_loras import combine
from sliders_conceptmod_tpu.models import factory


def _fake_part(keys, r=2, din=4, dout=6, alpha=1.0):
    sd = {}
    rng = np.random.default_rng(0)
    for k in keys:
        sd[f"{k}.lora_down.weight"] = rng.normal(size=(r, din)).astype(np.float32)
        sd[f"{k}.lora_up.weight"] = rng.normal(size=(dout, r)).astype(np.float32)
        sd[f"{k}.alpha"] = np.asarray(alpha, np.float32)
    return sd


def test_split_parts_combined_roundtrip(tmp_path):
    """combine (reference renames) → split_parts recovers canonical keys with
    per-part strength folded into the down factors (combine_loras.py:57-60)."""
    from safetensors.numpy import save_file

    unet_sd = _fake_part(["lora_unet-transformer_blocks-0-attn-to_q"])
    te1_sd = _fake_part(["lora_te1_text_model_encoder_layers_0_self_attn_q_proj"])
    te2_sd = _fake_part(["lora_te2_text_model_encoder_layers_0_self_attn_k_proj"])
    p_unet, p_te1, p_te2 = (str(tmp_path / f"{n}.safetensors") for n in ("u", "e1", "e2"))
    save_file(unet_sd, p_unet)
    save_file(te1_sd, p_te1)
    save_file(te2_sd, p_te2)
    out = str(tmp_path / "combined.safetensors")
    combine(p_unet, p_te1, p_te2, out, unet_strength=0.5, enc_strength=2.0, enc2_strength=3.0)

    parts = sfile.split_parts(sfile.read_tensors(out))
    assert set(parts) == {"unet", "te1", "te2"}
    # unet: transformer./_A/_B rename is inverted exactly
    k = "lora_unet-transformer_blocks-0-attn-to_q"
    np.testing.assert_allclose(
        parts["unet"][f"{k}.lora_down.weight"], 0.5 * unet_sd[f"{k}.lora_down.weight"]
    )
    np.testing.assert_allclose(
        parts["unet"][f"{k}.lora_up.weight"], unet_sd[f"{k}.lora_up.weight"]
    )
    # te2: combined-file lora_te3_ rename maps back to the te2 slot
    k2 = "lora_te2_text_model_encoder_layers_0_self_attn_k_proj"
    np.testing.assert_allclose(
        parts["te2"][f"{k2}.lora_down.weight"], 3.0 * te2_sd[f"{k2}.lora_down.weight"]
    )
    np.testing.assert_allclose(parts["te2"][f"{k2}.alpha"], te2_sd[f"{k2}.alpha"])


def test_split_parts_xl_unet_passthrough(tmp_path):
    """'_'-delimited XL unet keys pass through our combiner unmangled
    (documented deviation: the reference rename corrupts 'down_blocks')."""
    from safetensors.numpy import save_file

    unet_sd = _fake_part(["lora_unet_down_blocks_0_attn1_to_q"])
    te = _fake_part(["lora_te1_text_model_encoder_layers_0_self_attn_q_proj"])
    p1, p2, p3 = (str(tmp_path / f"{n}.safetensors") for n in ("u", "e1", "e2"))
    save_file(unet_sd, p1)
    save_file(te, p2)
    save_file(_fake_part(["lora_te2_text_model_encoder_layers_0_self_attn_v_proj"]), p3)
    out = str(tmp_path / "combined.safetensors")
    combine(p1, p2, p3, out, unet_strength=0.25)
    parts = sfile.split_parts(sfile.read_tensors(out))
    k = "lora_unet_down_blocks_0_attn1_to_q"
    assert f"{k}.lora_down.weight" in parts["unet"]
    np.testing.assert_allclose(
        parts["unet"][f"{k}.lora_down.weight"], 0.25 * unet_sd[f"{k}.lora_down.weight"]
    )


def test_split_parts_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unrecognized slider key"):
        sfile.split_parts({"bogus.weight": np.zeros(2, np.float32)})


@pytest.fixture(scope="module")
def tiny_xl():
    return factory.load_models_xl("tiny-xl", weight_dtype=jnp.float32)


def test_te_merge_matches_reference_forward_formula(tiny_xl):
    """Merged te kernel == W + mult·(α/r)·down∘up — the reference LoRA
    forward y = Wx + mult·(α/r)·up(down(x)) (lora.py:134-138) folded into
    the weight (exact for Linear)."""
    _, text_encoders, _, _ = tiny_xl
    te = text_encoders[0]
    sites = lora_lib.create_sites(
        te.params,
        rank=2,
        alpha=1.0,
        target_replace=["CLIPAttention", "CLIPSdpaAttention"],
        prefix="lora_te1",
        train_method="full",
        name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
    )
    assert sites, "tiny-xl CLIP tower produced no te sites"
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    # zero-init up gives zero delta — randomize so the test has teeth
    lp = {
        k: {"down": v["down"], "up": jax.random.normal(jax.random.PRNGKey(1), v["up"].shape) * 0.1}
        for k, v in lp.items()
    }
    part_sd = lora_lib.state_dict_numpy(sites, lp)
    tep = sfile.load_te_part(te.params, part_sd, index=0)
    mult = 1.7
    merged = tep.merged_params(te.params, mult)

    site = tep.sites[0]
    base_kernel = te.params
    merged_kernel = merged
    for seg in site.module_path + ("kernel",):
        base_kernel = base_kernel[seg]
        merged_kernel = merged_kernel[seg]
    leaf = tep.lora_params[site.lora_name]
    expected = base_kernel + mult * site.scale * (np.asarray(leaf["down"]) @ np.asarray(leaf["up"]))
    np.testing.assert_allclose(np.asarray(merged_kernel), np.asarray(expected), rtol=1e-5, atol=1e-6)
    # multiplier 0 is exactly the base encoder
    merged0 = tep.merged_params(te.params, 0.0)
    k0 = merged0
    for seg in site.module_path + ("kernel",):
        k0 = k0[seg]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(base_kernel))


def test_te_slider_shifts_embeddings(tiny_xl):
    """A te slider merged at ±1 moves the EMPTY prompt's embedding — the
    notrigger mechanism (reference train_notrigger.py:296-334)."""
    _, text_encoders, _, _ = tiny_xl
    te = text_encoders[0]
    sites = lora_lib.create_sites(
        te.params, rank=2, alpha=1.0,
        target_replace=["CLIPAttention", "CLIPSdpaAttention"],
        prefix="lora_te1", train_method="full",
        name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = {
        k: {"down": v["down"], "up": jax.random.normal(jax.random.PRNGKey(2), v["up"].shape) * 0.2}
        for k, v in lp.items()
    }
    part_sd = lora_lib.state_dict_numpy(sites, lp)
    tep = sfile.load_te_part(te.params, part_sd, index=0)
    ids = jnp.asarray(te.tokenizer([""]))
    base = te.model.apply({"params": te.params}, ids).hidden_states[-1]
    plus = te.model.apply({"params": tep.merged_params(te.params, 1.0)}, ids).hidden_states[-1]
    minus = te.model.apply({"params": tep.merged_params(te.params, -1.0)}, ids).hidden_states[-1]
    assert float(jnp.abs(plus - base).max()) > 1e-4
    assert float(jnp.abs(plus - minus).max()) > 1e-4


def _write_notrigger_config(tmp_path, iterations=12, lr=1.0):
    cfg = f"""
prompts_file: "data/prompts-tiny.yaml"
pretrained_model:
  name_or_path: "tiny-xl"
network:
  type: "lierla"
  rank: 2
  alpha: 1.0
  training_method: "full"
train:
  precision: "float32"
  noise_scheduler: "euler_a"
  iterations: {iterations}
  lr: {lr}
  optimizer: "sgd"
  lr_scheduler: "constant_with_warmup"
  max_denoising_steps: 4
save:
  name: "nt_tiny"
  path: "{tmp_path}/nt"
  per_steps: 1000
  precision: "float32"
logging:
  verbose: false
tpu:
  seed: 0
"""
    p = tmp_path / "config-nt.yaml"
    p.write_text(cfg)
    return str(p)


def test_notrigger_train_combine_generate_e2e(tmp_path):
    """The full loop VERDICT r2 asks for: train tiny notrigger sliders for
    both CLIP towers → combine with a (zero) unet slider → generate through
    OUR sampler — scale ±1 must produce measurably different images, and
    the difference must come from the TEXT-ENCODER parts alone (unet part
    is all-zero up factors ⇒ zero unet delta)."""
    from safetensors.numpy import save_file
    from sliders_conceptmod_tpu.cli import train_notrigger as nt_cli
    from sliders_conceptmod_tpu.cli import generate_images_xl as gen_cli
    from sliders_conceptmod_tpu.core import config as config_util

    cfg_path = _write_notrigger_config(tmp_path)

    # train te1 and te2 sliders (tiny budget, boosted lr so the drift is visible)
    for idx in (0, 1):
        config = config_util.load_config_from_yaml(cfg_path)
        nt_cli.train(
            config, positive="smiling", negative="frowning",
            clip_index=idx, rank=2, model="tiny",
        )
    te1_path = str(tmp_path / "nt" / "nt_tiny_0_last.safetensors")
    te2_path = str(tmp_path / "nt" / "nt_tiny_1_last.safetensors")

    # zero unet slider: up factors init to zero ⇒ unet delta is exactly 0
    _, _, unet, _ = factory.load_models_xl("tiny-xl", weight_dtype=jnp.float32)
    usites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    up = lora_lib.init_lora_params(jax.random.PRNGKey(0), usites)
    unet_path = str(tmp_path / "unet_zero.safetensors")
    save_file(lora_lib.state_dict_numpy(usites, up), unet_path)

    combined = str(tmp_path / "combined_alpha1_rank2_full.safetensors")
    combine(unet_path, te1_path, te2_path, combined, unet_strength=1.0)

    # prompts CSV (reference schema: case_number,prompt,evaluation_seed)
    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text("case_number,prompt,evaluation_seed,concept\n0,a person,42,person\n")

    save_path = str(tmp_path / "out")
    args = gen_cli.build_parser().parse_args(
        [
            "--model_name", combined,
            "--prompts_path", str(csv_path),
            "--save_path", save_path,
            "--base", "tiny-xl",
            "--image_size", "64",
            "--num_samples", "1",
            "--ddim_steps", "2",
            "--start_noise", "2000",  # slider on from step 0
            "--scales=-1,1",
        ]
    )
    gen_cli.run(args)

    from PIL import Image

    name = "combined_alpha1_rank2_full.safetensors"
    img_m = np.asarray(Image.open(f"{save_path}/{name}/-1.0/0_0.png"), np.float32)
    img_p = np.asarray(Image.open(f"{save_path}/{name}/1.0/0_0.png"), np.float32)
    assert img_m.shape == img_p.shape == (64, 64, 3)
    # the unet part is a zero delta, so any difference is the te sliders
    assert np.abs(img_m - img_p).max() > 2.0, "te slider had no visible effect"


def test_generate_batch_scales_te_parity(tmp_path):
    """--batch_scales with te parts: per-scale te-merged embeddings ride the
    batched trajectory; results match the sequential path per scale."""
    from safetensors.numpy import save_file
    from sliders_conceptmod_tpu.cli import generate_images_xl as gen_cli

    _, text_encoders, unet, _ = factory.load_models_xl("tiny-xl", weight_dtype=jnp.float32)
    te = text_encoders[0]
    sites = lora_lib.create_sites(
        te.params, rank=2, alpha=1.0,
        target_replace=["CLIPAttention", "CLIPSdpaAttention"],
        prefix="lora_te1", train_method="full",
        name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = {
        k: {"down": v["down"], "up": jax.random.normal(jax.random.PRNGKey(3), v["up"].shape) * 0.2}
        for k, v in lp.items()
    }
    slider = str(tmp_path / "te_only_rank2_alpha1.safetensors")
    save_file(lora_lib.state_dict_numpy(sites, lp), slider)

    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text("case_number,prompt,evaluation_seed,concept\n0,a person,7,person\n")

    outs = {}
    for mode, flags in (("seq", []), ("batch", ["--batch_scales"])):
        save_path = str(tmp_path / f"out_{mode}")
        args = gen_cli.build_parser().parse_args(
            [
                "--model_name", slider,
                "--prompts_path", str(csv_path),
                "--save_path", save_path,
                "--base", "tiny-xl",
                "--image_size", "64",
                "--num_samples", "1",
                "--ddim_steps", "2",
                "--start_noise", "2000",
                "--scales=-1,1",
            ]
            + flags
        )
        gen_cli.run(args)
        from PIL import Image

        name = "te_only_rank2_alpha1.safetensors"
        outs[mode] = [
            np.asarray(Image.open(f"{save_path}/{name}/{s}/0_0.png"), np.float32)
            for s in ("-1.0", "1.0")
        ]
    for a, b in zip(outs["seq"], outs["batch"]):
        # same trajectory math, different batching — a few uint8 LSB jitter
        assert np.abs(a - b).mean() < 3.0
    # and the scales genuinely differ
    assert np.abs(outs["seq"][0] - outs["seq"][1]).max() > 2.0


def test_load_te_part_t5_binding():
    """Flux te2 = T5: lora_te2_encoder_block_*_SelfAttention_* keys bind to
    a T5 encoder param tree (reference train_notrigger.py:188-191)."""
    from sliders_conceptmod_tpu.models.t5 import T5Config, T5EncoderModel

    cfg = T5Config.tiny()
    model = T5EncoderModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    sites = lora_lib.create_sites(
        params, rank=2, alpha=1.0, target_replace=["T5Attention"],
        prefix="lora_te2", train_method="t5attn",
        name_path_prefix=sfile.T5_NAME_PATH_PREFIX,
    )
    assert sites and all(s.lora_name.startswith("lora_te2_encoder_") for s in sites)
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = {
        k: {"down": v["down"], "up": jax.random.normal(jax.random.PRNGKey(4), v["up"].shape) * 0.1}
        for k, v in lp.items()
    }
    part_sd = lora_lib.state_dict_numpy(sites, lp)
    tep = sfile.load_te_part(params, part_sd, index=1, is_t5=True)
    merged = tep.merged_params(params, 1.0)
    ids = jnp.zeros((1, 8), jnp.int32)
    base_out = model.apply({"params": params}, ids)
    merged_out = model.apply({"params": merged}, ids)
    assert float(jnp.abs(base_out - merged_out).max()) > 1e-5


def test_generate_images_sd3_te_slider_e2e(tmp_path):
    """SD3: a te-only slider over the clip_l/clip_g towers changes the swept
    latents through the SD3 flow sampler (reference train_notrigger.py:148-176
    trains these towers; consumption here is in-framework)."""
    from safetensors.numpy import save_file
    from sliders_conceptmod_tpu.cli import generate_images_sd3 as gen_cli

    _, text_encoders, _, _ = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.float32)
    sds = {}
    for idx, te in enumerate(text_encoders):
        sites = lora_lib.create_sites(
            te.params, rank=2, alpha=1.0,
            target_replace=["CLIPAttention", "CLIPSdpaAttention"],
            prefix=f"lora_te{idx + 1}", train_method="full",
            name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
        )
        lp = lora_lib.init_lora_params(jax.random.PRNGKey(idx), sites)
        lp = {
            k: {"down": v["down"],
                "up": jax.random.normal(jax.random.PRNGKey(10 + idx), v["up"].shape) * 0.2}
            for k, v in lp.items()
        }
        sds.update(lora_lib.state_dict_numpy(sites, lp))
    slider = str(tmp_path / "sd3_te_rank2_alpha1.safetensors")
    save_file(sds, slider)

    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text("case_number,prompt,evaluation_seed,concept\n0,a person,7,person\n")
    save_path = str(tmp_path / "out")
    args = gen_cli.build_parser().parse_args(
        [
            "--model_name", slider,
            "--prompts_path", str(csv_path),
            "--save_path", save_path,
            "--base", "tiny-sd3",
            "--image_size", "16",
            "--steps", "2",
            "--start_noise", "2000",
            "--scales=-1,1",
        ]
    )
    gen_cli.run(args)
    name = "sd3_te_rank2_alpha1.safetensors"
    lat_m = np.load(f"{save_path}/{name}/-1.0/0_0.npy")
    lat_p = np.load(f"{save_path}/{name}/1.0/0_0.npy")
    assert np.abs(lat_m - lat_p).max() > 1e-4, "SD3 te slider had no effect"


def test_te_slider_loads_into_real_peft_text_encoder():
    """Ecosystem-interop proof for the notrigger artifact chain: a te-slider
    part in OUR save schema loads into the ACTUAL downstream stack the
    reference delegates consumption to (transformers CLIPTextModel + PEFT,
    combine_loras.py:26-44 renames target PEFT conventions), and PEFT's
    lora forward equals OUR te-merged JAX encode on the same base weights.

    Externally validates, against PEFT's own math rather than our formula:
    key naming (kohya `lora_te1_` + HF module path with `.`→`_` — matched
    here by enumerating the REAL HF model's named_modules), down/up torch
    layouts ([r,in]/[out,r] = PEFT's lora_A/lora_B), and the α/r scaling."""
    import torch
    from peft import LoraConfig, inject_adapter_in_model
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    from sliders_conceptmod_tpu.io.torch_convert import (
        convert_clip_text_state_dict,
        tree_to_jax,
    )
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

    hf_cfg = HFConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=16,
        eos_token_id=3, bos_token_id=1, pad_token_id=0, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()
    params = tree_to_jax(
        convert_clip_text_state_dict({k: v.numpy() for k, v in hf.state_dict().items()})
    )

    sites = lora_lib.create_sites(
        params, rank=2, alpha=1.0,
        target_replace=["CLIPAttention", "CLIPSdpaAttention"],
        prefix="lora_te1", train_method="full",
        name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
    )
    assert sites
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = {
        k: {"down": v["down"],
            "up": jax.random.normal(jax.random.PRNGKey(1), v["up"].shape) * 0.1}
        for k, v in lp.items()
    }
    part_sd = lora_lib.state_dict_numpy(sites, lp)

    # --- OUR side: merged encode at multiplier 1 (= PEFT's loaded strength)
    tep = sfile.load_te_part(params, part_sd, index=0)
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=3, projection_dim=16,
        hidden_act="quick_gelu",
    )
    ids = np.array([[1, 5, 9, 7, 3, 0, 0, 0], [1, 42, 3, 0, 0, 0, 0, 0]], np.int64)
    ours = CLIPTextEncoder(cfg).apply(
        {"params": tep.merged_params(params, 1.0)}, jnp.asarray(ids)
    ).last_hidden_state

    # --- PEFT side: match kohya names by enumerating the REAL HF modules
    # (exactly how downstream loaders resolve these keys)
    kohya_by_module = {}
    for name, mod in hf.named_modules():
        if isinstance(mod, torch.nn.Linear):
            kohya = "lora_te1_" + name.replace(".", "_")
            if f"{kohya}.lora_down.weight" in part_sd:
                kohya_by_module[name] = kohya
    # every saved site found a real HF module, and vice versa
    assert len(kohya_by_module) == len(sites)

    peft_cfg = LoraConfig(
        r=2, lora_alpha=1.0, target_modules=sorted(kohya_by_module), bias="none"
    )
    pm = inject_adapter_in_model(peft_cfg, hf)
    with torch.no_grad():
        for name, kohya in kohya_by_module.items():
            mod = pm.get_submodule(name)
            mod.lora_A["default"].weight.copy_(
                torch.from_numpy(part_sd[f"{kohya}.lora_down.weight"])
            )
            mod.lora_B["default"].weight.copy_(
                torch.from_numpy(part_sd[f"{kohya}.lora_up.weight"])
            )
        hf_out = pm(torch.tensor(ids), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(ours), hf_out.last_hidden_state.numpy(), atol=2e-5
    )
