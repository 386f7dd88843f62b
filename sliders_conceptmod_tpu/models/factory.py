"""Model loading + prompt encoding — the L1 layer (reference model_util.py).

Parity targets:
* ``load_models`` (reference ``conceptmod/textsliders/model_util.py:112-137``):
  tokenizer + CLIP text encoder + UNet + scheduler for SD1.x/2.x,
* ``load_models_xl`` (``:358-385``): 2 tokenizers + 2 CLIP encoders
  (te2 = OpenCLIP bigG with projection, pad id 0) + SDXL UNet + scheduler,
* ``create_noise_scheduler`` (``:388-436``) — see diffusion/schedulers.py,
* prompt encoding (reference train_util.py:108-155,224-247): SD1 uses the
  final (or clip_skip'd) hidden state; XL concatenates both encoders'
  penultimate hidden states and takes te2's projected pooled output.

Loading modes:
* a local diffusers-format directory → real weights via io/torch_convert,
* a single-file .ckpt/.safetensors checkpoint (LDM layout) → io/ldm_convert,
* anything else → random-init at the true architecture ("weightless mode",
  for benchmarks/tests in this zero-egress environment). HF-hub downloads
  are deliberately not implemented (zero egress).

TPU note: ``encode_prompts*`` are jitted over token ids; all five prompts of
a slider pair batch through the encoder in one call at train start, then the
encoders are dropped (the reference deletes them too, train_lora_xl.py:156-159).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.io import torch_convert as tc
from sliders_conceptmod_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    clip_skip_hidden_state,
    penultimate_hidden_state,
)
from sliders_conceptmod_tpu.models.tokenizer import load_tokenizer
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
from sliders_conceptmod_tpu.models.vae import AutoencoderKL, VAEConfig


@dataclass
class TextEncoderBundle:
    model: CLIPTextEncoder
    params: dict
    tokenizer: object

    def apply(self, input_ids):
        return self.model.apply({"params": self.params}, input_ids)


@dataclass
class UNetBundle:
    model: UNet2DConditionModel
    params: dict
    config: UNetConfig
    # non-None => params carries int8 Dense kernels (adapters/quant.py);
    # apply_fn dequantizes at the point of use. Convs stay full precision.
    quant_scales: Optional[dict] = None
    # W8A8 (inference only): per-token dynamic int8 activations + int8×int8
    # MXU matmuls at 2× the bf16 rate (adapters/quant.py)
    act_quant: bool = False

    def apply_fn(self, act_quant: Optional[bool] = None) -> Callable:
        model = self.model

        def unet_apply(params, sample, t, ctx, added_cond_kwargs=None):
            return model.apply({"params": params}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

        if self.quant_scales is not None:
            from sliders_conceptmod_tpu.adapters import quant

            return quant.wrap_apply(
                unet_apply,
                self.quant_scales,
                self.model.dtype,
                act_quant=self.act_quant if act_quant is None else act_quant,
            )
        if act_quant or (act_quant is None and self.act_quant):
            # W8A8 request (argument OR bundle attribute) on an unquantized
            # bundle would silently return the plain bf16 apply — an A/B
            # would measure nothing
            raise ValueError(
                "apply_fn(act_quant=True) requires a quantized base "
                "(quant_scales is None — load with quantize_base=True)"
            )
        return unet_apply


@dataclass
class VAEBundle:
    model: AutoencoderKL
    params: dict
    config: VAEConfig

    def encode(self, images):
        return self.model.apply({"params": self.params}, images, method=self.model.encode)

    def decode(self, latents):
        return self.model.apply({"params": self.params}, latents, method=self.model.decode)


def _unet_config_from_json(cfg: dict) -> UNetConfig:
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        attention_head_dim=tuple(cfg["attention_head_dim"])
        if isinstance(cfg.get("attention_head_dim"), list)
        else cfg.get("attention_head_dim", 8),
        transformer_layers_per_block=tuple(cfg["transformer_layers_per_block"])
        if isinstance(cfg.get("transformer_layers_per_block"), list)
        else cfg.get("transformer_layers_per_block", 1),
        use_linear_projection=cfg.get("use_linear_projection", False),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim"),
        projection_class_embeddings_input_dim=cfg.get("projection_class_embeddings_input_dim"),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
    )


def _is_local_diffusers_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "unet"))


def _tree_has(tree, name: str) -> bool:
    """Recursive key-membership over a nested param tree (e.g. sniffing
    Flux's ``guidance_embedder``, which nests under ``time_text_embed``)."""
    return any(
        k == name or (isinstance(v, dict) and _tree_has(v, name)) for k, v in tree.items()
    )


def _host_params(host_tree, dtype, quantize_base: bool):
    """Host tree → device params: either a plain dtype-cast transfer or the
    int8-quantize-before-transfer path (adapters/quant.py — the bf16 tree
    never has to fit in HBM). Returns ``(params, quant_scales-or-None)``."""
    if quantize_base:
        from sliders_conceptmod_tpu.adapters import quant

        return quant.quantize_host_tree(host_tree, dtype=dtype)
    return tc.tree_to_jax(host_tree, dtype=dtype), None


def _init_unet(config: UNetConfig, dtype, seed: int = 0, quantize_base: bool = False) -> UNetBundle:
    model = UNet2DConditionModel(config, dtype=dtype)
    sample = jnp.zeros((1, config.in_channels, 8, 8))
    ctx = jnp.zeros((1, 2, config.cross_attention_dim))
    added = None
    if config.addition_embed_type == "text_time":
        pooled_dim = config.projection_class_embeddings_input_dim - 6 * config.addition_time_embed_dim
        added = {"text_embeds": jnp.zeros((1, pooled_dim)), "time_ids": jnp.zeros((1, 6))}
    # init + precision cast fused under ONE jit: materializing the full fp32
    # SDXL param set (10.3GB) and then casting would peak at ~15.4GB — OOM on
    # a 16GB v5e. Fused, XLA frees each fp32 leaf as its cast completes.
    # (Storage at the configured precision mirrors the reference's
    # unet.to(device, dtype=weight_dtype), train_lora_xl.py:82.)
    def _init_params():
        return model.init(
            jax.random.PRNGKey(seed), sample, jnp.zeros((1,)), ctx, added_cond_kwargs=added
        )["params"]

    if quantize_base:
        from sliders_conceptmod_tpu.adapters import quant

        params, quant_scales = quant.quantize_init(_init_params, dtype=dtype)
        return UNetBundle(model, params, config, quant_scales=quant_scales)

    def init_cast():
        return jax.tree.map(lambda a: a.astype(dtype), _init_params())

    params = jax.jit(init_cast)()
    return UNetBundle(model, params, config)


def _load_or_init_unet(
    name_or_path: str, family: str, dtype, quantize_base: bool = False
) -> UNetBundle:
    if _is_local_diffusers_dir(name_or_path):
        tree, cfg_json = tc.load_unet_params(name_or_path)
        config = _unet_config_from_json(cfg_json)
        model = UNet2DConditionModel(config, dtype=dtype)
        params, quant_scales = _host_params(tree, dtype, quantize_base)
        return UNetBundle(model, params, config, quant_scales=quant_scales)
    config = {
        "sd15": UNetConfig.sd15,
        "sd21": UNetConfig.sd21,
        "sdxl": UNetConfig.sdxl,
        "tiny": UNetConfig.tiny,
        "tiny-xl": UNetConfig.tiny_xl,
    }[family]()
    return _init_unet(config, dtype, quantize_base=quantize_base)


def _load_or_init_text_encoder(
    name_or_path: str, component: str, clip_config: CLIPTextConfig, dtype, tokenizer_component: str, pad_token_id=None
) -> TextEncoderBundle:
    tok = load_tokenizer(
        name_or_path if os.path.isdir(str(name_or_path)) else "",
        component=tokenizer_component,
        pad_token_id=pad_token_id,
    )
    model = CLIPTextEncoder(clip_config, dtype=dtype)
    sub = os.path.join(str(name_or_path), component)
    if os.path.isdir(sub):
        tree, cfg_json = tc.load_text_encoder_params(name_or_path, component)
        # the checkpoint's own config wins over the caller's family heuristic
        # (an SD2 dir without "sd2" in its path would otherwise get a 12-layer
        # config against a 23-layer tree — failing only at first apply);
        # projection_dim only when the tree actually carries the head (HF
        # configs declare a default projection_dim even for plain models)
        clip_config = dataclasses.replace(
            clip_config,
            vocab_size=cfg_json.get("vocab_size", clip_config.vocab_size),
            hidden_size=cfg_json.get("hidden_size", clip_config.hidden_size),
            intermediate_size=cfg_json.get("intermediate_size", clip_config.intermediate_size),
            num_hidden_layers=cfg_json.get("num_hidden_layers", clip_config.num_hidden_layers),
            num_attention_heads=cfg_json.get("num_attention_heads", clip_config.num_attention_heads),
            max_position_embeddings=cfg_json.get(
                "max_position_embeddings", clip_config.max_position_embeddings
            ),
            hidden_act=cfg_json.get("hidden_act", clip_config.hidden_act),
            # projection head present → dim from config.json, else from the
            # tree's own kernel [in, out] (configs sometimes omit the key;
            # dropping the head because of that would silently un-project
            # the pooled output)
            projection_dim=(
                cfg_json.get("projection_dim") or int(tree["text_projection"]["kernel"].shape[-1])
            )
            if "text_projection" in tree
            else None,
        )
        model = CLIPTextEncoder(clip_config, dtype=dtype)
        # storage at train precision (CLAUDE.md: fp32 storage OOMs v5e)
        return TextEncoderBundle(model, tc.tree_to_jax(tree, dtype=dtype), tok)
    # init + precision cast fused under one jit (see _init_unet; an uncast
    # weightless bigG alone is 2.8GB of fp32 HBM)
    def init_cast():
        p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"]
        return jax.tree.map(lambda a: a.astype(dtype), p)

    params = jax.jit(init_cast)()
    return TextEncoderBundle(model, params, tok)


def _load_or_init_vae(name_or_path: str, family: str, dtype) -> VAEBundle:
    sub = os.path.join(str(name_or_path), "vae")
    if os.path.isdir(sub):
        tree, cfg_json = tc.load_vae_params(name_or_path)
        config = VAEConfig(
            latent_channels=cfg_json.get("latent_channels", 4),
            block_out_channels=tuple(cfg_json.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=cfg_json.get("layers_per_block", 2),
            norm_num_groups=cfg_json.get("norm_num_groups", 32),
            scaling_factor=cfg_json.get("scaling_factor", 0.18215),
            # flow-family VAEs declare it (SD3 0.0609 / Flux 0.1159); the
            # epsilon families ship no key → 0.0
            shift_factor=cfg_json.get("shift_factor") or 0.0,
            # SD3/Flux VAE dirs declare use_quant_conv=false and ship no
            # quant convs; missing keys default to the SD1/XL layout
            use_quant_conv=cfg_json.get("use_quant_conv", True),
            use_post_quant_conv=cfg_json.get("use_post_quant_conv", True),
        )
        model = AutoencoderKL(config, dtype=dtype)
        return VAEBundle(model, tc.tree_to_jax(tree, dtype=dtype), config)
    if family == "sdxl":
        config = VAEConfig.sdxl()
    elif family in ("sd3", "flux"):
        config = VAEConfig.sd3()
    else:
        config = VAEConfig.sd()
    model = AutoencoderKL(config, dtype=dtype)

    def init_cast():
        p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))["params"]
        return jax.tree.map(lambda a: a.astype(dtype), p)

    params = jax.jit(init_cast)()
    return VAEBundle(model, params, config)


def _family_from_path(name_or_path: str, v2: bool) -> str:
    p = str(name_or_path).lower()
    if "tiny" in p:  # weightless smoke-test family (CPU CI, no checkpoints)
        return "tiny-xl" if "xl" in p else "tiny"
    if "xl" in p:
        return "sdxl"
    if v2 or "stable-diffusion-2" in p or "sd2" in p:
        return "sd21"
    return "sd15"


# ---------------------------------------------------------------------------
# public loaders (reference model_util.py API shape)
# ---------------------------------------------------------------------------


def load_models(
    name_or_path: str,
    scheduler_name: str = "ddim",
    v2: bool = False,
    v_pred: bool = False,
    weight_dtype=jnp.float32,
    with_vae: bool = False,
    quantize_base: bool = False,
):
    """SD1/2 — reference model_util.py:112-137 (imagesliders variant returns
    the VAE too, trainscripts/imagesliders/model_util.py:75,108-133).
    Single-file .ckpt/.safetensors checkpoints (LDM layout) load via
    io/ldm_convert, matching model_util.py:37-109.
    ``quantize_base``: int8 UNet Dense kernels (tpu.quantize_base — a
    weight-streaming perf knob on this family; see UNetBundle)."""
    if os.path.isfile(str(name_or_path)) and str(name_or_path).endswith((".ckpt", ".safetensors")):
        from sliders_conceptmod_tpu.io import quant_cache
        from sliders_conceptmod_tpu.io.ldm_convert import load_ldm_checkpoint

        if quant_cache.is_quantized_artifact(name_or_path):
            # int8 artifact (cli/quantize_checkpoint --family sd1): UNet only —
            # text tower/VAE init weightless
            tiny = "tiny" in os.path.basename(str(name_or_path)).lower()
            unet_cfg = UNetConfig.tiny() if tiny else (UNetConfig.sd21() if v2 else UNetConfig.sd15())
            clip_cfg = (
                CLIPTextConfig.tiny()
                if tiny
                else (CLIPTextConfig.sd2_te() if v2 else CLIPTextConfig.sd15_te())
            )
            q_params, q_scales = quant_cache.load_quantized(str(name_or_path), dtype=weight_dtype)
            unet = UNetBundle(
                UNet2DConditionModel(unet_cfg, dtype=weight_dtype), q_params, unet_cfg,
                quant_scales=q_scales,
            )
            te = _load_or_init_text_encoder("", "text_encoder", clip_cfg, weight_dtype, "tokenizer")
            scheduler = create_noise_scheduler(
                scheduler_name, prediction_type="v_prediction" if v_pred else "epsilon"
            )
            if with_vae:
                return te.tokenizer, te, _load_or_init_vae("", "sd", weight_dtype), unet, scheduler
            return te.tokenizer, te, unet, scheduler

        trees = load_ldm_checkpoint(str(name_or_path))
        if "tiny" in os.path.basename(str(name_or_path)).lower():
            # weightless-family escape: tiny single files (io/ldm_export.py)
            # keep the whole LDM surface drivable on CPU CI. The stride-3
            # LDM slot layout round-trips layers_per_block 1 and 2; read the
            # depth off the converted tree.
            clip_cfg = CLIPTextConfig.tiny()
            lpb = 2 if "resnets_1" in trees["unet"].get("down_blocks_0", {}) else 1
            unet_cfg = dataclasses.replace(UNetConfig.tiny(), layers_per_block=lpb)
        else:
            clip_cfg = CLIPTextConfig.sd2_te() if v2 else CLIPTextConfig.sd15_te()
            unet_cfg = UNetConfig.sd21() if v2 else UNetConfig.sd15()
        tok = load_tokenizer("", component="tokenizer")
        te = TextEncoderBundle(
            CLIPTextEncoder(clip_cfg, dtype=weight_dtype),
            tc.tree_to_jax(trees.get("text_encoder", {}), dtype=weight_dtype),
            tok,
        )
        u_params, u_scales = _host_params(trees["unet"], weight_dtype, quantize_base)
        unet = UNetBundle(
            UNet2DConditionModel(unet_cfg, dtype=weight_dtype),
            u_params,
            unet_cfg,
            quant_scales=u_scales,
        )
        scheduler = create_noise_scheduler(
            scheduler_name, prediction_type="v_prediction" if v_pred else "epsilon"
        )
        if with_vae:
            if not trees.get("vae"):
                raise ValueError(
                    f"{name_or_path} carries no VAE (first_stage_model.*) but "
                    "with_vae=True was requested"
                )
            # width off the checkpoint itself: the tiny escape can carry
            # either the tiny VAE or the full SD VAE (weightless family)
            dec_in = trees["vae"]["decoder"]["conv_in"]["kernel"].shape[-1]
            vae_cfg = VAEConfig.tiny() if dec_in <= 32 else VAEConfig.sd()
            vae = VAEBundle(
                AutoencoderKL(vae_cfg, dtype=weight_dtype),
                tc.tree_to_jax(trees["vae"], dtype=weight_dtype),
                vae_cfg,
            )
            return tok, te, vae, unet, scheduler
        return tok, te, unet, scheduler

    family = _family_from_path(name_or_path, v2)
    if family == "sdxl":
        raise ValueError("Use load_models_xl for SDXL checkpoints")
    if family == "tiny":
        clip_cfg = CLIPTextConfig.tiny()
    elif family == "sd21":
        clip_cfg = CLIPTextConfig.sd2_te()
    else:
        clip_cfg = CLIPTextConfig.sd15_te()
    te = _load_or_init_text_encoder(name_or_path, "text_encoder", clip_cfg, weight_dtype, "tokenizer")
    unet = _load_or_init_unet(name_or_path, family, weight_dtype, quantize_base=quantize_base)
    scheduler = create_noise_scheduler(
        scheduler_name, prediction_type="v_prediction" if v_pred else "epsilon"
    )
    if with_vae:
        vae = _load_or_init_vae(name_or_path, family, weight_dtype)
        return te.tokenizer, te, vae, unet, scheduler
    return te.tokenizer, te, unet, scheduler


def load_models_xl(
    name_or_path: str,
    scheduler_name: str = "euler_a",
    weight_dtype=jnp.float32,
    with_vae: bool = False,
    quantize_base: bool = False,
):
    """SDXL — reference model_util.py:358-385: two tokenizers (te2 pads with
    id 0), two encoders, UNet, scheduler. Single-file .ckpt/.safetensors
    checkpoints (SGM layout: conditioner.embedders.{0,1} towers) load via
    io/ldm_convert, matching the reference's from_single_file path
    (model_util.py:387-403).

    ``quantize_base``: the UNet's frozen 2-D Dense kernels (attention +
    time/text embeds, ~60% of SDXL's params) land as per-column int8
    (adapters/quant.py) — frees 2.1 GiB of v5e HBM (87% of SDXL params
    are int8-eligible, BASELINE.md table) for bigger batched
    sweeps (e.g. the 5-scale 1024px grid). Convs stay full precision."""
    if os.path.isfile(str(name_or_path)) and str(name_or_path).endswith((".ckpt", ".safetensors")):
        from sliders_conceptmod_tpu.io import quant_cache
        from sliders_conceptmod_tpu.io.ldm_convert import load_ldm_checkpoint

        tiny = "tiny" in os.path.basename(str(name_or_path)).lower()
        if quant_cache.is_quantized_artifact(name_or_path):
            # int8 artifact (cli/quantize_checkpoint --family xl): UNet only —
            # text towers + VAE init weightless (point --base at a directory
            # or SGM single file for real towers)
            unet_cfg = UNetConfig.tiny_xl() if tiny else UNetConfig.sdxl()
            q_params, q_scales = quant_cache.load_quantized(str(name_or_path), dtype=weight_dtype)
            unet = UNetBundle(
                UNet2DConditionModel(unet_cfg, dtype=weight_dtype), q_params, unet_cfg,
                quant_scales=q_scales,
            )
            te1_cfg = CLIPTextConfig.tiny(hidden_size=16) if tiny else CLIPTextConfig.sdxl_te1()
            te2_cfg = (
                CLIPTextConfig.tiny(hidden_size=16, projection_dim=32)
                if tiny
                else CLIPTextConfig.sdxl_te2()
            )
            te1 = _load_or_init_text_encoder("", "text_encoder", te1_cfg, weight_dtype, "tokenizer")
            te2 = _load_or_init_text_encoder(
                "", "text_encoder_2", te2_cfg, weight_dtype, "tokenizer_2", pad_token_id=0
            )
            out = ([te1.tokenizer, te2.tokenizer], [te1, te2], unet,
                   create_noise_scheduler(scheduler_name))
            if with_vae:
                # same weightless choice as the dir path below (line ~504)
                return out + (_load_or_init_vae("", "sdxl", weight_dtype),)
            return out

        trees = load_ldm_checkpoint(str(name_or_path))
        if tiny:
            te1_cfg = CLIPTextConfig.tiny(hidden_size=16)
            te2_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=32)
            lpb = 2 if "resnets_1" in trees["unet"].get("down_blocks_0", {}) else 1
            unet_cfg = dataclasses.replace(UNetConfig.tiny_xl(), layers_per_block=lpb)
        else:
            te1_cfg = CLIPTextConfig.sdxl_te1()
            te2_cfg = CLIPTextConfig.sdxl_te2()
            unet_cfg = UNetConfig.sdxl()
        tok1 = load_tokenizer("", component="tokenizer")
        tok2 = load_tokenizer("", component="tokenizer_2", pad_token_id=0)
        te1 = TextEncoderBundle(
            CLIPTextEncoder(te1_cfg, dtype=weight_dtype),
            tc.tree_to_jax(trees.get("text_encoder", {}), dtype=weight_dtype),
            tok1,
        )
        te2 = TextEncoderBundle(
            CLIPTextEncoder(te2_cfg, dtype=weight_dtype),
            tc.tree_to_jax(trees.get("text_encoder_2", {}), dtype=weight_dtype),
            tok2,
        )
        u_params, u_scales = _host_params(trees["unet"], weight_dtype, quantize_base)
        unet = UNetBundle(
            UNet2DConditionModel(unet_cfg, dtype=weight_dtype), u_params, unet_cfg,
            quant_scales=u_scales,
        )
        scheduler = create_noise_scheduler(scheduler_name)
        out = ([tok1, tok2], [te1, te2], unet, scheduler)
        if with_vae:
            if not trees.get("vae"):
                raise ValueError(
                    f"{name_or_path} carries no VAE (first_stage_model.*) but "
                    "with_vae=True was requested"
                )
            dec_in = trees["vae"]["decoder"]["conv_in"]["kernel"].shape[-1]
            vae_cfg = VAEConfig.tiny() if dec_in <= 32 else VAEConfig.sdxl()
            vae = VAEBundle(
                AutoencoderKL(vae_cfg, dtype=weight_dtype),
                tc.tree_to_jax(trees["vae"], dtype=weight_dtype),
                vae_cfg,
            )
            return out + (vae,)
        return out

    family = _family_from_path(name_or_path, False)
    if family == "tiny-xl":
        # two 16-wide tiny encoders -> 32-dim concat context; te2 projects to
        # the 32-dim pooled embed the tiny_xl UNet expects
        te1_cfg = CLIPTextConfig.tiny(hidden_size=16)
        te2_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=32)
    elif family == "tiny":
        # fail fast: silently promoting to full-scale SDXL turns an intended
        # smoke run into a multi-GB weightless build + fresh-HLO compile
        raise ValueError("load_models_xl: use a 'tiny-xl' path for the weightless XL smoke family")
    else:
        family = "sdxl"
        te1_cfg = CLIPTextConfig.sdxl_te1()
        te2_cfg = CLIPTextConfig.sdxl_te2()
    te1 = _load_or_init_text_encoder(name_or_path, "text_encoder", te1_cfg, weight_dtype, "tokenizer")
    te2 = _load_or_init_text_encoder(
        name_or_path, "text_encoder_2", te2_cfg, weight_dtype, "tokenizer_2", pad_token_id=0
    )
    unet = _load_or_init_unet(name_or_path, family, weight_dtype, quantize_base=quantize_base)
    scheduler = create_noise_scheduler(scheduler_name)
    out = ([te1.tokenizer, te2.tokenizer], [te1, te2], unet, scheduler)
    if with_vae:
        return out + (_load_or_init_vae(name_or_path, "sdxl", weight_dtype),)
    return out


@dataclass
class TransformerBundle:
    model: object
    params: dict
    config: object
    # kwargs injected when the caller omits them — Flux-dev needs a guidance
    # embedding value on EVERY forward (guidance_embeds=True would otherwise
    # crash at trace time); the diffusers FluxPipeline default is 3.5
    default_kwargs: Optional[dict] = None
    # non-None => self.params is an int8-quantized base (adapters/quant.py,
    # tpu.quantize_base) and apply_fn dequantizes at the point of use
    quant_scales: Optional[dict] = None
    # W8A8 (inference only): per-token dynamic int8 activations + int8×int8
    # MXU matmuls at 2× the bf16 rate (adapters/quant.py)
    act_quant: bool = False

    def apply_fn(
        self, remat_blocks: bool = False, act_quant: Optional[bool] = None
    ) -> Callable:
        # ``act_quant`` overrides the bundle attribute for this callable only
        # (trainers request a W8A8 apply for the gradient-stopped warm-up
        # while the bundle default stays weight-only — tpu.w8a8_warmup)
        model = self.model
        if remat_blocks and hasattr(model, "remat_blocks"):
            # per-block remat for the TRAIN student: caps fwd+bwd peak HBM at
            # block granularity (see models/flux.py.FluxTransformer2DModel);
            # same params, same FLOPs
            model = model.clone(remat_blocks=True)
        defaults = dict(self.default_kwargs or {})

        def apply(params, *args, **kwargs):
            for k, v in defaults.items():
                kwargs.setdefault(k, v)
            return model.apply({"params": params}, *args, **kwargs)

        if self.quant_scales is not None:
            from sliders_conceptmod_tpu.adapters import quant

            return quant.wrap_apply(
                apply,
                self.quant_scales,
                self.model.dtype,
                act_quant=self.act_quant if act_quant is None else act_quant,
            )
        if act_quant or (act_quant is None and self.act_quant):
            # W8A8 request (argument OR bundle attribute) on an unquantized
            # bundle would silently return the plain bf16 apply — an A/B
            # would measure nothing
            raise ValueError(
                "apply_fn(act_quant=True) requires a quantized base "
                "(quant_scales is None — load with quantize_base=True)"
            )
        return apply


def load_models_sd3(
    name_or_path: str,
    weight_dtype=jnp.float32,
    quantize_base: bool = False,
):
    """SD3 — reference model_util.py:217-236: StableDiffusion3Pipeline with
    the T5 encoder dropped (text_encoder_3=None); returns
    (tokenizers, text_encoders, transformer, flow scheduler). Single-file
    ``sd3_medium.safetensors``-style checkpoints (SGM MMDiT layout +
    text_encoders.clip_l/clip_g towers) load via io/ldm_convert.

    ``quantize_base`` (tpu.quantize_base): the MMDiT's frozen Dense kernels
    land on device as per-column int8 (adapters/quant.py) — SD3.5-Large-class
    models (8B, 16 GB bf16) fit one v5e; same mechanism as the Flux loader."""
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel

    is_tiny = "tiny" in str(name_or_path).lower()
    if os.path.isfile(str(name_or_path)) and str(name_or_path).endswith(".safetensors"):
        from sliders_conceptmod_tpu.io import quant_cache

        if quant_cache.is_quantized_artifact(name_or_path):
            # int8 artifact (cli/quantize_checkpoint): transformer only —
            # text towers init weightless (pass a checkpoint dir for real
            # ones; the artifact mirrors the BFL-style transformer-only file)
            if is_tiny:
                te1_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
                te2_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
                mm_cfg = MMDiTConfig.tiny()
            else:
                te1_cfg = CLIPTextConfig(projection_dim=768)
                te2_cfg = CLIPTextConfig.sdxl_te2()
                mm_cfg = MMDiTConfig.sd3_medium()
            q_params, q_scales = quant_cache.load_quantized(str(name_or_path), dtype=weight_dtype)
            te1 = _load_or_init_text_encoder("", "text_encoder", te1_cfg, weight_dtype, "tokenizer")
            te2 = _load_or_init_text_encoder(
                "", "text_encoder_2", te2_cfg, weight_dtype, "tokenizer_2", pad_token_id=0
            )
            model = SD3Transformer2DModel(mm_cfg, dtype=weight_dtype)
            transformer = TransformerBundle(model, q_params, mm_cfg, quant_scales=q_scales)
            return (
                [te1.tokenizer, te2.tokenizer],
                [te1, te2],
                transformer,
                FlowMatchScheduler(shift=3.0),
            )
    if os.path.isfile(str(name_or_path)) and str(name_or_path).endswith((".ckpt", ".safetensors")):
        from sliders_conceptmod_tpu.io.ldm_convert import load_ldm_checkpoint

        trees = load_ldm_checkpoint(str(name_or_path))
        if not trees.get("text_encoder") or not trees.get("text_encoder_2"):
            # the base sd3_medium.safetensors release ships WITHOUT CLIP
            # towers; only the *_incl_clips variants bundle them — an empty
            # bundle would fail opaquely at first encode
            raise ValueError(
                f"{name_or_path} carries no bundled text encoders "
                "(text_encoders.clip_l/clip_g towers). Use an *_incl_clips "
                "single file or a diffusers checkpoint directory."
            )
        if is_tiny:
            te1_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
            te2_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
            mm_cfg = MMDiTConfig.tiny()
        else:
            te1_cfg = CLIPTextConfig(projection_dim=768)
            te2_cfg = CLIPTextConfig.sdxl_te2()
            mm_cfg = MMDiTConfig.sd3_medium()
        tok1 = load_tokenizer("", component="tokenizer")
        tok2 = load_tokenizer("", component="tokenizer_2", pad_token_id=0)
        te1 = TextEncoderBundle(
            CLIPTextEncoder(te1_cfg, dtype=weight_dtype),
            tc.tree_to_jax(trees.get("text_encoder", {}), dtype=weight_dtype),
            tok1,
        )
        te2 = TextEncoderBundle(
            CLIPTextEncoder(te2_cfg, dtype=weight_dtype),
            tc.tree_to_jax(trees.get("text_encoder_2", {}), dtype=weight_dtype),
            tok2,
        )
        model = SD3Transformer2DModel(mm_cfg, dtype=weight_dtype)
        t_params, quant_scales = _host_params(trees["transformer"], weight_dtype, quantize_base)
        transformer = TransformerBundle(model, t_params, mm_cfg, quant_scales=quant_scales)
        return (
            [te1.tokenizer, te2.tokenizer],
            [te1, te2],
            transformer,
            FlowMatchScheduler(shift=3.0),
        )
    if is_tiny:
        te1_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
        te2_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
        mm_cfg = MMDiTConfig.tiny()
    else:
        te1_cfg = CLIPTextConfig(projection_dim=768)  # clip-l with projection
        te2_cfg = CLIPTextConfig.sdxl_te2()  # bigG, 1280-dim projection
        mm_cfg = MMDiTConfig.sd3_medium()

    te1 = _load_or_init_text_encoder(name_or_path, "text_encoder", te1_cfg, weight_dtype, "tokenizer")
    te2 = _load_or_init_text_encoder(
        name_or_path, "text_encoder_2", te2_cfg, weight_dtype, "tokenizer_2", pad_token_id=0
    )

    sub = os.path.join(str(name_or_path), "transformer")
    model = SD3Transformer2DModel(mm_cfg, dtype=weight_dtype)
    quant_scales = None
    if os.path.isdir(sub):
        sd = tc._load_safetensors_dir(sub)
        params, quant_scales = _host_params(
            tc.convert_diffusers_state_dict(sd), weight_dtype, quantize_base
        )
    else:
        # init + precision cast fused under one jit (see _init_unet): an
        # uncast fp32 SD3-Medium tree is 8.1GB — half the v5e's HBM wasted
        # on storage the model immediately re-casts at every use
        def _init_params():
            return model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, mm_cfg.in_channels, 8, 8)),
                jnp.zeros((1,)),
                jnp.zeros((1, 2, mm_cfg.joint_attention_dim)),
                jnp.zeros((1, mm_cfg.pooled_projection_dim)),
            )["params"]

        if quantize_base:
            from sliders_conceptmod_tpu.adapters import quant

            params, quant_scales = quant.quantize_init(_init_params, dtype=weight_dtype)
        else:

            def init_cast():
                return jax.tree.map(lambda a: a.astype(weight_dtype), _init_params())

            params = jax.jit(init_cast)()
    transformer = TransformerBundle(model, params, mm_cfg, quant_scales=quant_scales)
    scheduler = FlowMatchScheduler(shift=3.0)
    return [te1.tokenizer, te2.tokenizer], [te1, te2], transformer, scheduler


def encode_prompts_sd3(
    text_encoders: List[TextEncoderBundle],
    prompts: Sequence[str],
    joint_attention_dim: int = 4096,
    t5_seq_len: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SD3 prompt encoding with T5 dropped (reference model_util.py:217-236
    loads the pipeline with text_encoder_3=None; diffusers then zero-fills
    the T5 slot): concat CLIP penultimate states feature-wise, zero-pad to
    joint_attention_dim, append a zero T5 segment along the sequence;
    pooled = concat of both projected pooled outputs."""
    embeds, pooled = [], []
    for te in text_encoders:
        ids = jnp.asarray(te.tokenizer(list(prompts)))
        out = te.apply(ids)
        embeds.append(penultimate_hidden_state(out))
        pooled.append(out.projected if out.projected is not None else out.pooled_output)
    clip_embeds = jnp.concatenate(embeds, axis=-1)
    B, S, D = clip_embeds.shape
    if D < joint_attention_dim:
        clip_embeds = jnp.pad(clip_embeds, ((0, 0), (0, 0), (0, joint_attention_dim - D)))
    t5_zeros = jnp.zeros((B, t5_seq_len, joint_attention_dim), clip_embeds.dtype)
    return jnp.concatenate([clip_embeds, t5_zeros], axis=1), jnp.concatenate(pooled, axis=-1)


def load_models_cascade(
    name_or_path: str,
    scheduler_name: str = "euler_a",
    weight_dtype=jnp.float32,
):
    """Stable Cascade prior — reference model_util.py:290-308 (tokenizer,
    CLIP-G text encoder, Stage-C prior, scheduler from the config's
    ``create_noise_scheduler`` name). ``scheduler_name="wuerstchen"`` selects
    the functional ratio-space DDPMWuerstchenScheduler the reference's import
    dance never reaches (SURVEY §2.4; diffusion/wuerstchen.py).

    Zero-egress modes: a local diffusers dir with ``prior/`` safetensors
    loads real weights (conversion untested — no cascade checkpoint on this
    machine); anything else random-inits the true architecture, "tiny" in
    the path selects the smoke-test config.
    """
    from sliders_conceptmod_tpu.diffusion.wuerstchen import WuerstchenScheduler
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet

    is_tiny = "tiny" in str(name_or_path).lower()
    if is_tiny:
        te_cfg = CLIPTextConfig.tiny(hidden_size=16, projection_dim=16)
        prior_cfg = CascadeConfig.tiny()
    else:
        te_cfg = CLIPTextConfig.sdxl_te2()  # CLIP-G/bigG, 1280-d projection
        prior_cfg = CascadeConfig.prior()

    te = _load_or_init_text_encoder(name_or_path, "text_encoder", te_cfg, weight_dtype, "tokenizer")

    model = StableCascadeUNet(prior_cfg, dtype=weight_dtype)
    sub = os.path.join(str(name_or_path), "prior")
    if os.path.isdir(sub):
        from sliders_conceptmod_tpu.models.cascade import convert_cascade_state_dict

        sd = tc._load_safetensors_dir(sub)
        params = tc.tree_to_jax(convert_cascade_state_dict(sd), dtype=weight_dtype)
    else:
        gh = gw = 4
        def init_cast():
            p = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, prior_cfg.in_channels, gh, gw)),
                jnp.zeros((1,)),
                jnp.zeros((1, 2, prior_cfg.clip_text_in_channels)),
                jnp.zeros((1, 1, prior_cfg.clip_text_pooled_in_channels)),
                jnp.zeros((1, 1, prior_cfg.clip_image_in_channels)),
            )["params"]
            return jax.tree.map(lambda a: a.astype(weight_dtype), p)

        params = jax.jit(init_cast)()
    prior = TransformerBundle(model, params, prior_cfg)

    if scheduler_name == "wuerstchen":
        scheduler = WuerstchenScheduler()
    else:
        scheduler = create_noise_scheduler(scheduler_name)
    return te.tokenizer, te, prior, scheduler


def encode_prompts_cascade(
    te: TextEncoderBundle, prompts: Sequence[str]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cascade prompt encoding (reference ``encode_prompt_cascade``,
    train_util.py:721-770): text = hidden_states[-1] (final layer, pre-LN),
    pooled = projected text embedding with a singleton sequence axis."""
    ids = jnp.asarray(te.tokenizer(list(prompts)))
    out = te.apply(ids)
    pooled = out.projected if out.projected is not None else out.pooled_output
    return out.hidden_states[-1], pooled[:, None, :]


def load_models_flux(
    name_or_path: str,
    weight_dtype=jnp.float32,
    quantize_base: bool = False,
):
    """Flux (schnell) — reference model_util.py:238-268. Returns
    (tokenizers, encode_fn, transformer, flow scheduler).

    Real checkpoint dirs load the transformer + T5-XXL (models/t5.py) + CLIP
    pooled encoder; the T5 tokenizer uses the dir's tokenizer.json when the
    ``tokenizers`` lib can read it (no sentencepiece in this image), else the
    deterministic hash tokenizer. Weightless/tiny mode uses a
    pseudo-embedding stub for the whole text stack (identical graph).

    ``quantize_base=True`` (tpu.quantize_base): the transformer's frozen
    Dense kernels land on device as int8 (adapters/quant.py) — host trees
    are quantized leaf-by-leaf BEFORE transfer so the bf16 tree (23.8 GB
    full-depth schnell) never has to fit in HBM. ``TransformerBundle
    .apply_fn`` then dequantizes at the point of use.
    """
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler
    from sliders_conceptmod_tpu.models.flux import FluxConfig, FluxTransformer2DModel
    from sliders_conceptmod_tpu.models.tokenizer import HashTokenizer

    is_tiny = "tiny" in str(name_or_path).lower()
    is_local = os.path.isdir(os.path.join(str(name_or_path), "transformer"))
    is_quant_artifact = False
    if os.path.isfile(str(name_or_path)) and str(name_or_path).endswith(".safetensors"):
        from sliders_conceptmod_tpu.io import quant_cache

        # int8 artifact (cli/quantize_checkpoint) — loads pre-quantized,
        # implies quantize_base regardless of the caller's flag
        is_quant_artifact = quant_cache.is_quantized_artifact(name_or_path)
    is_single_file = (
        not is_quant_artifact
        and os.path.isfile(str(name_or_path))
        and str(name_or_path).endswith((".ckpt", ".safetensors"))
    )
    flux_cfg = FluxConfig.tiny() if is_tiny else FluxConfig.schnell()
    if is_single_file:
        # BFL single-file transformer (flux1-dev/schnell.safetensors layout).
        # guidance_in keys => dev (guidance-distilled) variant
        try:
            import safetensors

            with safetensors.safe_open(str(name_or_path), framework="np") as f:
                has_guidance = any(k.startswith("guidance_in.") for k in f.keys())
        except Exception:
            has_guidance = False
        if not is_tiny:
            flux_cfg = FluxConfig.dev() if has_guidance else FluxConfig.schnell()
    model = FluxTransformer2DModel(flux_cfg, dtype=weight_dtype)

    seq_t5 = 8 if is_tiny else 512  # reference max_sequence_length (train_util.py:204)
    tok = HashTokenizer(max_length=seq_t5, vocab_size=32128, bos=0, eos=1, pad=0)

    if is_local:
        from sliders_conceptmod_tpu.models.t5 import (
            T5Config,
            T5EncoderModel,
            convert_t5_state_dict,
        )

        t5_dir = os.path.join(str(name_or_path), "text_encoder_2")
        t5_cfg_json = tc._read_json(os.path.join(t5_dir, "config.json"))
        t5_cfg = T5Config(
            vocab_size=t5_cfg_json.get("vocab_size", 32128),
            d_model=t5_cfg_json.get("d_model", 4096),
            d_kv=t5_cfg_json.get("d_kv", 64),
            d_ff=t5_cfg_json.get("d_ff", 10240),
            num_layers=t5_cfg_json.get("num_layers", 24),
            num_heads=t5_cfg_json.get("num_heads", 64),
        )
        t5_model = T5EncoderModel(t5_cfg, dtype=weight_dtype)
        t5_params = tc.tree_to_jax(
            convert_t5_state_dict(tc._load_safetensors_dir(t5_dir)), dtype=weight_dtype
        )
        te1 = _load_or_init_text_encoder(
            name_or_path, "text_encoder", CLIPTextConfig.sd15_te(), weight_dtype, "tokenizer"
        )
        tok_dir = os.path.join(t5_dir, "..", "tokenizer_2")
        tok_json = os.path.join(tok_dir, "tokenizer.json")
        spm_file = os.path.join(tok_dir, "spiece.model")
        loaded_real_tok = False
        if os.path.isfile(tok_json):
            try:
                from transformers import T5TokenizerFast

                t5_tok = T5TokenizerFast(tokenizer_file=tok_json)

                def t5_tokenize(prompts):
                    enc = t5_tok(list(prompts), padding="max_length", max_length=seq_t5, truncation=True)
                    return np.asarray(enc["input_ids"], np.int32)

                tok = t5_tokenize
                loaded_real_tok = True
            except Exception:
                pass
        if not loaded_real_tok and os.path.isfile(spm_file):
            # sentencepiece fallback — also when tokenizer.json exists but
            # fails to load: models/tokenizer.T5SpmTokenizer rebuilds the
            # unigram model from the spm protobuf (no sentencepiece package
            # in this image)
            try:
                from sliders_conceptmod_tpu.models.tokenizer import T5SpmTokenizer

                tok = T5SpmTokenizer(spm_file, max_length=seq_t5)
            except Exception:
                pass

        def encode_fn(prompt: str):
            ids = jnp.asarray(tok([prompt]))
            text = t5_model.apply({"params": t5_params}, ids)[0]
            pooled = te1.apply(jnp.asarray(te1.tokenizer([prompt]))).pooled_output[0]
            return text, pooled

        # text-encoder slider support (adapters/slider_file.py): expose the
        # encoder param trees (te1=CLIP, te2=T5 — reference notrigger FLUX.1
        # prefixes, train_notrigger.py:184-196) and a merged-params encode
        encode_fn.text_encoder_params = [te1.params, t5_params]

        def encode_core(params_list, clip_ids, t5_ids):
            """Pure array→array encode (params as ARGUMENTS — jittable by
            callers that merge te-slider factors inside the same trace, so a
            scale sweep is one executable, not an eager T5-XXL forward per
            (prompt, scale))."""
            clip_p, t5_p = params_list
            text = t5_model.apply({"params": t5_p}, t5_ids)[0]
            pooled = te1.model.apply({"params": clip_p}, clip_ids).pooled_output[0]
            return text, pooled

        def tokenize(prompt: str):
            return jnp.asarray(te1.tokenizer([prompt])), jnp.asarray(tok([prompt]))

        def encode_with_merged(prompt: str, merged_list):
            clip_ids, t5_ids = tokenize(prompt)
            return encode_core(tuple(merged_list), clip_ids, t5_ids)

        encode_fn.encode_core = encode_core
        encode_fn.tokenize = tokenize
        encode_fn.encode_with_merged = encode_with_merged

    else:

        def encode_fn(prompt: str):
            """T5-slot pseudo-embeddings + CLIP-slot pooled stub (weightless)."""
            ids = tok([prompt])[0]
            k = jax.random.PRNGKey(int(np.asarray(ids, np.int64).sum()) % (2**31))
            text = jax.random.normal(k, (seq_t5, flux_cfg.joint_attention_dim)) * 0.1
            pooled = (
                jax.random.normal(jax.random.fold_in(k, 1), (flux_cfg.pooled_projection_dim,)) * 0.1
            )
            return text.astype(weight_dtype), pooled.astype(weight_dtype)

    gh = gw = 4
    if is_quant_artifact:
        from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler as _FMS
        from sliders_conceptmod_tpu.io import quant_cache

        q_params, q_scales = quant_cache.load_quantized(str(name_or_path), dtype=weight_dtype)

        # dev vs schnell from the tree itself (module-level _tree_has — the
        # guidance embedder nests under time_text_embed, models/flux.py)
        if not is_tiny:
            has_guidance = _tree_has(q_params, "guidance_embedder")
            if has_guidance != flux_cfg.guidance_embeds:
                flux_cfg = FluxConfig.dev() if has_guidance else FluxConfig.schnell()
                model = FluxTransformer2DModel(flux_cfg, dtype=weight_dtype)
        transformer = TransformerBundle(
            model, q_params, flux_cfg,
            default_kwargs={"guidance": 3.5} if flux_cfg.guidance_embeds else None,
            quant_scales=q_scales,
        )
        # like the BFL single file, the artifact carries no text stack — the
        # stub encode_fn keeps the graph identical until T5/CLIP dirs arrive
        return [tok], encode_fn, transformer, _FMS(use_dynamic_shifting=True)
    if is_single_file:
        from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler as _FMS
        from sliders_conceptmod_tpu.io.ldm_convert import load_ldm_checkpoint

        trees = load_ldm_checkpoint(str(name_or_path))

        # the converted tree is authoritative for dev-vs-schnell — the
        # safe_open header sniff above fails on .ckpt files and would
        # silently drop a dev model's guidance conditioning
        if not is_tiny:
            tree_guidance = _tree_has(trees["transformer"], "guidance_embedder")
            if tree_guidance != flux_cfg.guidance_embeds:
                flux_cfg = FluxConfig.dev() if tree_guidance else FluxConfig.schnell()
                model = FluxTransformer2DModel(flux_cfg, dtype=weight_dtype)
        params, quant_scales = _host_params(trees["transformer"], weight_dtype, quantize_base)
        transformer = TransformerBundle(
        model, params, flux_cfg,
        default_kwargs={"guidance": 3.5} if flux_cfg.guidance_embeds else None,
        quant_scales=quant_scales,
    )
        # BFL distributes the text stack separately; the stub encode_fn keeps
        # the training graph identical until T5/CLIP dirs are supplied
        return [tok], encode_fn, transformer, _FMS(use_dynamic_shifting=True)
    if is_local:
        from sliders_conceptmod_tpu.models.flux import convert_flux_state_dict

        sub = os.path.join(str(name_or_path), "transformer")
        sd = tc._load_safetensors_dir(sub)
        params, quant_scales = _host_params(convert_flux_state_dict(sd), weight_dtype, quantize_base)
        transformer = TransformerBundle(
        model, params, flux_cfg,
        default_kwargs={"guidance": 3.5} if flux_cfg.guidance_embeds else None,
        quant_scales=quant_scales,
    )
        scheduler = FlowMatchScheduler(use_dynamic_shifting=True)
        return [tok], encode_fn, transformer, scheduler
    # fused init+cast (see _init_unet): uncast fp32 schnell is 47.6GB — the
    # weightless full-depth tree must come up at weight_dtype or nothing fits
    def _init_params():
        return model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, gh * gw, flux_cfg.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 2, flux_cfg.joint_attention_dim)),
            jnp.zeros((1, flux_cfg.pooled_projection_dim)),
            jnp.zeros((2, 3)),
            jnp.zeros((gh * gw, 3)),
        )["params"]

    quant_scales = None
    if quantize_base:
        from sliders_conceptmod_tpu.adapters import quant

        # fused init→quantize: SAME init values as the unquantized family
        # (up to int8 rounding), so same-seed weightless equivalence holds
        params, quant_scales = quant.quantize_init(_init_params, dtype=weight_dtype)
    else:

        def init_cast():
            return jax.tree.map(lambda a: a.astype(weight_dtype), _init_params())

        params = jax.jit(init_cast)()
    transformer = TransformerBundle(
        model, params, flux_cfg,
        default_kwargs={"guidance": 3.5} if flux_cfg.guidance_embeds else None,
        quant_scales=quant_scales,
    )
    scheduler = FlowMatchScheduler(use_dynamic_shifting=True)
    return [tok], encode_fn, transformer, scheduler


# ---------------------------------------------------------------------------
# prompt encoding (reference train_util.py:108-155, 224-247)
# ---------------------------------------------------------------------------


def encode_prompts(
    te: TextEncoderBundle, prompts: Sequence[str], clip_skip: Optional[int] = None
) -> jnp.ndarray:
    """SD1/2: final hidden state (or clip_skip'd, reference model_util.py:91-109)."""
    ids = jnp.asarray(te.tokenizer(list(prompts)))
    out = te.apply(ids)
    return clip_skip_hidden_state(out, clip_skip)


def encode_prompts_xl(
    text_encoders: List[TextEncoderBundle], prompts: Sequence[str]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XL: concat penultimate hidden states of both encoders; pooled =
    te2's projected pooled output (reference train_util.py:139-155,224-247)."""
    embeds = []
    pooled = None
    for te in text_encoders:
        ids = jnp.asarray(te.tokenizer(list(prompts)))
        out = te.apply(ids)
        embeds.append(penultimate_hidden_state(out))
        pooled = out.projected if out.projected is not None else out.pooled_output
    return jnp.concatenate(embeds, axis=-1), pooled
