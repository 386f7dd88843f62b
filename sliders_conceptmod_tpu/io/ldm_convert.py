"""Single-file SD checkpoint (LDM layout) → flax param trees.

Parity target: the reference loads both HF-hub repos and single-file
``.ckpt``/``.safetensors`` checkpoints (``model_util.py:37-109``, via
diffusers' ``download_from_original_stable_diffusion_ckpt``). This module is
the from-scratch LDM→diffusers key mapping for SD1.x/2.x: UNet
(``model.diffusion_model.``), VAE (``first_stage_model.``) and CLIP
(``cond_stage_model.transformer.``), composed with io/torch_convert.py's
layout rules to produce flax trees directly.

Layout notes:
* LDM UNet input/output blocks flatten to (block, layer) by //3 and %3;
  downsamplers sit at input_blocks {3,6,9}, upsamplers inside output block
  slots (the last module of output_blocks {2,5,8}),
* LDM VAE attention q/k/v/proj_out are 1×1 convs — squeezed to the Linear
  layout diffusers (and models/vae.py) use; decoder ``up.{i}`` indices are
  REVERSED relative to diffusers ``up_blocks``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sliders_conceptmod_tpu.io.torch_convert import (
    _assign,
    convert_clip_text_state_dict,
    convert_openclip_text_state_dict,
    torch_entry_to_flax,
)

UNET_PREFIX = "model.diffusion_model."
VAE_PREFIX = "first_stage_model."
CLIP_PREFIX = "cond_stage_model.transformer."
OPENCLIP_PREFIX = "cond_stage_model.model."  # SD2.x OpenCLIP ViT-H text tower
# SDXL single files carry both towers under conditioner.embedders
XL_TE1_PREFIX = "conditioner.embedders.0.transformer."  # CLIP ViT-L (transformers layout)
XL_TE2_PREFIX = "conditioner.embedders.1.model."  # OpenCLIP ViT-bigG (CLIP layout)
# SD3 single files (sd3_medium.safetensors): MMDiT under model.diffusion_model,
# optional transformers-layout towers under text_encoders.*
SD3_TE1_PREFIX = "text_encoders.clip_l.transformer."
SD3_TE2_PREFIX = "text_encoders.clip_g.transformer."
SD3_TE3_PREFIX = "text_encoders.t5xxl.transformer."

_RESNET_RENAMES = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _rename_unet_key(key: str) -> str:
    """LDM diffusion_model key → diffusers UNet key (without prefix)."""
    parts = key.split(".")

    if parts[0] == "time_embed":
        idx = {"0": "linear_1", "2": "linear_2"}[parts[1]]
        return ".".join(["time_embedding", idx] + parts[2:])
    if parts[0] == "label_emb":
        # SDXL text_time addition embedding: label_emb.0.{0,2} -> add_embedding
        idx = {"0": "linear_1", "2": "linear_2"}[parts[2]]
        return ".".join(["add_embedding", idx] + parts[3:])
    if parts[0] == "out":
        mod = {"0": "conv_norm_out", "2": "conv_out"}[parts[1]]
        return ".".join([mod] + parts[2:])

    if parts[0] == "input_blocks":
        i = int(parts[1])
        if i == 0:
            return ".".join(["conv_in"] + parts[3:])
        block, layer = (i - 1) // 3, (i - 1) % 3
        if layer == 2:  # downsample slot
            return ".".join(
                [f"down_blocks.{block}", "downsamplers.0.conv"] + parts[4:]
            )
        sub = parts[2]
        rest = parts[3:]
        if sub == "0":  # resnet
            return ".".join(
                [f"down_blocks.{block}.resnets.{layer}", _resnet_tail(rest)]
            )
        return ".".join([f"down_blocks.{block}.attentions.{layer}"] + _attn_tail(rest))

    if parts[0] == "middle_block":
        sub = parts[1]
        rest = parts[2:]
        if sub == "0":
            return ".".join(["mid_block.resnets.0", _resnet_tail(rest)])
        if sub == "1":
            return ".".join(["mid_block.attentions.0"] + _attn_tail(rest))
        return ".".join(["mid_block.resnets.1", _resnet_tail(rest)])

    if parts[0] == "output_blocks":
        i = int(parts[1])
        block, layer = i // 3, i % 3
        sub = parts[2]
        rest = parts[3:]
        if sub == "0":
            return ".".join([f"up_blocks.{block}.resnets.{layer}", _resnet_tail(rest)])
        # sub >= 1: attention OR upsampler conv
        if rest and rest[0] == "conv":  # upsampler (SD1 uses .conv directly)
            return ".".join([f"up_blocks.{block}.upsamplers.0.conv"] + rest[1:])
        return ".".join([f"up_blocks.{block}.attentions.{layer}"] + _attn_tail(rest))

    raise ValueError(f"Unmapped LDM UNet key: {key}")


def _resnet_tail(rest) -> str:
    joined = ".".join(rest[:-1])
    leaf = rest[-1]
    return _RESNET_RENAMES.get(joined, joined) + "." + leaf


def _attn_tail(rest) -> list:
    # LDM SpatialTransformer keys already match diffusers Transformer2D
    # naming (norm, proj_in, transformer_blocks.N.attn1.to_q ...)
    return rest


_VAE_MID_ATTN = {
    "q": "to_q",
    "k": "to_k",
    "v": "to_v",
    "proj_out": "to_out.0",
    "norm": "group_norm",
}


def _rename_vae_key(key: str, num_up_blocks: int = 4) -> Tuple[str, bool]:
    """LDM first_stage_model key → diffusers VAE key (without prefix).
    Returns (key, squeeze_attn_conv)."""
    parts = key.split(".")
    squeeze = False

    def resnet_tail(rest):
        joined = ".".join(rest[:-1])
        renames = {"nin_shortcut": "conv_shortcut"}
        return renames.get(joined, joined) + "." + rest[-1]

    if parts[0] in ("encoder", "decoder"):
        side = parts[0]
        body = parts[1:]
        if body[0] == "conv_in" or body[0] == "conv_out":
            return ".".join([side] + body), False
        if body[0] == "norm_out":
            return ".".join([side, "conv_norm_out"] + body[1:]), False
        if body[0] == "mid":
            sub = body[1]
            if sub == "block_1":
                return ".".join([side, "mid_block.resnets.0", resnet_tail(body[2:])]), False
            if sub == "block_2":
                return ".".join([side, "mid_block.resnets.1", resnet_tail(body[2:])]), False
            if sub == "attn_1":
                mod = _VAE_MID_ATTN[body[2]]
                squeeze = body[2] != "norm"
                return ".".join([side, "mid_block.attentions.0", mod] + body[3:]), squeeze
        if body[0] == "down":
            i = int(body[1])
            if body[2] == "block":
                return (
                    ".".join([side, f"down_blocks.{i}.resnets.{body[3]}", resnet_tail(body[4:])]),
                    False,
                )
            if body[2] == "downsample":
                return ".".join([side, f"down_blocks.{i}.downsamplers.0"] + body[3:]), False
        if body[0] == "up":
            i = int(body[1])
            rev = num_up_blocks - 1 - i  # LDM decoder up indices are reversed
            if body[2] == "block":
                return (
                    ".".join([side, f"up_blocks.{rev}.resnets.{body[3]}", resnet_tail(body[4:])]),
                    False,
                )
            if body[2] == "upsample":
                return ".".join([side, f"up_blocks.{rev}.upsamplers.0"] + body[3:]), False
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return key, False
    raise ValueError(f"Unmapped LDM VAE key: {key}")


def _swap_scale_shift(value: np.ndarray) -> np.ndarray:
    """SGM AdaLN heads emit (shift, scale); diffusers (and models/mmdit.py's
    AdaLayerNormContinuous) chunk (scale, shift) — swap the two halves."""
    half = value.shape[0] // 2
    return np.concatenate([value[half:], value[:half]], axis=0)


def convert_sd3_mmdit_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """SD3 single-file MMDiT (``model.diffusion_model.joint_blocks...``, the
    SGM/MM-DiT layout of sd3_medium.safetensors) → models/mmdit.py flax tree.

    Follows the same renames diffusers' single-file SD3 conversion applies:
    fused qkv splits into to_q/to_k/to_v (add_* for the context stream),
    adaLN_modulation.1 → norm1*.linear / norm_out.linear, with the
    (shift, scale) → (scale, shift) swap on the 2·dim heads.
    """
    tree: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        parts = key.split(".")
        if parts[0] == "pos_embed":
            continue  # deterministic 2D sin-cos table; recomputed at apply
        mapped = None
        if parts[0] == "x_embedder":
            mapped = ".".join(["pos_embed"] + parts[1:])
        elif parts[0] in ("t_embedder", "y_embedder"):
            sub = "timestep_embedder" if parts[0] == "t_embedder" else "text_embedder"
            lin = {"0": "linear_1", "2": "linear_2"}[parts[2]]
            mapped = ".".join(["time_text_embed", sub, lin] + parts[3:])
        elif parts[0] == "context_embedder":
            mapped = key
        elif parts[0] == "final_layer":
            if parts[1] == "adaLN_modulation":
                value = _swap_scale_shift(value)
                mapped = ".".join(["norm_out", "linear"] + parts[3:])
            else:  # final_layer.linear
                mapped = ".".join(["proj_out"] + parts[2:])
        elif parts[0] == "joint_blocks":
            n, stream = parts[1], parts[2]
            base = f"transformer_blocks.{n}."
            ctx = stream == "context_block"
            rest = parts[3:]
            if rest[0] == "attn" and rest[1] == "qkv":
                names = ("add_q_proj", "add_k_proj", "add_v_proj") if ctx else ("to_q", "to_k", "to_v")
                for name, chunk in zip(names, np.split(value, 3, axis=0)):
                    entry = torch_entry_to_flax(base + f"attn.{name}.{rest[2]}", chunk)
                    _assign(tree, entry[0], entry[1])
                continue
            if rest[0] == "attn" and rest[1] == "proj":
                mapped = base + ("attn.to_add_out." if ctx else "attn.to_out.0.") + rest[2]
            elif rest[0] == "adaLN_modulation":
                # the final block's context head is 2·dim (AdaLayerNormContinuous,
                # needs the swap); infer from the sibling weight's shape so the
                # bias swaps consistently
                w_key = ".".join(parts[:-1] + ["weight"])
                w = np.asarray(sd[w_key])
                if ctx and w.shape[0] == 2 * w.shape[1]:
                    value = _swap_scale_shift(value)
                mapped = base + ("norm1_context.linear." if ctx else "norm1.linear.") + rest[2]
            elif rest[0] == "mlp":
                fc = {"fc1": "net.0.proj", "fc2": "net.2"}[rest[1]]
                mapped = base + ("ff_context." if ctx else "ff.") + fc + "." + rest[2]
            else:
                raise ValueError(f"Unmapped SD3 MMDiT key: {key}")
        else:
            raise ValueError(f"Unmapped SD3 MMDiT key: {key}")
        entry = torch_entry_to_flax(mapped, value)
        if entry:
            _assign(tree, entry[0], entry[1])
    return tree


def convert_flux_bfl_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """BFL single-file Flux transformer (``flux1-dev.safetensors``:
    double_blocks/single_blocks at the top level, fused qkv and qkv+mlp
    linears) → models/flux.py flax tree. Text encoders/VAE ship separately
    in the BFL distribution, so this handles the transformer only."""
    from sliders_conceptmod_tpu.models.flux import convert_flux_state_dict

    hf_sd: Dict[str, np.ndarray] = {}

    def put(key, value):
        hf_sd[key] = value

    for key, value in sd.items():
        value = np.asarray(value)
        parts = key.split(".")
        if parts[0] == "img_in":
            put("x_embedder." + parts[1], value)
        elif parts[0] == "txt_in":
            put("context_embedder." + parts[1], value)
        elif parts[0] in ("time_in", "vector_in", "guidance_in"):
            sub = {
                "time_in": "timestep_embedder",
                "vector_in": "text_embedder",
                "guidance_in": "guidance_embedder",
            }[parts[0]]
            lin = {"in_layer": "linear_1", "out_layer": "linear_2"}[parts[1]]
            put(f"time_text_embed.{sub}.{lin}.{parts[2]}", value)
        elif parts[0] == "final_layer":
            if parts[1] == "adaLN_modulation":
                put("norm_out.linear." + parts[3], _swap_scale_shift(value))
            else:
                put("proj_out." + parts[2], value)
        elif parts[0] == "double_blocks":
            n, mod, rest = parts[1], parts[2], parts[3:]
            base = f"transformer_blocks.{n}."
            txt = mod.startswith("txt_")
            kind = mod.split("_", 1)[1]  # mod | attn | mlp
            if kind == "mod":
                put(base + ("norm1_context.linear." if txt else "norm1.linear.") + rest[1], value)
            elif kind == "mlp":
                fc = {"0": "ff_context.net.0.proj" if txt else "ff.net.0.proj",
                      "2": "ff_context.net.2" if txt else "ff.net.2"}[rest[0]]
                put(base + fc + "." + rest[1], value)
            elif kind == "attn":
                if rest[0] == "qkv":
                    names = (
                        ("add_q_proj", "add_k_proj", "add_v_proj")
                        if txt
                        else ("to_q", "to_k", "to_v")
                    )
                    for name, chunk in zip(names, np.split(value, 3, axis=0)):
                        put(base + f"attn.{name}.{rest[1]}", chunk)
                elif rest[0] == "norm":
                    which = "q" if rest[1] == "query_norm" else "k"
                    name = f"norm_added_{which}" if txt else f"norm_{which}"
                    put(base + f"attn.{name}.weight", value)
                else:  # proj
                    put(base + ("attn.to_add_out." if txt else "attn.to_out.0.") + rest[1], value)
        elif parts[0] == "single_blocks":
            n, mod, rest = parts[1], parts[2], parts[3:]
            base = f"single_transformer_blocks.{n}."
            if mod == "linear1":
                d = value.shape[0] // 7  # rows: 3d qkv + 4d mlp
                q, k, v, mlp = np.split(value, [d, 2 * d, 3 * d], axis=0)
                put(base + "attn.to_q." + rest[0], q)
                put(base + "attn.to_k." + rest[0], k)
                put(base + "attn.to_v." + rest[0], v)
                put(base + "proj_mlp." + rest[0], mlp)
            elif mod == "linear2":
                put(base + "proj_out." + rest[0], value)
            elif mod == "norm":
                which = "q" if rest[0] == "query_norm" else "k"
                put(base + f"attn.norm_{which}.weight", value)
            elif mod == "modulation":
                put(base + "norm.linear." + rest[1], value)
            else:
                raise ValueError(f"Unmapped BFL Flux key: {key}")
        else:
            raise ValueError(f"Unmapped BFL Flux key: {key}")
    return convert_flux_state_dict(hf_sd)


def convert_ldm_checkpoint(sd: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Split + convert a full LDM state dict → {"unet", "vae", "text_encoder"}
    flax trees. SD1.x text towers are transformers-layout under
    ``cond_stage_model.transformer.``; SD2.x ships an OpenCLIP tower under
    ``cond_stage_model.model.`` (mapped via convert_openclip_text_state_dict,
    trimmed to the 23 deployed layers)."""
    unet_tree: Dict = {}
    vae_tree: Dict = {}
    clip_sd: Dict[str, np.ndarray] = {}
    openclip_sd: Dict[str, np.ndarray] = {}
    xl_te1_sd: Dict[str, np.ndarray] = {}
    xl_te2_sd: Dict[str, np.ndarray] = {}

    # BFL Flux single files keep the transformer at the TOP level
    if any(k.startswith(("double_blocks.", "single_blocks.")) for k in sd):
        return {"transformer": convert_flux_bfl_state_dict(sd)}

    # SD3: MMDiT shares the model.diffusion_model prefix but is a different
    # architecture (joint_blocks); split it out before the UNet renamer runs
    if any(k.startswith(UNET_PREFIX + "joint_blocks.") for k in sd):
        mmdit_sd = {k[len(UNET_PREFIX):]: v for k, v in sd.items() if k.startswith(UNET_PREFIX)}
        out: Dict[str, Dict] = {"transformer": convert_sd3_mmdit_state_dict(mmdit_sd)}
        vae_sd = {k: v for k, v in sd.items() if k.startswith(VAE_PREFIX)}
        if vae_sd:
            out["vae"] = convert_ldm_checkpoint(vae_sd)["vae"]
        for prefix, name in (
            (SD3_TE1_PREFIX, "text_encoder"),
            (SD3_TE2_PREFIX, "text_encoder_2"),
        ):
            te_sd = {k[len(prefix):]: np.asarray(v) for k, v in sd.items() if k.startswith(prefix)}
            if te_sd:
                out[name] = convert_clip_text_state_dict(te_sd)
        t5_sd = {
            k[len(SD3_TE3_PREFIX):]: np.asarray(v)
            for k, v in sd.items()
            if k.startswith(SD3_TE3_PREFIX)
        }
        if t5_sd:
            from sliders_conceptmod_tpu.models.t5 import convert_t5_state_dict

            out["text_encoder_3"] = convert_t5_state_dict(t5_sd)
        return out

    # decoder depth from the checkpoint itself (SD1/2 have 4 up blocks, but
    # the reversed-index math must hold for any depth)
    up_indices = [
        int(k[len(VAE_PREFIX):].split(".")[2])
        for k in sd
        if k.startswith(VAE_PREFIX + "decoder.up.")
    ]
    num_up_blocks = max(up_indices) + 1 if up_indices else 4

    for key, value in sd.items():
        value = np.asarray(value)
        if key.startswith(UNET_PREFIX):
            mapped = _rename_unet_key(key[len(UNET_PREFIX):])
            entry = torch_entry_to_flax(mapped, value)
            if entry:
                _assign(unet_tree, entry[0], entry[1])
        elif key.startswith(VAE_PREFIX):
            mapped, squeeze = _rename_vae_key(key[len(VAE_PREFIX):], num_up_blocks)
            if squeeze and value.ndim == 4:  # 1x1 conv -> Linear
                value = value[:, :, 0, 0]
            entry = torch_entry_to_flax(mapped, value)
            if entry:
                _assign(vae_tree, entry[0], entry[1])
        elif key.startswith(XL_TE1_PREFIX):
            xl_te1_sd[key[len(XL_TE1_PREFIX):]] = value
        elif key.startswith(XL_TE2_PREFIX):
            xl_te2_sd[key[len(XL_TE2_PREFIX):]] = value
        elif key.startswith(CLIP_PREFIX):
            clip_sd[key[len(CLIP_PREFIX):]] = value
        elif key.startswith(OPENCLIP_PREFIX):
            openclip_sd[key[len(OPENCLIP_PREFIX):]] = value

    out = {"unet": unet_tree, "vae": vae_tree}
    if xl_te1_sd:
        out["text_encoder"] = convert_clip_text_state_dict(xl_te1_sd)
    if xl_te2_sd:
        # bigG keeps all its layers (SDXL takes the penultimate state at
        # runtime; no deploy-time trim, unlike SD2's 23/24)
        out["text_encoder_2"] = convert_openclip_text_state_dict(xl_te2_sd)
    if clip_sd:
        out["text_encoder"] = convert_clip_text_state_dict(clip_sd)
    elif openclip_sd:
        n_layers = 1 + max(
            int(k.split(".")[2]) for k in openclip_sd if k.startswith("transformer.resblocks.")
        )
        out["text_encoder"] = convert_openclip_text_state_dict(
            openclip_sd, max_layers=min(n_layers, 23)
        )
    return out


def load_ldm_checkpoint(path: str) -> Dict[str, Dict]:
    if str(path).endswith(".safetensors"):
        from sliders_conceptmod_tpu.io.native import load_safetensors_native

        sd = load_safetensors_native(path)
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.float().numpy() for k, v in data.get("state_dict", data).items()}
    return convert_ldm_checkpoint(sd)
