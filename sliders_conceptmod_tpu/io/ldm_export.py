"""Flax param trees → single-file LDM checkpoint (the exact inverse of
io/ldm_convert.py).

The reference only CONSUMES single-file checkpoints (model_util.py:37-109 via
diffusers); this exporter is the round-trip counterpart: it lets this
framework WRITE an SD1/SD2-layout ``.safetensors`` from flax params, which

* gives users a path back to the single-file ecosystem (A1111 & friends), and
* makes the whole LDM key mapping testable as a loss-free round trip and the
  single-file loading surface drivable at tiny scale (no 5GB fixture needed).

Scope: SD-standard UNet topology (``layers_per_block == 2`` — the universal
SD1/SD2 layout the LDM ``//3`` slot math encodes), the SD2 OpenCLIP text
tower (``cond_stage_model.model.*``), and the KL VAE.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# flax module names where a trailing _<digit> is part of the torch name
# itself, not a merged list index (io/torch_convert.py _merge_numeric)
_KEEP_UNDERSCORE = {
    "linear_1",
    "linear_2",
    "mlp_fc1",
    "mlp_fc2",
    "block_1",
    "block_2",
    "attn_1",
    # Flux flattened Dense names (models/flux.py)
    "ff_net_2",
    "ff_context_net_2",
}

_RESNET_INV = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}


def _split_segment(seg: str) -> list:
    if seg in _KEEP_UNDERSCORE:
        return [seg]
    head, _, tail = seg.rpartition("_")
    if head and tail.isdigit():
        return [head, tail]
    return [seg]


def _flax_to_torch_entries(tree: Dict, path=()) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.torch_entry_to_flax over a whole tree:
    nested flax dict → flat diffusers-style torch key/value dict."""
    out: Dict[str, np.ndarray] = {}
    for name, node in tree.items():
        if isinstance(node, dict):
            out.update(_flax_to_torch_entries(node, path + tuple(_split_segment(name))))
            continue
        value = np.asarray(node)
        key = ".".join(path)
        if name == "kernel":
            if value.ndim == 4:  # HWIO -> OIHW
                out[key + ".weight"] = np.ascontiguousarray(np.transpose(value, (3, 2, 0, 1)))
            else:  # [in, out] -> [out, in]
                out[key + ".weight"] = np.ascontiguousarray(value.T)
        elif name == "scale":
            out[key + ".weight"] = value
        elif name == "embedding":
            out[key + ".weight"] = value
        elif name == "bias":
            out[key + ".bias"] = value
        else:
            raise ValueError(f"Unexpected flax leaf {name} at {key}")
    return out


def _unet_key_to_ldm(key: str, attn_up_blocks) -> str:
    """diffusers UNet key → LDM diffusion_model key (inverse of
    ldm_convert._rename_unet_key; assumes layers_per_block == 2)."""
    parts = key.split(".")
    if parts[0] == "time_embedding":
        idx = {"linear_1": "0", "linear_2": "2"}[parts[1]]
        return ".".join(["time_embed", idx] + parts[2:])
    if parts[0] == "add_embedding":
        idx = {"linear_1": "0", "linear_2": "2"}[parts[1]]
        return ".".join(["label_emb", "0", idx] + parts[2:])
    if parts[0] == "conv_norm_out":
        return ".".join(["out", "0"] + parts[1:])
    if parts[0] == "conv_out":
        return ".".join(["out", "2"] + parts[1:])
    if parts[0] == "conv_in":
        return ".".join(["input_blocks", "0", "0"] + parts[1:])

    def resnet_inv(rest):
        tail = _RESNET_INV[rest[0]]
        return tail.split(".") + rest[1:]

    if parts[0] == "down_blocks":
        block, kind, layer = int(parts[1]), parts[2], int(parts[3])
        if kind == "resnets":
            return ".".join(["input_blocks", str(1 + 3 * block + layer), "0"] + resnet_inv(parts[4:]))
        if kind == "attentions":
            return ".".join(["input_blocks", str(1 + 3 * block + layer), "1"] + parts[4:])
        if kind == "downsamplers":
            return ".".join(["input_blocks", str(3 * block + 3), "0", "op"] + parts[5:])
    if parts[0] == "mid_block":
        kind, layer = parts[1], parts[2]
        if kind == "attentions":
            return ".".join(["middle_block", "1"] + parts[3:])
        return ".".join(["middle_block", "0" if layer == "0" else "2"] + resnet_inv(parts[3:]))
    if parts[0] == "up_blocks":
        block, kind, layer = int(parts[1]), parts[2], int(parts[3])
        if kind == "resnets":
            return ".".join(["output_blocks", str(3 * block + layer), "0"] + resnet_inv(parts[4:]))
        if kind == "attentions":
            return ".".join(["output_blocks", str(3 * block + layer), "1"] + parts[4:])
        if kind == "upsamplers":
            sub = "2" if block in attn_up_blocks else "1"
            return ".".join(["output_blocks", str(3 * block + 2), sub, "conv"] + parts[5:])
    raise ValueError(f"Cannot export UNet key: {key}")


def export_unet(unet_params: Dict) -> Dict[str, np.ndarray]:
    torch_sd = _flax_to_torch_entries(unet_params)
    attn_up_blocks = {
        int(k.split(".")[1]) for k in torch_sd if k.startswith("up_blocks") and ".attentions." in k
    }
    return {
        "model.diffusion_model." + _unet_key_to_ldm(k, attn_up_blocks): v
        for k, v in torch_sd.items()
    }


def export_openclip_text(
    te_params: Dict, prefix: str = "cond_stage_model.model."
) -> Dict[str, np.ndarray]:
    """Flax CLIP text tree → OpenCLIP layout (SD2's ``cond_stage_model.model.*``
    or SDXL te2's ``conditioner.embedders.1.model.*``).

    Inverse of torch_convert.convert_openclip_text_state_dict: re-fuses the
    q/k/v projections into ``attn.in_proj_*`` and restores the original CLIP
    module names.
    """
    out: Dict[str, np.ndarray] = {}
    p = prefix
    out[p + "token_embedding.weight"] = np.asarray(te_params["token_embedding"]["embedding"])
    out[p + "positional_embedding"] = np.asarray(te_params["position_embedding"]["embedding"])
    out[p + "ln_final.weight"] = np.asarray(te_params["final_layer_norm"]["scale"])
    out[p + "ln_final.bias"] = np.asarray(te_params["final_layer_norm"]["bias"])
    if "text_projection" in te_params:
        # flax kernel [width, proj] IS the openclip x @ W layout
        out[p + "text_projection"] = np.asarray(te_params["text_projection"]["kernel"])
    layers = sorted(
        (int(k.split("_")[1]), v) for k, v in te_params.items() if k.startswith("layers_")
    )
    for i, layer in layers:
        d = p + f"transformer.resblocks.{i}."
        attn = layer["self_attn"]
        out[d + "attn.in_proj_weight"] = np.concatenate(
            [np.asarray(attn[n]["kernel"]).T for n in ("q_proj", "k_proj", "v_proj")], axis=0
        )
        out[d + "attn.in_proj_bias"] = np.concatenate(
            [np.asarray(attn[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")], axis=0
        )
        out[d + "attn.out_proj.weight"] = np.ascontiguousarray(
            np.asarray(attn["out_proj"]["kernel"]).T
        )
        out[d + "attn.out_proj.bias"] = np.asarray(attn["out_proj"]["bias"])
        for flax_name, oc_name in (
            ("layer_norm1", "ln_1"),
            ("layer_norm2", "ln_2"),
            ("mlp_fc1", "mlp.c_fc"),
            ("mlp_fc2", "mlp.c_proj"),
        ):
            sub = layer[flax_name]
            w = np.asarray(sub.get("kernel", sub.get("scale")))
            out[d + oc_name + ".weight"] = np.ascontiguousarray(w.T if w.ndim == 2 else w)
            out[d + oc_name + ".bias"] = np.asarray(sub["bias"])
    return out


def export_clip_text(
    te_params: Dict, prefix: str = "cond_stage_model.transformer."
) -> Dict[str, np.ndarray]:
    """Flax CLIP text tree → transformers layout (SD1's
    ``cond_stage_model.transformer.text_model...`` or SDXL te1's
    ``conditioner.embedders.0.transformer...`` — the inverse of
    torch_convert.convert_clip_text_state_dict)."""
    torch_sd = _flax_to_torch_entries(te_params)
    p = prefix
    out: Dict[str, np.ndarray] = {}
    for key, value in torch_sd.items():
        key = key.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
        if key.startswith("layers."):
            out[p + "text_model.encoder." + key] = value
        elif key.startswith("final_layer_norm."):
            out[p + "text_model." + key] = value
        elif key == "text_projection.weight":
            out[p + key] = value
        elif key == "token_embedding.weight":
            out[p + "text_model.embeddings.token_embedding.weight"] = value
        elif key == "position_embedding.weight":
            out[p + "text_model.embeddings.position_embedding.weight"] = value
        else:
            raise ValueError(f"Cannot export CLIP key: {key}")
    return out


def export_ldm_checkpoint(
    unet_params: Dict,
    text_encoder_params: Dict = None,
    vae_params: Dict = None,
    v2: bool = True,
) -> Dict[str, np.ndarray]:
    sd = export_unet(unet_params)
    if text_encoder_params is not None:
        if v2:
            sd.update(export_openclip_text(text_encoder_params))
        else:
            sd.update(export_clip_text(text_encoder_params))
    if vae_params is not None:
        sd.update(export_vae(vae_params))
    return sd


def export_sdxl_checkpoint(
    unet_params: Dict,
    te1_params: Dict = None,
    te2_params: Dict = None,
    vae_params: Dict = None,
) -> Dict[str, np.ndarray]:
    """SDXL single-file layout: both text towers under conditioner.embedders
    (te1 transformers layout, te2 OpenCLIP bigG layout)."""
    sd = export_unet(unet_params)
    if te1_params is not None:
        sd.update(export_clip_text(te1_params, prefix="conditioner.embedders.0.transformer."))
    if te2_params is not None:
        sd.update(export_openclip_text(te2_params, prefix="conditioner.embedders.1.model."))
    if vae_params is not None:
        sd.update(export_vae(vae_params))
    return sd


# the (shift,scale)<->(scale,shift) swap is its own inverse — share ONE
# implementation with the importer so the roundtrip pair can't desynchronize
from sliders_conceptmod_tpu.io.ldm_convert import _swap_scale_shift  # noqa: E402


def export_sd3_mmdit(params: Dict) -> Dict[str, np.ndarray]:
    """Flax MMDiT tree → SD3 single-file SGM layout (inverse of
    ldm_convert.convert_sd3_mmdit_state_dict): re-fuses q/k/v into
    ``attn.qkv`` and swaps the 2·dim AdaLN heads back to (shift, scale)."""
    torch_sd = _flax_to_torch_entries(params)
    out: Dict[str, np.ndarray] = {}
    p = "model.diffusion_model."
    qkv_parts: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in torch_sd.items():
        parts = key.split(".")
        if parts[0] == "pos_embed":  # PatchEmbedProj conv
            out[p + "x_embedder." + ".".join(parts[1:])] = value
            continue
        if parts[0] == "time_text_embed":
            emb = "t_embedder" if parts[1] == "timestep_embedder" else "y_embedder"
            lin = {"linear_1": "0", "linear_2": "2"}[parts[2]]
            out[p + f"{emb}.mlp.{lin}." + parts[3]] = value
            continue
        if parts[0] == "context_embedder":
            out[p + key] = value
            continue
        if parts[0] == "norm_out":
            out[p + "final_layer.adaLN_modulation.1." + parts[2]] = _swap_scale_shift(value)
            continue
        if parts[0] == "proj_out":
            out[p + "final_layer.linear." + parts[1]] = value
            continue
        if parts[0] == "transformer_blocks":
            n = parts[1]
            rest = parts[2:]
            xb, cb = f"joint_blocks.{n}.x_block.", f"joint_blocks.{n}.context_block."
            if rest[0] == "attn":
                name, leaf = rest[1], rest[-1]
                if name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
                    blk = cb if name.startswith("add_") else xb
                    slot = {"q": 0, "k": 1, "v": 2}[name.replace("add_", "to_")[3]]
                    qkv_parts.setdefault(p + blk + "attn.qkv." + leaf, {})[str(slot)] = value
                    continue
                if name == "to_out":
                    out[p + xb + "attn.proj." + leaf] = value
                    continue
                if name == "to_add_out":
                    out[p + cb + "attn.proj." + leaf] = value
                    continue
            if rest[0] in ("norm1", "norm1_context"):
                blk = cb if rest[0] == "norm1_context" else xb
                if rest[0] == "norm1_context":
                    # final block's 2·dim AdaLayerNormContinuous head swaps;
                    # detect via the sibling weight so the bias follows
                    w = torch_sd[".".join(parts[:-1] + ["weight"])]
                    if w.shape[0] == 2 * w.shape[1]:
                        value = _swap_scale_shift(value)
                out[p + blk + "adaLN_modulation.1." + rest[2]] = value
                continue
            if rest[0] in ("ff", "ff_context"):
                blk = cb if rest[0] == "ff_context" else xb
                fc = "fc1" if rest[1] == "net" and rest[2] == "0" else "fc2"
                out[p + blk + "mlp." + fc + "." + rest[-1]] = value
                continue
        raise ValueError(f"Cannot export SD3 MMDiT key: {key}")
    for key, chunks in qkv_parts.items():
        out[key] = np.concatenate([chunks["0"], chunks["1"], chunks["2"]], axis=0)
    return out


def export_flux_bfl(params: Dict) -> Dict[str, np.ndarray]:
    """Flax Flux tree → BFL single-file layout (inverse of
    ldm_convert.convert_flux_bfl_state_dict): re-fuses qkv (+mlp for the
    single-stream linear1) and restores the img_/txt_ stream names."""
    torch_sd = _flax_to_torch_entries(params)
    out: Dict[str, np.ndarray] = {}
    fused: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in torch_sd.items():
        parts = key.split(".")
        if parts[0] == "x_embedder":
            out["img_in." + parts[1]] = value
        elif parts[0] == "context_embedder":
            out["txt_in." + parts[1]] = value
        elif parts[0] == "time_text_embed":
            emb = {
                "timestep_embedder": "time_in",
                "text_embedder": "vector_in",
                "guidance_embedder": "guidance_in",
            }[parts[1]]
            lin = {"linear_1": "in_layer", "linear_2": "out_layer"}[parts[2]]
            out[f"{emb}.{lin}.{parts[3]}"] = value
        elif parts[0] == "norm_out":
            out["final_layer.adaLN_modulation.1." + parts[2]] = _swap_scale_shift(value)
        elif parts[0] == "proj_out":
            out["final_layer.linear." + parts[1]] = value
        elif parts[0] == "transformer_blocks":
            n, rest = parts[1], parts[2:]
            base = f"double_blocks.{n}."
            if rest[0] == "norm1":
                out[base + "img_mod.lin." + rest[2]] = value
            elif rest[0] == "norm1_context":
                out[base + "txt_mod.lin." + rest[2]] = value
            elif rest[0] in ("ff_net_0_proj", "ff_net_2", "ff_context_net_0_proj", "ff_context_net_2"):
                stream = "txt_mlp" if rest[0].startswith("ff_context") else "img_mlp"
                idx = "0" if rest[0].endswith("proj") else "2"
                out[base + f"{stream}.{idx}." + rest[-1]] = value
            elif rest[0] == "attn":
                name, leaf = rest[1], rest[-1]
                if name in ("to_q", "to_k", "to_v"):
                    fused.setdefault(base + "img_attn.qkv." + leaf, {})[name[3]] = value
                elif name in ("add_q_proj", "add_k_proj", "add_v_proj"):
                    fused.setdefault(base + "txt_attn.qkv." + leaf, {})[name[4]] = value
                elif name in ("norm_q", "norm_k"):
                    out[base + "img_attn.norm." + ("query_norm" if name[-1] == "q" else "key_norm") + ".scale"] = value
                elif name in ("norm_added_q", "norm_added_k"):
                    out[base + "txt_attn.norm." + ("query_norm" if name[-1] == "q" else "key_norm") + ".scale"] = value
                elif name == "to_out":
                    out[base + "img_attn.proj." + leaf] = value
                elif name == "to_add_out":
                    out[base + "txt_attn.proj." + leaf] = value
                else:
                    raise ValueError(f"Cannot export Flux key: {key}")
            else:
                raise ValueError(f"Cannot export Flux key: {key}")
        elif parts[0] == "single_transformer_blocks":
            n, rest = parts[1], parts[2:]
            base = f"single_blocks.{n}."
            if rest[0] == "norm_linear":
                out[base + "modulation.lin." + rest[1]] = value
            elif rest[0] in ("attn_to_q", "attn_to_k", "attn_to_v", "proj_mlp"):
                slot = {"attn_to_q": "q", "attn_to_k": "k", "attn_to_v": "v", "proj_mlp": "m"}[rest[0]]
                fused.setdefault(base + "linear1." + rest[1], {})[slot] = value
            elif rest[0] in ("attn_norm_q", "attn_norm_k"):
                out[base + "norm." + ("query_norm" if rest[0][-1] == "q" else "key_norm") + ".scale"] = value
            elif rest[0] == "proj_out":
                out[base + "linear2." + rest[1]] = value
        else:
            raise ValueError(f"Cannot export Flux key: {key}")
    for key, chunks in fused.items():
        order = ("q", "k", "v", "m") if "m" in chunks else ("q", "k", "v")
        out[key] = np.concatenate([chunks[s] for s in order], axis=0)
    return out


def export_sd3_checkpoint(
    mmdit_params: Dict,
    te1_params: Dict = None,
    te2_params: Dict = None,
    vae_params: Dict = None,
) -> Dict[str, np.ndarray]:
    sd = export_sd3_mmdit(mmdit_params)
    if te1_params is not None:
        sd.update(export_clip_text(te1_params, prefix="text_encoders.clip_l.transformer."))
    if te2_params is not None:
        sd.update(export_clip_text(te2_params, prefix="text_encoders.clip_g.transformer."))
    if vae_params is not None:
        sd.update(export_vae(vae_params))
    return sd


def _vae_resnet_inv(rest):
    return {
        "norm1": ["norm1"],
        "conv1": ["conv1"],
        "norm2": ["norm2"],
        "conv2": ["conv2"],
        "conv_shortcut": ["nin_shortcut"],
    }[rest[0]] + rest[1:]


_VAE_ATTN_INV = {"to_q": "q", "to_k": "k", "to_v": "v", "group_norm": "norm"}


def export_vae(vae_params: Dict) -> Dict[str, np.ndarray]:
    """Flax KL-VAE tree → LDM first_stage_model layout (inverse of
    ldm_convert._rename_vae_key: decoder up indices re-reverse; the mid
    attention Linears re-expand to 1×1 convs)."""
    torch_sd = _flax_to_torch_entries(vae_params)
    n_up = 1 + max(
        (int(k.split(".")[2]) for k in torch_sd if k.startswith("decoder.up_blocks.")), default=0
    )
    out: Dict[str, np.ndarray] = {}
    for key, value in torch_sd.items():
        parts = key.split(".")
        if parts[0] in ("quant_conv", "post_quant_conv"):
            out["first_stage_model." + key] = value
            continue
        side, body = parts[0], parts[1:]
        if body[0] in ("conv_in", "conv_out"):
            mapped = body
        elif body[0] == "conv_norm_out":
            mapped = ["norm_out"] + body[1:]
        elif body[0] == "mid_block":
            if body[1] == "resnets":
                mapped = ["mid", "block_1" if body[2] == "0" else "block_2"] + _vae_resnet_inv(
                    body[3:]
                )
            else:  # attentions.0
                name = _VAE_ATTN_INV.get(body[3], body[3])
                rest = body[4:]
                if body[3] == "to_out":
                    name, rest = "proj_out", body[5:]
                if value.ndim == 2:  # Linear back to 1x1 conv
                    value = value[:, :, None, None]
                mapped = ["mid", "attn_1", name] + rest
        elif body[0] == "down_blocks":
            i = body[1]
            if body[2] == "resnets":
                mapped = ["down", i, "block", body[3]] + _vae_resnet_inv(body[4:])
            else:  # downsamplers.0.conv
                mapped = ["down", i, "downsample", "conv"] + body[5:]
        elif body[0] == "up_blocks":
            i = str(n_up - 1 - int(body[1]))  # ldm_convert reverses: undo
            if body[2] == "resnets":
                mapped = ["up", i, "block", body[3]] + _vae_resnet_inv(body[4:])
            else:  # upsamplers.0.conv
                mapped = ["up", i, "upsample", "conv"] + body[5:]
        else:
            raise ValueError(f"Cannot export VAE key: {key}")
        out["first_stage_model." + side + "." + ".".join(mapped)] = value
    return out


def save_ldm_checkpoint(path: str, sd: Dict[str, np.ndarray]) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
