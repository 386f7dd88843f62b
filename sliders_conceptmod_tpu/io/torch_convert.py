"""diffusers/transformers torch checkpoints → Flax param trees.

Replaces the reference's L1 model-loading layer
(``conceptmod/textsliders/model_util.py:112-137`` SD1/2, ``:164-208,358-385``
SDXL) for a torch-free runtime: pretrained weights are read straight from
``.safetensors`` shards in a local diffusers-format model directory and
re-laid-out into this repo's flax module trees (which mirror the diffusers
module paths by construction — see models/unet.py, models/vae.py,
models/clip.py docstrings).

Layout rules (torch → flax):
* Linear ``weight [out, in]``  → ``kernel [in, out]`` (transpose)
* Conv   ``weight [out, in, kh, kw]`` → ``kernel [kh, kw, in, out]``
* Group/LayerNorm ``weight`` → ``scale``
* Embedding ``weight`` → ``embedding`` (no transpose; CLIP only)

Key-path rule: dotted names with numeric components merge the index into the
preceding segment (``down_blocks.0`` → ``down_blocks_0``, ``to_out.0`` →
``to_out_0``) — exactly the naming this repo's modules use so the mapping is
mechanical. A handful of CLIP-specific renames (``mlp.fc1`` → ``mlp_fc1``,
embeddings prefix) are table-driven below.

Single-file SD ``.ckpt``/LDM layouts (reference ``model_util.py:37-109``
supports both) are not handled yet — only the diffusers directory layout.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_NUM = re.compile(r"^\d+$")


def _merge_numeric(parts):
    """['down_blocks','0','resnets','1'] -> ['down_blocks_0','resnets_1']"""
    out = []
    for p in parts:
        if _NUM.match(p) and out:
            out[-1] = out[-1] + "_" + p
        else:
            out.append(p)
    return out


def _assign(tree: Dict, path, value):
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def torch_entry_to_flax(key: str, value: np.ndarray) -> Optional[Tuple[Tuple[str, ...], np.ndarray]]:
    """Map one torch state-dict entry to (flax_path, array). Returns None for
    entries with no flax counterpart (e.g. position_ids buffers)."""
    parts = key.split(".")
    leaf = parts[-1]
    path = _merge_numeric(parts[:-1])

    if leaf == "weight":
        if value.ndim == 4:
            return tuple(path) + ("kernel",), np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:
            return tuple(path) + ("kernel",), np.transpose(value, (1, 0))
        if value.ndim == 1:
            return tuple(path) + ("scale",), value
        raise ValueError(f"Unexpected weight ndim for {key}: {value.shape}")
    if leaf == "bias":
        return tuple(path) + ("bias",), value
    if leaf == "position_ids":
        return None
    if leaf == "pos_embed":
        # MMDiT stores its (deterministic) 2D sin-cos table as a buffer;
        # models/mmdit.py recomputes it
        return None
    raise ValueError(f"Unexpected torch param leaf: {key}")


def convert_diffusers_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """UNet or VAE state dict → nested flax params dict."""
    tree: Dict = {}
    for key, value in sd.items():
        entry = torch_entry_to_flax(key, np.asarray(value))
        if entry is None:
            continue
        path, arr = entry
        _assign(tree, path, arr)
    return tree


# --- CLIP text encoder ------------------------------------------------------

_CLIP_PREFIXES = (
    ("text_model.embeddings.token_embedding.weight", ("token_embedding", "embedding")),
    ("text_model.embeddings.position_embedding.weight", ("position_embedding", "embedding")),
)


def convert_clip_text_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """transformers CLIPTextModel(WithProjection) → models/clip.py tree."""
    tree: Dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        matched = False
        for src, path in _CLIP_PREFIXES:
            if key == src:
                _assign(tree, path, value)  # embeddings: no transpose
                matched = True
                break
        if matched:
            continue
        if key.endswith("position_ids"):
            continue
        if key == "text_projection.weight":
            _assign(tree, ("text_projection", "kernel"), value.T)
            continue
        k = key
        for prefix in ("text_model.encoder.", "text_model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        # mlp.fc1 / mlp.fc2 are flattened module names in models/clip.py
        k = k.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
        entry = torch_entry_to_flax(k, value)
        if entry is None:
            continue
        path, arr = entry
        _assign(tree, path, arr)
    return tree


def convert_openclip_text_state_dict(
    sd: Dict[str, np.ndarray], max_layers: int = None
) -> Dict:
    """OpenCLIP text tower (SD2.x LDM ``cond_stage_model.model.*`` layout) →
    models/clip.py tree.

    SD2's conditioner is an OpenCLIP ViT-H text tower stored with the
    original CLIP module names — fused ``attn.in_proj_weight`` qkv, ``ln_1``/
    ``ln_2``, ``c_fc``/``c_proj`` — rather than the transformers layout the
    reference loads via ``StableDiffusionPipeline.from_single_file``
    (reference conceptmod/textsliders/model_util.py:79-96 delegates that
    mapping to diffusers). We rename to the transformers schema and reuse
    :func:`convert_clip_text_state_dict`.

    ``max_layers`` drops trailing transformer blocks: SD2 conditions on the
    penultimate hidden state, so its deployed text encoder keeps 23 of the
    24 checkpoint layers (``CLIPTextConfig.sd2_te``).
    """
    hf_sd: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        value = np.asarray(value)
        if key in ("logit_scale", "text_projection", "text_projection.weight"):
            if key == "text_projection":
                # openclip applies x @ W [width, proj]; transformers stores
                # the [proj, width] Linear weight
                hf_sd["text_projection.weight"] = value.T
            elif key == "text_projection.weight":
                # some exporters (ComfyUI et al.) store the projection as an
                # nn.Linear — already [proj, width], pass through
                hf_sd["text_projection.weight"] = value
            continue
        if key == "token_embedding.weight":
            hf_sd["text_model.embeddings.token_embedding.weight"] = value
            continue
        if key == "positional_embedding":
            hf_sd["text_model.embeddings.position_embedding.weight"] = value
            continue
        if key.startswith("ln_final."):
            hf_sd["text_model.final_layer_norm." + key[len("ln_final."):]] = value
            continue
        if not key.startswith("transformer.resblocks."):
            continue
        rest = key[len("transformer.resblocks."):]
        layer, _, tail = rest.partition(".")
        if max_layers is not None and int(layer) >= max_layers:
            continue
        base = f"text_model.encoder.layers.{layer}."
        if tail == "attn_mask":
            continue
        if tail in ("attn.in_proj_weight", "attn.in_proj_bias"):
            leaf = "weight" if tail.endswith("weight") else "bias"
            for name, chunk in zip(("q_proj", "k_proj", "v_proj"), np.split(value, 3, axis=0)):
                hf_sd[f"{base}self_attn.{name}.{leaf}"] = chunk
            continue
        tail = (
            tail.replace("attn.out_proj", "self_attn.out_proj")
            .replace("ln_1", "layer_norm1")
            .replace("ln_2", "layer_norm2")
            .replace("mlp.c_fc", "mlp.fc1")
            .replace("mlp.c_proj", "mlp.fc2")
        )
        hf_sd[base + tail] = value
    return convert_clip_text_state_dict(hf_sd)


# --- model-directory loading ------------------------------------------------


def _load_safetensors_dir(subdir: str, dtype=None) -> Dict[str, np.ndarray]:
    """Load all .safetensors shards in a diffusers component directory.

    Uses the native mmap reader (io/native.py, zero-copy) when built;
    falls back to the safetensors package."""
    files = sorted(
        os.path.join(subdir, f) for f in os.listdir(subdir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"No .safetensors found in {subdir}")
    sd = {}
    for path in files:
        try:
            from sliders_conceptmod_tpu.io.native import load_safetensors_native

            tensors = load_safetensors_native(path)
        except Exception:
            from safetensors.numpy import load_file

            tensors = dict(load_file(path))
        for key, arr in tensors.items():
            # bf16 arrives as a true ml_dtypes.bfloat16 view (io/native.py),
            # so a plain value-cast is correct for every dtype
            if dtype is not None:
                arr = arr.astype(dtype)
            sd[key] = arr
    return sd


def _read_json(path: str) -> Dict:
    with open(path, "r") as f:
        return json.load(f)


def load_unet_params(model_dir: str, dtype=None) -> Tuple[Dict, Dict]:
    """Load <model_dir>/unet → (flax params, unet config dict)."""
    sub = os.path.join(model_dir, "unet")
    cfg = _read_json(os.path.join(sub, "config.json"))
    sd = _load_safetensors_dir(sub, dtype)
    return convert_diffusers_state_dict(sd), cfg


def load_vae_params(model_dir: str, dtype=None) -> Tuple[Dict, Dict]:
    sub = os.path.join(model_dir, "vae")
    cfg = _read_json(os.path.join(sub, "config.json"))
    sd = _load_safetensors_dir(sub, dtype)
    return convert_diffusers_state_dict(sd), cfg


def load_text_encoder_params(model_dir: str, component: str = "text_encoder", dtype=None) -> Tuple[Dict, Dict]:
    sub = os.path.join(model_dir, component)
    cfg = _read_json(os.path.join(sub, "config.json"))
    sd = _load_safetensors_dir(sub, dtype)
    return convert_clip_text_state_dict(sd), cfg


def tree_to_jax(tree, dtype=None):
    import jax

    def leaf(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if dtype is not None else a

    return jax.tree.map(leaf, tree)


def verify_tree_shapes(converted, expected, prefix=()) -> list:
    """Return a list of mismatch descriptions ([] == exact structural match)."""
    problems = []
    ck, ek = set(converted), set(expected)
    for missing in sorted(ek - ck):
        problems.append(f"missing {'/'.join(prefix + (missing,))}")
    for extra in sorted(ck - ek):
        problems.append(f"unexpected {'/'.join(prefix + (extra,))}")
    for k in sorted(ck & ek):
        c, e = converted[k], expected[k]
        if isinstance(e, dict):
            if not isinstance(c, dict):
                problems.append(f"type mismatch at {'/'.join(prefix + (k,))}")
            else:
                problems.extend(verify_tree_shapes(c, e, prefix + (k,)))
        else:
            if tuple(np.shape(c)) != tuple(np.shape(e)):
                problems.append(
                    f"shape mismatch at {'/'.join(prefix + (k,))}: {np.shape(c)} vs {np.shape(e)}"
                )
    return problems
