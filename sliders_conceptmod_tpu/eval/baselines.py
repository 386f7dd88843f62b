"""Baseline-comparison generators — UCE and Textual-Inversion sweeps.

Parity targets (reference ``eval-scripts/``):
* ``generate_images-uce.py:95-125`` — UCE: denoise with the ORIGINAL UNet
  while ``t > start_noise`` and swap in a fully *edited* UNet state dict for
  the remainder. The two-phase sampler (infer/generate.py) expresses this
  directly: phase A = original params, phase B = edited params (no adapter
  involved).
* ``generate_images_textinversion.py`` — textual inversion: append the
  learned token to every prompt and sample with the token's embedding
  injected into the text-encoder embedding table.

Custom Diffusion's vendored pipeline (``generate_images_customdiffusion.py``)
is a K/V-cross-attention weight patch — load its delta state dict with
io/torch_convert and sample with the patched params through the same
two-phase machinery (helper below).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise, sample_loop
from sliders_conceptmod_tpu.io import torch_convert as tc


def uce_sample(
    unet_apply,
    original_params,
    edited_params,
    scheduler,
    schedule,
    latents,
    text_embeddings,
    key,
    start_noise: float = 750,
    guidance_scale: float = 7.5,
    added_cond_kwargs=None,
):
    """UCE two-phase sweep: original UNet above start_noise, edited below
    (reference generate_images-uce.py:105-110)."""
    flip = flip_step_for_start_noise(schedule, start_noise)
    return sample_loop(
        unet_apply,
        original_params,
        edited_params,
        flip,
        scheduler,
        schedule,
        latents,
        text_embeddings,
        key,
        guidance_scale=guidance_scale,
        added_cond_kwargs=added_cond_kwargs,
    )


def load_edited_unet(path: str) -> Dict:
    """Load a UCE-edited diffusers UNet state dict (.safetensors/.pt) into a
    flax param tree."""
    if str(path).endswith(".safetensors"):
        from sliders_conceptmod_tpu.io.native import load_safetensors_native

        sd = load_safetensors_native(path)
    else:
        import torch

        sd = {k: v.float().numpy() for k, v in torch.load(path, weights_only=True).items()}
    return tc.tree_to_jax(tc.convert_diffusers_state_dict(sd))


def inject_textual_inversion_token(
    te_params: Dict, token_embedding: np.ndarray, token_id: int
) -> Dict:
    """Return text-encoder params with the learned embedding written at
    ``token_id`` (diffusers load_textual_inversion semantics). Ids past the
    current table grow it (resize_token_embeddings flow, reference
    generate_images_customdiffusion.py:489-498)."""
    emb = np.asarray(te_params["token_embedding"]["embedding"])
    if token_id >= emb.shape[0]:
        grown = np.zeros((token_id + 1, emb.shape[1]), emb.dtype)
        grown[: emb.shape[0]] = emb
        emb = grown
    else:
        emb = emb.copy()
    emb[token_id] = np.asarray(token_embedding, emb.dtype)
    new = dict(te_params)
    new["token_embedding"] = dict(te_params["token_embedding"])
    new["token_embedding"]["embedding"] = jnp.asarray(emb)
    return new


def load_textual_inversion(path: str) -> np.ndarray:
    """Read a textual-inversion checkpoint: returns the learned embedding
    vector(s). Supports diffusers ``learned_embeds.safetensors``
    ({token: embedding}) and A1111-style .pt."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
        return np.asarray(next(iter(sd.values())))
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if "string_to_param" in data:  # A1111
        return next(iter(data["string_to_param"].values())).detach().float().numpy()
    return next(iter(data.values())).detach().float().numpy()


def add_inversion_token(te_bundle, token: str, embedding: np.ndarray) -> int:
    """Register ``token`` on the bundle's tokenizer, grow the token table,
    and rebuild the encoder module at the new vocab size (the flax module
    validates param shapes against config.vocab_size). Returns the token id.
    Mirrors add_tokens + resize_token_embeddings + embedding write
    (reference generate_images_customdiffusion.py:482-498)."""
    import dataclasses

    emb = np.asarray(embedding)
    if emb.ndim > 1:
        emb = emb[0]  # multi-vector TI: first vector (documented deviation)
    token_id = te_bundle.tokenizer.add_tokens(token)
    te_bundle.params = inject_textual_inversion_token(te_bundle.params, emb, token_id)
    new_size = int(np.asarray(te_bundle.params["token_embedding"]["embedding"]).shape[0])
    if new_size != te_bundle.model.config.vocab_size:
        te_bundle.model = type(te_bundle.model)(
            dataclasses.replace(te_bundle.model.config, vocab_size=new_size),
            dtype=te_bundle.model.dtype,
        )
    return token_id


def load_textual_inversion_xl(path: str):
    """SDXL textual inversion ships TWO embeddings — clip_l (te1) and clip_g
    (te2). Returns (emb_l, emb_g); falls back to duplicating a single-key
    file (reference generate_images_textinversion_xl.py relies on the
    pipeline's own loader for this split)."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = {k.lower(): np.asarray(v) for k, v in load_file(path).items()}
    else:
        import torch

        sd = {
            k.lower(): v.detach().float().numpy()
            for k, v in torch.load(path, map_location="cpu", weights_only=False).items()
            if hasattr(v, "detach")
        }
    if "clip_l" in sd and "clip_g" in sd:
        return sd["clip_l"], sd["clip_g"]
    vals = list(sd.values())
    if len(vals) >= 2:
        return vals[0], vals[1]
    return vals[0], vals[0]


def patch_custom_diffusion_kv(unet_params: Dict, delta_sd: Dict[str, np.ndarray]) -> Dict:
    """Apply a Custom-Diffusion delta (cross-attn to_k/to_v weights only,
    reference generate_images_customdiffusion.py:374-510) onto a UNet tree.

    Accepts both the plain form ({name: tensor}, copied over the base) and
    the compressed form ({name: {'u','v'}} where u@v is ADDED to the base —
    reference load_model ``compress`` branch, :503-507)."""
    flat = {}
    for k, v in delta_sd.items():
        if not ("attn2" in k and (".to_k." in k or ".to_v." in k or k.endswith("to_k.weight") or k.endswith("to_v.weight"))):
            continue
        if isinstance(v, dict) and "u" in v and "v" in v:
            u = np.asarray(v["u"], np.float32)
            w = np.asarray(v["v"], np.float32)
            flat[k] = ("add", u @ w)
        else:
            flat[k] = ("copy", np.asarray(v))

    patched = jax.tree.map(lambda x: x, unet_params)  # shallow-ish copy
    add_tree = tc.convert_diffusers_state_dict(
        {k: v[1] for k, v in flat.items() if v[0] == "add"}
    )

    def merge_add(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge_add(dst[k], v)
            else:
                dst[k] = dst[k] + jnp.asarray(v, dst[k].dtype)

    merge_add(patched, add_tree)
    tree = tc.convert_diffusers_state_dict(
        {k: v[1] for k, v in flat.items() if v[0] == "copy"}
    )

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                dst[k] = jnp.asarray(v, dst[k].dtype) if hasattr(dst[k], "dtype") else v

    merge(patched, tree)
    return patched
