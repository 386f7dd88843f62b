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
    ``token_id`` (diffusers load_textual_inversion semantics)."""
    emb = np.asarray(te_params["token_embedding"]["embedding"]).copy()
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


def patch_custom_diffusion_kv(unet_params: Dict, delta_sd: Dict[str, np.ndarray]) -> Dict:
    """Apply a Custom-Diffusion delta (cross-attn to_k/to_v weights only,
    reference generate_images_customdiffusion.py:374-510) onto a UNet tree."""
    patched = jax.tree.map(lambda x: x, unet_params)  # shallow-ish copy
    tree = tc.convert_diffusers_state_dict(
        {k: np.asarray(v) for k, v in delta_sd.items() if ".to_k." in k or ".to_v." in k}
    )

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                dst[k] = jnp.asarray(v, dst[k].dtype) if hasattr(dst[k], "dtype") else v

    merge(patched, tree)
    return patched
