"""CLI: Custom Diffusion baseline-comparison generator.

Parity target: reference ``eval-scripts/generate_images_customdiffusion.py``
— the vendored CustomDiffusion(XL)Pipeline whose ``load_model`` (:482-507 SD1,
:748-783 XL):
* copies the delta's cross-attn ``attn2.to_k/to_v`` weights over the UNet
  (or ADDS the compressed ``u @ v`` low-rank form),
* registers each modifier token and writes its learned embedding(s) into the
  (resized) text-encoder token table — XL carries one embedding per encoder,
* then sweeps the prompt CSV with ``" with {token}"`` appended (:806-814;
  50 steps, CFG 7.5, 5 images/prompt, ``{save}/{file}/{case}_{i}.png``).

``--family xl`` (reference __main__ default) or ``sd1`` (the vendored SD1
pipeline earlier in the same file).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.cli.generate_images_xl import load_prompts_csv
from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
from sliders_conceptmod_tpu.eval.baselines import (
    add_inversion_token,
    patch_custom_diffusion_kv,
)
from sliders_conceptmod_tpu.infer.generate import latents_to_images, sample_loop
from sliders_conceptmod_tpu.models import factory


def load_delta(path: str) -> dict:
    """delta.bin: {'unet': {...}, 'modifier_token': {tok: emb | [emb, emb2]},
    optional 'text_encoder'} (reference save_pretrained :459-480)."""
    import torch

    st = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(v):
        if isinstance(v, dict):
            return {k: to_np(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [to_np(x) for x in v]
        return v.detach().float().numpy() if hasattr(v, "detach") else np.asarray(v)

    return {k: to_np(v) for k, v in st.items()}


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    file = os.path.basename(os.path.normpath(args.model_name)) or "customdiffusion"
    folder = f"{args.save_path}/{file}"
    os.makedirs(folder, exist_ok=True)

    delta = load_delta(args.model_name)
    is_xl = args.family == "xl"

    if is_xl:
        tokenizers, text_encoders, unet, scheduler, vae = factory.load_models_xl(
            args.base, scheduler_name="ddim", weight_dtype=jnp.bfloat16, with_vae=True
        )
        encoders = list(text_encoders)
    else:
        tokenizer, te, vae, unet, scheduler = factory.load_models(
            args.base, scheduler_name="lms", weight_dtype=jnp.bfloat16, with_vae=True
        )
        encoders = [te]

    unet.params = patch_custom_diffusion_kv(unet.params, delta.get("unet", {}))

    # full text-encoder state dicts (save_text_encoder=True deltas,
    # reference save_pretrained :459-480 / load_model :748-752)
    from sliders_conceptmod_tpu.io import torch_convert as tc

    for te_key, te_i in zip(("text_encoder", "text_encoder_2"), encoders):
        if te_key in delta:
            te_i.params = tc.tree_to_jax(
                tc.convert_clip_text_state_dict(
                    {k: np.asarray(v) for k, v in delta[te_key].items()}
                ),
                dtype=jnp.bfloat16,
            )

    for token, embs in delta.get("modifier_token", {}).items():
        if not isinstance(embs, list):
            embs = [embs]
        for i, te_i in enumerate(encoders):
            add_inversion_token(te_i, token, np.asarray(embs[min(i, len(embs) - 1)]))

    schedule = scheduler.set_timesteps(args.ddim_steps)
    unet_apply = unet.apply_fn()
    latent_res = args.image_size // 8

    @jax.jit
    def sample_fn(params, latents, text_emb, added):
        # params through the signature (CLAUDE.md: no closure-captured GBs)
        return sample_loop(
            unet_apply,
            params,
            params,
            0,
            scheduler,
            schedule,
            latents,
            text_emb,
            jax.random.PRNGKey(0),
            guidance_scale=args.guidance_scale,
            added_cond_kwargs=added,
        )

    # loop-invariant: uncond embeddings never change across CSV cases
    if is_xl:
        text_u, pooled_u = factory.encode_prompts_xl(encoders, [""] * args.num_samples)
    else:
        uncond = factory.encode_prompts(encoders[0], [""] * args.num_samples)
    for case_number, prompt, seed in rows:
        if not (args.from_case <= case_number <= args.till_case):
            continue
        full_prompt = f"{prompt} with {args.token}"  # reference :809
        if is_xl:
            text, pooled = factory.encode_prompts_xl(encoders, [full_prompt] * args.num_samples)
            text_emb = jnp.concatenate([text_u, text], axis=0)
            added = {
                "text_embeds": jnp.concatenate([pooled_u, pooled], axis=0),
                "time_ids": jnp.tile(
                    jnp.asarray(get_add_time_ids(args.image_size, args.image_size)),
                    (2 * args.num_samples, 1),
                ),
            }
        else:
            cond = factory.encode_prompts(encoders[0], [full_prompt] * args.num_samples)
            text_emb = jnp.concatenate([uncond, cond], axis=0)
            added = None
        latents = (
            jax.random.normal(
                jax.random.PRNGKey(seed), (args.num_samples, 4, latent_res, latent_res), jnp.float32
            )
            * schedule.init_noise_sigma
        )
        final = sample_fn(unet.params, latents.astype(jnp.bfloat16), text_emb, added)
        images = latents_to_images(vae.decode, final, vae.config.scaling_factor)
        from PIL import Image

        for i in range(images.shape[0]):
            Image.fromarray(images[i]).save(f"{folder}/{case_number}_{i}.png")
        print(f"case {case_number}: saved {images.shape[0]} images")


def build_parser():
    parser = argparse.ArgumentParser(prog="Generate Custom Diffusion Images")
    parser.add_argument("--model_name", type=str, required=True, help="path to delta.bin")
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--token", type=str, required=True)
    parser.add_argument("--family", type=str, default="xl", choices=["xl", "sd1"])
    parser.add_argument(
        "--base", type=str, default="stabilityai/stable-diffusion-xl-base-1.0"
    )
    parser.add_argument("--save_path", type=str, default="images/customdiffusion")
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
