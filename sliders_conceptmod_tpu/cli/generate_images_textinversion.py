"""CLI: Textual-Inversion baseline-comparison generator (SD1).

Parity target: reference ``eval-scripts/generate_images_textinversion.py:7-36``
— append ``" with {token}"`` to every CSV prompt and sample the custom model
(50 steps, CFG 7.5, 5 images/prompt, output ``{save}/{file}/{case}_{i}.png``).

The reference points --model_name at a full pipeline dir with the TI token
baked in; here the learned embedding loads from ``--embedding_path``
(diffusers learned_embeds.{safetensors,bin}) and is injected into the text
encoder's token table at a freshly added token id — same math, no full model
copy per concept.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
from PIL import Image

from sliders_conceptmod_tpu.cli.generate_images_xl import load_prompts_csv
from sliders_conceptmod_tpu.eval.baselines import add_inversion_token, load_textual_inversion
from sliders_conceptmod_tpu.infer.generate import latents_to_images, sample_loop
from sliders_conceptmod_tpu.models import factory


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    file = os.path.basename(os.path.normpath(args.model_name))
    folder = f"{args.save_path}/{file}"
    os.makedirs(folder, exist_ok=True)

    tokenizer, te, vae, unet, scheduler = factory.load_models(
        args.model_name, scheduler_name="lms", weight_dtype=jnp.bfloat16, with_vae=True
    )
    if args.embedding_path:
        add_inversion_token(te, args.token, load_textual_inversion(args.embedding_path))

    schedule = scheduler.set_timesteps(args.ddim_steps)
    unet_apply = unet.apply_fn()
    latent_res = args.image_size // 8

    @jax.jit
    def sample_fn(params, latents, text_emb):
        # no phase flip — single model throughout (flip step 0, same params);
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
        )

    uncond = factory.encode_prompts(te, [""] * args.num_samples)  # loop-invariant
    for case_number, prompt, seed in rows:
        if not (args.from_case <= case_number <= args.till_case):
            continue
        full_prompt = f"{prompt} with {args.token}"  # reference :31
        cond = factory.encode_prompts(te, [full_prompt] * args.num_samples)
        text_emb = jnp.concatenate([uncond, cond], axis=0)
        latents = (
            jax.random.normal(
                jax.random.PRNGKey(seed), (args.num_samples, 4, latent_res, latent_res), jnp.float32
            )
            * schedule.init_noise_sigma
        )
        final = sample_fn(unet.params, latents.astype(jnp.bfloat16), text_emb)
        images = latents_to_images(vae.decode, final, vae.config.scaling_factor)
        for i in range(images.shape[0]):
            Image.fromarray(images[i]).save(f"{folder}/{case_number}_{i}.png")
        print(f"case {case_number}: saved {images.shape[0]} images")


def build_parser():
    parser = argparse.ArgumentParser(prog="Generate Text Inversion Images")
    parser.add_argument("--model_name", type=str, required=True, help="base model path")
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--token", type=str, required=True)
    parser.add_argument("--embedding_path", type=str, default=None, help="learned_embeds file")
    parser.add_argument("--save_path", type=str, default="images/text_inversion")
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
