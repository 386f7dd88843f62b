"""CLI: UCE baseline-comparison sweep.

Parity target: reference ``eval-scripts/generate_images-uce.py`` —
* the edited model is a FULL diffusers UNet state dict; the sweep
  interpolates ``original + scale·(edited − original)`` over
  scales {−2, −1, −0.5, 0, 0.5, 1, 2} (:172-210),
* sampling runs the ORIGINAL UNet while ``t > start_noise`` then swaps in
  the interpolated state dict (:105-110) — expressed here as the two-phase
  jitted sampler (infer/generate.py), LMS scheduler (:145),
* output layout ``{save_path}/{basename}/{scale}/{case}_{n}.png`` with
  ``0.5 → half`` in folder names (:176-180) plus an ``all/`` grid.

TPU shape: the interpolation is one jitted tree-map with the scale as a
traced scalar — one executable serves the whole sweep.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sliders_conceptmod_tpu.cli.generate_images_xl import load_prompts_csv
from sliders_conceptmod_tpu.eval.baselines import load_edited_unet
from sliders_conceptmod_tpu.infer.generate import (
    flip_step_for_start_noise,
    latents_to_images,
    sample_loop,
)
from sliders_conceptmod_tpu.models import factory


def scale_folder(scale: float) -> str:
    # reference: '0.5' -> 'half' in folder names (generate_images-uce.py:178);
    # exact-match only — substring replace would mangle e.g. 10.5 or 0.55
    if abs(scale) == 0.5:
        return "half" if scale > 0 else "-half"
    return f"{scale}".rstrip("0").rstrip(".") if "." in f"{scale}" else f"{scale}"


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    scales = [float(s) for s in args.scales.split(",")]
    name = os.path.basename(os.path.normpath(args.model_path))
    folder = f"{args.save_path}/{name}"
    for scale in scales:
        os.makedirs(f"{folder}/{scale_folder(scale)}", exist_ok=True)
    os.makedirs(f"{folder}/all", exist_ok=True)

    tokenizer, te, vae, unet, scheduler = factory.load_models(
        args.base, scheduler_name="lms", weight_dtype=jnp.bfloat16, with_vae=True
    )
    # delta in fp32 from the UNROUNDED edited weights: UCE edits are small
    # perturbations of to_k/to_v — rounding the edited tensors to bf16 before
    # subtracting would swamp the edit with quantization noise. The base is
    # stored bf16 either way, so interp(1) still reproduces the edit exactly.
    delta = jax.jit(
        lambda e, o: jax.tree.map(
            lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32), e, o
        )
    )(load_edited_unet(args.model_path), unet.params)

    # base params + delta flow through jit SIGNATURES — closure capture bakes
    # multi-GB constants into the executables (CLAUDE.md convention)
    @jax.jit
    def interp(base, d, scale):
        return jax.tree.map(
            lambda o, dd: (o.astype(jnp.float32) + scale * dd).astype(o.dtype), base, d
        )

    schedule = scheduler.set_timesteps(args.ddim_steps)
    flip = flip_step_for_start_noise(schedule, args.start_noise)
    unet_apply = unet.apply_fn()
    latent_res = args.image_size // 8

    @jax.jit
    def sample_fn(base_params, edited_params, latents, text_emb):
        return sample_loop(
            unet_apply,
            base_params,
            edited_params,
            flip,
            scheduler,
            schedule,
            latents,
            text_emb,
            jax.random.PRNGKey(0),
            guidance_scale=args.guidance_scale,
        )

    neg = args.negative_prompts or ""
    # loop-invariant: the uncond row never changes across CSV cases
    uncond = factory.encode_prompts(te, [neg] * args.num_samples)
    for case_number, prompt, seed in rows:
        if not (args.from_case <= case_number <= args.till_case):
            continue
        cond = factory.encode_prompts(te, [prompt] * args.num_samples)
        text_emb = jnp.concatenate([uncond, cond], axis=0)
        per_scale = []
        for scale in scales:
            key = jax.random.PRNGKey(seed)
            latents = (
                jax.random.normal(key, (args.num_samples, 4, latent_res, latent_res), jnp.float32)
                * schedule.init_noise_sigma
            )
            final = sample_fn(
                unet.params,
                interp(unet.params, delta, scale),
                latents.astype(jnp.bfloat16),
                text_emb,
            )
            images = latents_to_images(vae.decode, final, vae.config.scaling_factor)
            for idx in range(images.shape[0]):
                Image.fromarray(images[idx]).save(
                    f"{folder}/{scale_folder(scale)}/{case_number}_{idx}.png"
                )
            per_scale.append(images[0])
            print(f"case {case_number} scale {scale}: saved {images.shape[0]} images")
        Image.fromarray(np.concatenate(per_scale, axis=1)).save(f"{folder}/all/{case_number}.png")


def build_parser():
    parser = argparse.ArgumentParser(prog="generateImagesUCE")
    # reference flag name is --model_name (generate_images-uce.py argparse);
    # --model_path kept as an alias
    parser.add_argument(
        "--model_name",
        "--model_path",
        dest="model_path",
        type=str,
        required=True,
        help="edited UNet state dict",
    )
    parser.add_argument("--device", type=str, default="0", help="ignored on TPU (mesh-controlled)")
    parser.add_argument("--rank", type=int, default=4, help="accepted for parity; unused by UCE")
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--negative_prompts", type=str, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--base", type=str, default="CompVis/stable-diffusion-v1-4")
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--start_noise", type=int, default=750)
    parser.add_argument("--scales", type=str, default="-2,-1,-0.5,0,0.5,1,2")
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
