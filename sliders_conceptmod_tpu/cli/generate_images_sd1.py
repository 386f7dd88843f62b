"""CLI: SD1.x slider inference sweep (raw sampler, no pipeline).

Parity target: reference ``eval-scripts/generate_images_sd1.py:43-260`` —
hand-written denoising loop: tokenize → CFG embeds → LMS scheduler →
per-step start_noise scale flip (default 850) → VAE decode; writes
per-scale folders plus a composite grid per case.

TPU shape: identical two-phase jitted sampler as the XL CLI; the LMS
derivative history is explicit fixed-shape state (diffusion/schedulers.py).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.cli.generate_images_xl import (
    infer_network_settings,
    load_prompts_csv,
    settings_from_checkpoint,
)
from sliders_conceptmod_tpu.infer.generate import (
    flip_step_for_start_noise,
    latents_to_images,
    sample_loop,
)
from sliders_conceptmod_tpu.models import factory


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    scales = [float(s) for s in args.scales.split(",")]
    name = os.path.basename(args.model_name)
    for scale in scales:
        os.makedirs(f"{args.save_path}/{name}/{scale}", exist_ok=True)

    tokenizer, te, vae, unet, scheduler = factory.load_models(
        args.base,
        scheduler_name="lms",
        # SD2.x route (reference model_util.py:37-109 v2 handling): OpenCLIP
        # text tower + optional v-prediction sampling — a slider trained with
        # --v2/--v_pred sweeps with the same flags it trained/serves with
        v2=args.v2,
        v_pred=args.v_pred,
        weight_dtype=jnp.bfloat16,
        with_vae=True,
    )

    train_method, network_type, rank, alpha = infer_network_settings(args.model_name)
    exact = settings_from_checkpoint(args.model_name)
    if exact is not None:
        rank, alpha = exact
    targets = lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER
    if network_type == "c3lier":
        targets = targets + lora_lib.UNET_TARGET_REPLACE_MODULE_CONV
    sites = lora_lib.create_sites(
        unet.params, rank=rank, alpha=alpha, target_replace=targets, train_method=train_method
    )
    sites = lora_lib.filter_sites_to_checkpoint(args.model_name, sites)
    if not sites:
        raise ValueError(f"No matching LoRA keys between UNet and {args.model_name}")
    lora_params = lora_lib.load_weights(args.model_name, sites)

    schedule = scheduler.set_timesteps(args.ddim_steps)
    flip = flip_step_for_start_noise(schedule, args.start_noise)
    unet_apply = unet.apply_fn()
    latent_res = args.image_size // 8

    @jax.jit
    def sample_fn(params_base, params_slider, latents, text_emb):
        # base params through the SIGNATURE (CLAUDE.md convention)
        return sample_loop(
            unet_apply,
            params_base,
            params_slider,
            flip,
            scheduler,
            schedule,
            latents,
            text_emb,
            jax.random.PRNGKey(0),
            guidance_scale=args.guidance_scale,
        )

    neg = args.negative_prompts or ""
    for case_number, prompt, seed in rows:
        if not (args.from_case <= case_number <= args.till_case):
            continue
        cond = factory.encode_prompts(te, [prompt] * args.num_samples)
        uncond = factory.encode_prompts(te, [neg] * args.num_samples)
        text_emb = jnp.concatenate([uncond, cond], axis=0)
        per_scale = []
        for scale in scales:
            key = jax.random.PRNGKey(seed)
            latents = (
                jax.random.normal(key, (args.num_samples, 4, latent_res, latent_res), jnp.float32)
                * schedule.init_noise_sigma
            )
            params_slider = lora_lib.merge_lora_params(unet.params, sites, lora_params, scale)
            final = sample_fn(unet.params, params_slider, latents.astype(jnp.bfloat16), text_emb)
            images = latents_to_images(vae.decode, final, vae.config.scaling_factor)
            for idx in range(images.shape[0]):
                Image.fromarray(images[idx]).save(
                    f"{args.save_path}/{name}/{scale}/{case_number}_{idx}.png"
                )
            per_scale.append(images[0])
            print(f"case {case_number} scale {scale}: saved {images.shape[0]} images")
        # composite grid across the scale sweep (reference writes grids too)
        grid = np.concatenate(per_scale, axis=1)
        os.makedirs(f"{args.save_path}/{name}/all", exist_ok=True)
        Image.fromarray(grid).save(f"{args.save_path}/{name}/all/{case_number}.png")


def build_parser():
    parser = argparse.ArgumentParser(prog="generateImagesSD1")
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--negative_prompts", type=str, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--base", type=str, default="runwayml/stable-diffusion-v1-5")
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--start_noise", type=int, default=850)
    parser.add_argument("--scales", type=str, default="-2,-1,0,1,2")
    parser.add_argument(
        "--v2", action="store_true",
        help="SD2.x base: OpenCLIP ViT-H text tower (reference model_util.py:37-109)",
    )
    parser.add_argument(
        "--v_pred", action="store_true",
        help="v-prediction base (SD2.x 768-v class checkpoints)",
    )
    parser.add_argument("--device", type=str, default="0", help="ignored on TPU (mesh-controlled)")
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
