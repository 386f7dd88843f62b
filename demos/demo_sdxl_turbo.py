"""Demo: few-step (Turbo-style) slider inference.

Script equivalent of the reference ``demo_SDXL_Turbo.ipynb`` (cell 8): a
turbo/few-step pipeline with the same network/scale/start_noise machinery —
1-4 denoising steps, guidance 0 (turbo models are distilled without CFG),
slider gated by start_noise.

  python demos/demo_sdxl_turbo.py --base tiny-xl --slider slider.safetensors \
      --prompt "a photo of a person" --steps 4 --scales=-2,0,2
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.cli.generate_images_xl import infer_network_settings, settings_from_checkpoint
from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise, latents_to_images, sample_loop
from sliders_conceptmod_tpu.models import factory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="stabilityai/sdxl-turbo")
    ap.add_argument("--slider", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--guidance_scale", type=float, default=0.0)
    ap.add_argument("--start_noise", type=int, default=800)
    ap.add_argument("--scales", default="-2,0,2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/turbo_demo")
    args = ap.parse_args()

    tokenizers, text_encoders, unet, scheduler, vae = factory.load_models_xl(
        args.base, scheduler_name="euler_a", weight_dtype=jnp.bfloat16, with_vae=True
    )
    schedule = scheduler.set_timesteps(args.steps)
    flip = flip_step_for_start_noise(schedule, args.start_noise)

    train_method, network_type, rank, alpha = infer_network_settings(args.slider)
    exact = settings_from_checkpoint(args.slider)
    if exact is not None:
        rank, alpha = exact
    targets = lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER + (
        lora_lib.UNET_TARGET_REPLACE_MODULE_CONV if network_type == "c3lier" else []
    )
    sites = lora_lib.create_sites(unet.params, rank=rank, alpha=alpha, target_replace=targets, train_method=train_method)
    sites = lora_lib.filter_sites_to_checkpoint(args.slider, sites)
    lora_params = lora_lib.load_weights(args.slider, sites)

    text, pool = factory.encode_prompts_xl(text_encoders, [args.prompt])
    text_u, pool_u = factory.encode_prompts_xl(text_encoders, [""])
    emb = jnp.concatenate([text_u, text], axis=0)
    added = {
        "text_embeds": jnp.concatenate([pool_u, pool], axis=0),
        "time_ids": jnp.tile(jnp.asarray(get_add_time_ids(args.resolution, args.resolution)), (2, 1)),
    }

    os.makedirs(args.out, exist_ok=True)
    latent_res = args.resolution // 8
    # jit once; merged params as an argument so the scale sweep shares one
    # executable (guidance stays a Python float — the <=1 turbo fast path is
    # a trace-time decision, see sample_loop)
    sample_fn = jax.jit(
        lambda pb, ps, lat, e, a, k: sample_loop(
            unet.apply_fn(), pb, ps, flip, scheduler, schedule, lat, e, k,
            guidance_scale=args.guidance_scale, added_cond_kwargs=a,
        )
    )
    for scale in [float(s) for s in args.scales.split(",")]:
        latents = (
            jax.random.normal(jax.random.PRNGKey(args.seed), (1, 4, latent_res, latent_res))
            * schedule.init_noise_sigma
        )
        merged = lora_lib.merge_lora_params(unet.params, sites, lora_params, scale)
        final = sample_fn(
            unet.params, merged, latents.astype(jnp.bfloat16), emb, added,
            jax.random.PRNGKey(args.seed),
        )
        img = latents_to_images(vae.decode, final, vae.config.scaling_factor)[0]
        from PIL import Image

        Image.fromarray(img).save(f"{args.out}/turbo_scale_{scale}.png")
        print(f"scale {scale}: {args.out}/turbo_scale_{scale}.png")


if __name__ == "__main__":
    main()
