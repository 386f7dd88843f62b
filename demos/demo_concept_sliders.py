"""Demo: train a concept slider and render a scale sweep.

Script equivalent of the reference notebooks ``demo_concept_sliders.ipynb`` /
``XL-sliders-inference.ipynb`` (train via the programmatic API, then sweep
slider scales over a prompt). Works weightless (``--base tiny-xl``) or with a
local diffusers checkout.

  python demos/demo_concept_sliders.py --base tiny-xl --steps 8 \
      --target person --positive "smiling person" --out /tmp/slider_demo
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.config import RootConfig, PretrainedModelConfig, NetworkConfig, TrainConfig, SaveConfig, LoggingConfig, OtherConfig, TPUConfig
from sliders_conceptmod_tpu.core.prompts import PromptSettings
from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise, latents_to_images, sample_loop
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="tiny-xl")
    ap.add_argument("--target", default="person")
    ap.add_argument("--positive", default="smiling person")
    ap.add_argument("--unconditional", default="person")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--scales", default="-2,-1,0,1,2")
    ap.add_argument("--start_noise", type=int, default=750)
    ap.add_argument("--out", default="/tmp/slider_demo")
    args = ap.parse_args()

    config = RootConfig(
        prompts_file="",
        pretrained_model=PretrainedModelConfig(name_or_path=args.base),
        network=NetworkConfig(rank=4, alpha=1.0),
        train=TrainConfig(iterations=args.steps, max_denoising_steps=4, precision="float32"),
        save=SaveConfig(name="demo_slider", path=args.out, per_steps=0),
        logging=LoggingConfig(verbose=True),
        other=OtherConfig(),
        tpu=TPUConfig(),
    )
    prompts = [
        PromptSettings(
            target=args.target,
            positive=args.positive,
            unconditional=args.unconditional,
            neutral=args.target,
            action="enhance",
            guidance_scale=3,
            resolution=args.resolution,
        )
    ]
    result = trainer.train(config, prompts, rank=4, save_file=False)
    print(f"trained: final loss {result.losses[-1]:.6f}, {result.steps_per_sec:.2f} steps/s")

    # sweep
    tokenizers, text_encoders, unet, scheduler, vae = factory.load_models_xl(
        args.base, weight_dtype=jnp.float32, with_vae=True
    )
    schedule = scheduler.set_timesteps(4)
    flip = flip_step_for_start_noise(schedule, args.start_noise)
    text, pool = factory.encode_prompts_xl(text_encoders, [args.target])
    text_u, pool_u = factory.encode_prompts_xl(text_encoders, [""])
    emb = jnp.concatenate([text_u, text], axis=0)
    added = {
        "text_embeds": jnp.concatenate([pool_u, pool], axis=0),
        "time_ids": jnp.tile(jnp.asarray(get_add_time_ids(args.resolution, args.resolution)), (2, 1)),
    }
    os.makedirs(args.out, exist_ok=True)
    latent_res = args.resolution // 8
    # jit once with the merged params as an ARGUMENT: every scale reuses the
    # executable instead of re-tracing the whole sampler
    sample_fn = jax.jit(
        lambda pb, ps, lat, e, a, k: sample_loop(
            unet.apply_fn(), pb, ps, flip, scheduler, schedule, lat, e, k,
            guidance_scale=7.5, added_cond_kwargs=a,
        )
    )
    for scale in [float(s) for s in args.scales.split(",")]:
        latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, latent_res, latent_res))
        merged = lora_lib.merge_lora_params(unet.params, result.sites, result.lora_params, scale)
        final = sample_fn(
            unet.params, merged, latents * schedule.init_noise_sigma, emb, added,
            jax.random.PRNGKey(0),
        )
        img = latents_to_images(vae.decode, final, vae.config.scaling_factor)[0]
        from PIL import Image

        Image.fromarray(img).save(f"{args.out}/scale_{scale}.png")
        print(f"scale {scale}: saved {args.out}/scale_{scale}.png")


if __name__ == "__main__":
    main()
