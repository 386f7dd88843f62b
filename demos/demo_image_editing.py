"""Demo: real-image editing via null-text inversion + slider.

Script equivalent of the reference ``demo_image_editing.ipynb`` (SURVEY §3.5):
invert a real image with DDIM at CFG 1, optimize the null-text embedding per
timestep so CFG-7.5 reconstructs it, then re-denoise with the slider flipped
on below ``--start_noise`` (notebook uses 500) at several scales.

  python demos/demo_image_editing.py --base tiny --image photo.png \
      --prompt "a photo of a person" --slider slider.safetensors --scales 0,2,4
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.infer import null_inversion as ni
from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise, latents_to_images
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train.imageslider import load_image_array


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="runwayml/stable-diffusion-v1-5")
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--slider", required=True, help="slider .safetensors")
    ap.add_argument("--scales", default="0,2,4")
    ap.add_argument("--start_noise", type=int, default=500)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--out", default="/tmp/edit_demo")
    ap.add_argument(
        "--precision", default="float32", choices=["float32", "bfloat16"],
        help="float32 = notebook parity; bfloat16 = TPU speed mode (the "
        "null-embedding Adam math stays fp32 inside null_optimization)",
    )
    args = ap.parse_args()

    from sliders_conceptmod_tpu.core.config import parse_precision

    tokenizer, te, vae, unet, scheduler = factory.load_models(
        args.base, scheduler_name="ddim", weight_dtype=parse_precision(args.precision), with_vae=True
    )
    schedule = scheduler.set_timesteps(args.ddim_steps)
    unet_apply = unet.apply_fn()

    # image -> VAE posterior mean latents (notebook image2latent)
    image = jnp.asarray(load_image_array(args.image, args.resolution))
    mean, _ = vae.encode(image)
    latent0 = mean * vae.config.scaling_factor

    cond = factory.encode_prompts(te, [args.prompt])
    uncond0 = factory.encode_prompts(te, [""])  # null_optimization pins it fp32

    # jit each phase ONCE with params as arguments: lax.scan outside jit
    # re-traces (and recompiles) on every call, and closure-captured params
    # would bake GBs of constants into the executable (repo convention)
    invert_fn = jax.jit(lambda p, lat, c: ni.ddim_invert(unet_apply, p, schedule, lat, c))
    nullopt_fn = jax.jit(
        lambda p, traj, c, u0: ni.null_optimization(unet_apply, p, schedule, traj, c, u0)
    )

    print("inverting...")
    traj = invert_fn(unet.params, latent0, cond)
    print("optimizing null text...")
    uncond_per_step, _ = nullopt_fn(unet.params, traj, cond, uncond0)

    # slider network
    train_method, network_type, rank, alpha = (
        __import__("sliders_conceptmod_tpu.cli.generate_images_xl", fromlist=["infer_network_settings"])
        .infer_network_settings(args.slider)
    )
    targets = lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER + (
        lora_lib.UNET_TARGET_REPLACE_MODULE_CONV if network_type == "c3lier" else []
    )
    sites = lora_lib.create_sites(unet.params, rank=rank, alpha=alpha, target_replace=targets, train_method=train_method)
    sites = lora_lib.filter_sites_to_checkpoint(args.slider, sites)
    lora_params = lora_lib.load_weights(args.slider, sites)

    flip = flip_step_for_start_noise(schedule, args.start_noise)
    os.makedirs(args.out, exist_ok=True)
    # one compiled edit loop for the WHOLE scale sweep: the merged params are
    # an argument, so each scale reuses the executable
    edit_fn = jax.jit(
        lambda pb, ps, xt, c, un: ni.edit_with_slider(
            unet_apply, pb, ps, flip, schedule, xt, c, un
        )
    )
    for scale in [float(s) for s in args.scales.split(",")]:
        merged = lora_lib.merge_lora_params(unet.params, sites, lora_params, scale)
        final = edit_fn(unet.params, merged, traj[-1], cond, uncond_per_step)
        img = latents_to_images(vae.decode, final, vae.config.scaling_factor)[0]
        from PIL import Image

        Image.fromarray(img).save(f"{args.out}/edit_scale_{scale}.png")
        print(f"scale {scale}: {args.out}/edit_scale_{scale}.png")


if __name__ == "__main__":
    main()
