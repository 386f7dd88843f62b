"""Bake a trained slider into base weights and export a single-file LDM
checkpoint (A1111-compatible ``.safetensors``).

Beyond-reference utility: the reference ships sliders as LoRA files only and
leaves the "merged checkpoint" step to external tools. Here the merge is one
:func:`adapters.lora.merge_lora_params` call at a user-chosen scale, and the
export is the loss-free inverse of the single-file loader (io/ldm_export.py).
SD1/SD2 layouts only (SDXL single-file layout is not implemented).

Usage:
  python -m sliders_conceptmod_tpu.cli.export_single_file \
      --base /ckpts/sd15 --slider slider.safetensors --scale 1.0 \
      --output merged.safetensors [--v2] [--half]
"""

from __future__ import annotations

import argparse

import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.cli.generate_images_xl import (
    infer_network_settings,
    settings_from_checkpoint,
)
from sliders_conceptmod_tpu.io import ldm_export
from sliders_conceptmod_tpu.models import factory


def main(argv=None):
    parser = argparse.ArgumentParser("exportSingleFile")
    parser.add_argument("--base", required=True, help="diffusers dir, single file, or family")
    parser.add_argument("--slider", default=None, help="trained slider .safetensors to bake in")
    parser.add_argument("--scale", type=float, default=1.0, help="slider scale to bake at")
    parser.add_argument("--output", required=True)
    parser.add_argument("--v2", action="store_true", help="SD2 (OpenCLIP text-tower layout)")
    parser.add_argument("--xl", action="store_true", help="SDXL (SGM conditioner layout)")
    parser.add_argument("--sd3", action="store_true", help="SD3 (SGM MMDiT layout)")
    parser.add_argument("--flux", action="store_true", help="Flux (BFL transformer-only layout)")
    parser.add_argument("--half", action="store_true", help="save float16 tensors")
    args = parser.parse_args(argv)

    tes = vae = None
    if args.xl:
        tokenizers, tes, unet, scheduler, vae = factory.load_models_xl(args.base, with_vae=True)
    elif args.sd3:
        tokenizers, tes, unet, scheduler = factory.load_models_sd3(args.base)
    elif args.flux:
        tokenizers, encode_fn, unet, scheduler = factory.load_models_flux(args.base)
    else:
        tokenizer, te, vae, unet, scheduler = factory.load_models(
            args.base, scheduler_name="ddim", v2=args.v2, with_vae=True
        )
    unet_params = unet.params
    if args.slider:
        train_method, network_type, rank, alpha = infer_network_settings(args.slider)
        exact = settings_from_checkpoint(args.slider)
        if exact is not None:
            rank, alpha = exact
        if args.sd3 or args.flux:
            # SD3/Flux trainers target the transformer attention with "-"
            # delimited keys (cli/train_lora_sd3.py, train_lora_flux.py)
            sites = lora_lib.create_sites(
                unet_params, rank=rank, alpha=alpha, target_replace=["Attention"],
                train_method=train_method, delimiter="-",
            )
        else:
            targets = lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER
            if network_type == "c3lier":
                targets = targets + lora_lib.UNET_TARGET_REPLACE_MODULE_CONV
            sites = lora_lib.create_sites(
                unet_params, rank=rank, alpha=alpha, target_replace=targets,
                train_method=train_method,
            )
        sites = lora_lib.filter_sites_to_checkpoint(args.slider, sites)
        if not sites:
            raise ValueError(f"No matching LoRA keys between UNet and {args.slider}")
        lora_params = lora_lib.load_weights(args.slider, sites)
        unet_params = lora_lib.merge_lora_params(unet_params, sites, lora_params, args.scale)
        print(f"baked {len(sites)} LoRA sites at scale {args.scale}")

    if args.xl:
        sd = ldm_export.export_sdxl_checkpoint(
            unet_params, tes[0].params, tes[1].params, vae.params
        )
    elif args.sd3:
        sd = ldm_export.export_sd3_checkpoint(unet_params, tes[0].params, tes[1].params)
    elif args.flux:
        sd = ldm_export.export_flux_bfl(unet_params)
    else:
        sd = ldm_export.export_ldm_checkpoint(unet_params, te.params, vae.params, v2=args.v2)
    if args.half:
        sd = {k: np.asarray(v, np.float16) for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    ldm_export.save_ldm_checkpoint(args.output, sd)
    print(f"wrote {len(sd)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
