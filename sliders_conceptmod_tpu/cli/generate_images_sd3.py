"""CLI: SD3 slider inference sweep (flow matching).

Completes the reference surface for SD3-family sliders (the reference only
ships notebook inference for SD3/Flux): sweep slider scales over a prompts
CSV with the two-phase flow-Euler sampler, '-'-delimited LoRA checkpoints,
start_noise expressed in continuous flow timesteps (0..1000).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.cli.generate_images_xl import load_prompts_csv, settings_from_tensors
from sliders_conceptmod_tpu.infer.generate_flow import (
    flip_step_for_start_noise,
    sample_flow_loop,
    sd3_latents_to_images,
)
from sliders_conceptmod_tpu.models import factory


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    scales = [float(s) for s in args.scales.split(",")]
    name = os.path.basename(args.model_name)
    for scale in scales:
        os.makedirs(f"{args.save_path}/{name}/{scale}", exist_ok=True)

    # --quantize_base: int8 frozen MMDiT (adapters/quant.py) — SD3.5-Large
    # class bases sweep on one v5e; slider via the traced-scale overlay.
    # --w8a8 additionally quantizes activations per token so the base
    # matmuls run int8×int8 on the MXU at 2× the bf16 rate (inference only).
    if getattr(args, "w8a8", False):
        args.quantize_base = True
    tokenizers, text_encoders, transformer, scheduler = factory.load_models_sd3(
        args.base, weight_dtype=jnp.bfloat16, quantize_base=args.quantize_base
    )
    transformer.act_quant = bool(getattr(args, "w8a8", False))
    mm_cfg = transformer.config
    is_tiny = "tiny" in str(args.base).lower()

    # split into transformer / text-encoder parts: accepts raw '-'-delimited
    # sliders, raw notrigger te saves (SD3 clip_l/clip_g towers, reference
    # train_notrigger.py:148-176), and combine_loras outputs
    from sliders_conceptmod_tpu.adapters import slider_file as sfile

    parts = sfile.load_slider_file(args.model_name, [te.params for te in text_encoders])
    sites, lora_params = [], {}
    if parts.unet is not None:
        rank, alpha = 4, 1.0
        exact = settings_from_tensors(parts.unet)
        if exact is not None:
            rank, alpha = exact
        sites = lora_lib.create_sites(
            transformer.params, rank=rank, alpha=alpha, target_replace=["Attention"],
            train_method="full", delimiter="-",
        )
        sites = lora_lib.filter_sites_to_keys(parts.unet.keys(), sites)
        if not sites:
            raise ValueError(f"No matching LoRA keys between transformer and {args.model_name}")
        lora_params = lora_lib.load_weights_from_tensors(parts.unet, sites)
    elif not parts.has_te:
        raise ValueError(f"{args.model_name} carries neither transformer nor text-encoder slider parts")

    schedule = scheduler.set_timesteps(args.steps)
    flip = flip_step_for_start_noise(schedule, args.start_noise)
    apply_fn = transformer.apply_fn()
    latent_res = args.image_size // 8

    vae = None
    if os.path.isdir(os.path.join(str(args.base), "vae")):
        vae = factory._load_or_init_vae(args.base, "sd3", jnp.float32)

    # one executable for the whole (case × scale) sweep — merged params are
    # an argument, so scale changes never re-trace the sampler
    sample_fn = jax.jit(
        lambda pb, ps, lat, e, p: sample_flow_loop(
            apply_fn, pb, ps, flip, schedule, lat, e, p, guidance_scale=args.guidance_scale
        )
    )

    # quantized base: the scale is a traced (1,)-row multiplier through the
    # apply-time overlay — one executable for every scale, nothing merged
    @jax.jit
    def sample_overlay_fn(base, lp, row_scale, lat, e, p):
        return sample_flow_loop(
            apply_fn, base, base, flip, schedule, lat, e, p,
            guidance_scale=args.guidance_scale,
            slider_overlay=lambda: lora_lib.lora_overlay(sites, lp, row_scale),
        )

    t5_seq_len = 4 if is_tiny else 256
    import dataclasses as _dc

    # the uncond ("") row only depends on the te-merge scale (always 0.0
    # without te parts) — cache it per scale instead of re-running both CLIP
    # towers once per case row
    _uncond_cache: dict = {}

    def encode_case(prompt: str, scale: float):
        """(emb [2], pool [2]) uncond++cond. te slider parts merge at
        ``scale`` before encoding — INCLUDING the uncond row (the notrigger
        mechanism is the empty-prompt drift, adapters/slider_file.py)."""
        if parts.has_te:
            m = parts.merged_text_encoder_params([te.params for te in text_encoders], scale)
            encs = [_dc.replace(te, params=p) for te, p in zip(text_encoders, m)]
        else:
            encs = text_encoders
            scale = 0.0
        kw = dict(joint_attention_dim=mm_cfg.joint_attention_dim, t5_seq_len=t5_seq_len)
        ckey = float(scale)
        if ckey not in _uncond_cache:
            _uncond_cache[ckey] = factory.encode_prompts_sd3(encs, [""], **kw)
        text_u, pooled_u = _uncond_cache[ckey]
        text, pooled = factory.encode_prompts_sd3(encs, [prompt], **kw)
        return (
            jnp.concatenate([text_u, text], axis=0),
            jnp.concatenate([pooled_u, pooled], axis=0),
        )

    if parts.has_te:
        # te-merged embeddings are scale-dependent — encode lazily in the
        # sweep loop (text encoders stay resident; te sliders target CLIP
        # towers whose params are small next to the MMDiT)
        encoded = [
            (case_number, seed, prompt)
            for case_number, prompt, seed in rows
            if args.from_case <= case_number <= args.till_case
        ]
    else:
        # pre-encode every case row, then drop the text encoders — during the
        # sweep the device must hold base + merged transformer trees (2×4.1GB
        # at SD3-Medium), so the CLIP towers can't stay resident alongside them
        encoded = []
        for case_number, prompt, seed in rows:
            if not (args.from_case <= case_number <= args.till_case):
                continue
            emb, pool = encode_case(prompt, 0.0)
            encoded.append((case_number, seed, emb, pool))
        del text_encoders

    merged = None
    for case_number, seed, *rest in encoded:
        for scale in scales:
            if parts.has_te:
                emb, pool = encode_case(rest[0], scale)
            else:
                emb, pool = rest
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(
                key, (1, mm_cfg.in_channels, latent_res, latent_res), jnp.float32
            )
            if args.quantize_base:
                final = sample_overlay_fn(
                    transformer.params, lora_params,
                    jnp.full((1,), scale, jnp.float32),
                    latents.astype(jnp.bfloat16), emb, pool,
                )
            else:
                # release the previous scale's merged tree BEFORE building the
                # next — holding both alongside the base is 3 full param trees
                merged = None  # noqa: F841
                merged = lora_lib.merge_lora_params(transformer.params, sites, lora_params, scale)
                final = sample_fn(transformer.params, merged, latents.astype(jnp.bfloat16), emb, pool)
            out_path = f"{args.save_path}/{name}/{scale}/{case_number}_0"
            if vae is not None:
                from PIL import Image

                img = sd3_latents_to_images(vae.decode, final, vae.config.scaling_factor, vae.config.shift_factor)[0]
                Image.fromarray(img).save(out_path + ".png")
            else:  # weightless smoke: persist raw latents (fp32 — numpy
                # cannot round-trip ml_dtypes bf16 through .npy)
                import numpy as np

                np.save(out_path + ".npy", np.asarray(jax.device_get(final), dtype=np.float32))
            print(f"case {case_number} scale {scale}: wrote {out_path}")


def build_parser():
    parser = argparse.ArgumentParser(prog="generateImagesSD3")
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--base", type=str, default="stabilityai/stable-diffusion-3-medium")
    parser.add_argument("--guidance_scale", type=float, default=7.0)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    parser.add_argument("--steps", type=int, default=28)
    parser.add_argument("--start_noise", type=float, default=750)
    parser.add_argument("--scales", type=str, default="-2,-1,0,1,2")
    parser.add_argument(
        "--quantize_base", action="store_true",
        help="int8 frozen MMDiT (adapters/quant.py): SD3.5-Large-class bases "
        "sweep on one 16 GB v5e; the slider runs via the apply-time overlay.",
    )
    parser.add_argument(
        "--w8a8", action="store_true",
        help="W8A8: per-token dynamic int8 activations on top of the int8 "
        "base — MXU matmuls at 2× the bf16 rate (implies --quantize_base).",
    )
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
