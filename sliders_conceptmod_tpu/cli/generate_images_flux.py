"""CLI: Flux slider inference sweep (few-step flow matching, packed tokens).

Completes the Flux inference surface (the reference ships only notebook /
pipeline inference for Flux): few-step un-guided sampling with the slider
flipped on below ``--start_noise`` (continuous flow timestep), dynamic
μ-shifted schedule, '-'-delimited LoRA checkpoints.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.cli.generate_images_xl import load_prompts_csv, settings_from_tensors
from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
from sliders_conceptmod_tpu.infer.generate_flow import flip_step_for_start_noise, sd3_latents_to_images
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.models.flux import pack_latents, prepare_latent_image_ids, unpack_latents


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    scales = [float(s) for s in args.scales.split(",")]
    name = os.path.basename(args.model_name)
    for scale in scales:
        os.makedirs(f"{args.save_path}/{name}/{scale}", exist_ok=True)

    # --quantize_base: int8 frozen base (adapters/quant.py) — full-depth
    # schnell (23.8 GB bf16) sweeps on one 16 GB v5e. The slider is applied
    # through the apply-time LoRA overlay with the scale as a TRACED [B]
    # multiplier, so all scales share one executable and the int8 base is
    # never merged into.
    # --w8a8 additionally quantizes activations per token so the base
    # matmuls run int8×int8 on the MXU at 2× the bf16 rate (inference only).
    if getattr(args, "w8a8", False):
        args.quantize_base = True
    tokenizers, encode_fn, transformer, scheduler = factory.load_models_flux(
        args.base, weight_dtype=jnp.bfloat16, quantize_base=args.quantize_base
    )
    transformer.act_quant = bool(getattr(args, "w8a8", False))
    flux_cfg = transformer.config
    is_tiny = "tiny" in str(args.base).lower()
    vae_scale = 2 if is_tiny else 8
    latent_channels = flux_cfg.in_channels // 4

    # split into transformer / text-encoder parts (te1=CLIP, te2=T5 —
    # reference notrigger FLUX.1 prefixes + combine_loras te3 rename);
    # te parts require real encoders (the weightless path has a pseudo-
    # embedding stub, no param trees to merge into)
    from sliders_conceptmod_tpu.adapters import slider_file as sfile

    te_params_list = getattr(encode_fn, "text_encoder_params", None)
    parts = sfile.load_slider_file(args.model_name, te_params_list, te2_is_t5=True)
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

    gh = args.image_size // vae_scale // 2
    gw = args.image_size // vae_scale // 2
    mu = calculate_shift(gh * gw)
    schedule = scheduler.set_timesteps(args.steps, mu=mu)
    flip = flip_step_for_start_noise(schedule, args.start_noise)
    apply_fn = transformer.apply_fn()
    img_ids = jnp.asarray(prepare_latent_image_ids(gh, gw))

    # dev checkpoints (guidance_embeds): the user's --guidance_scale is the
    # distilled-guidance EMBEDDING value (diffusers FluxPipeline semantics —
    # no CFG row doubling); schnell ignores it
    guidance_kw = (
        {"guidance": jnp.float32(args.guidance_scale)} if flux_cfg.guidance_embeds else {}
    )

    @jax.jit  # one executable for the whole (case × scale) sweep
    def sample(params_a, params_b, tokens, text, pooled):
        txt_ids = jnp.zeros((text.shape[1], 3))

        def make_body(params):
            def body(i, tok):
                t = jnp.broadcast_to(schedule.timesteps[i] / 1000.0, (tok.shape[0],))
                v = apply_fn(params, tok, t, text, pooled, txt_ids, img_ids, **guidance_kw)
                return FlowMatchScheduler.step(schedule, v, i, tok)

            return body

        if flip > 0:
            tokens = jax.lax.fori_loop(0, flip, make_body(params_a), tokens)
        if flip < schedule.num_inference_steps:
            tokens = jax.lax.fori_loop(flip, schedule.num_inference_steps, make_body(params_b), tokens)
        return tokens

    # quantized base: scale is a traced [B] row multiplier — one executable
    # covers every scale (incl. 0 == slider off); shared with serve/bench
    from sliders_conceptmod_tpu.infer.generate_flow import make_packed_overlay_sampler

    sample_overlay = make_packed_overlay_sampler(
        apply_fn, sites, schedule, flip, img_ids, flux_cfg.guidance_embeds
    )

    vae = None
    if os.path.isdir(os.path.join(str(args.base), "vae")):
        vae = factory._load_or_init_vae(args.base, "flux", jnp.float32)

    if parts.has_te:
        # te-merged embeddings are scale-dependent — encode lazily in the
        # sweep loop (encoders stay resident; int8 base via --quantize_base
        # is the memory lever when T5-XXL + base don't co-fit)
        encoded = [
            (case_number, seed, prompt)
            for case_number, prompt, seed in rows
            if args.from_case <= case_number <= args.till_case
        ]
    else:
        # pre-encode every case row, then drop the encoders (T5-XXL alone is
        # 9.5GB bf16 — it cannot stay resident next to base + merged trees)
        encoded = []
        for case_number, prompt, seed in rows:
            if not (args.from_case <= case_number <= args.till_case):
                continue
            text, pooled = encode_fn(prompt)
            encoded.append((case_number, seed, text[None], pooled[None]))
        del encode_fn

    merged = None
    for case_number, seed, *rest in encoded:
        for scale in scales:
            if parts.has_te:
                m = parts.merged_text_encoder_params(te_params_list, scale)
                text, pooled = encode_fn.encode_with_merged(rest[0], m)
                text, pooled = text[None], pooled[None]
            else:
                text, pooled = rest
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(
                key, (1, latent_channels, gh * 2, gw * 2), jnp.float32
            )
            tokens = pack_latents(latents).astype(jnp.bfloat16)
            if args.quantize_base:
                final_tokens = sample_overlay(
                    transformer.params, lora_params,
                    jnp.full((tokens.shape[0],), scale, jnp.float32),
                    tokens, text, pooled, jnp.float32(args.guidance_scale),
                )
            else:
                # release the previous merged tree before building the next —
                # base + two merged trees is 3 full param sets
                merged = None  # noqa: F841
                merged = lora_lib.merge_lora_params(transformer.params, sites, lora_params, scale)
                final_tokens = sample(transformer.params, merged, tokens, text, pooled)
            final = unpack_latents(final_tokens, gh * 2, gw * 2)
            out_path = f"{args.save_path}/{name}/{scale}/{case_number}_0"
            if vae is not None:
                from PIL import Image

                img = sd3_latents_to_images(vae.decode, final, vae.config.scaling_factor, vae.config.shift_factor)[0]
                Image.fromarray(img).save(out_path + ".png")
            else:
                # fp32 — numpy cannot round-trip ml_dtypes bf16 through .npy
                np.save(out_path + ".npy", np.asarray(jax.device_get(final), dtype=np.float32))
            print(f"case {case_number} scale {scale}: wrote {out_path}")


def build_parser():
    parser = argparse.ArgumentParser(prog="generateImagesFlux")
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--base", type=str, default="black-forest-labs/FLUX.1-schnell")
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--start_noise", type=float, default=800)
    parser.add_argument(
        "--guidance_scale", type=float, default=3.5,
        help="Distilled-guidance embedding for dev checkpoints (no CFG); ignored by schnell.",
    )
    parser.add_argument("--scales", type=str, default="-2,-1,0,1,2")
    parser.add_argument(
        "--quantize_base", action="store_true",
        help="int8 frozen base (adapters/quant.py): full-depth schnell sweeps "
        "on one 16 GB v5e; the slider runs via the apply-time overlay.",
    )
    parser.add_argument(
        "--w8a8", action="store_true",
        help="W8A8: per-token dynamic int8 activations on top of the int8 "
        "base — MXU matmuls at 2× the bf16 rate (implies --quantize_base).",
    )
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
