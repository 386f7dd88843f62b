"""CLI: slider inference sweep — scale grid × prompt CSV with fixed seeds.

Flag-surface parity: reference ``conceptmod/textsliders/generate_images_xl.py:406-513``
(--model_name --prompts_path --negative_prompts --save_path --base
--guidance_scale --image_size --till_case --from_case --num_samples
--ddim_steps --rank --start_noise); rank/alpha/train_method inference from
the checkpoint filename (:459-484); output layout
``{save_path}/{basename(model_name)}/{scale}/{case}_{idx}.png``.

Improvements over the reference kept behind flags:
* ``--scales`` is exposed (the reference hardcodes and overwrites the list
  three times, ending at ``[-2]`` — :443-445); default here is the
  overwritten-away intended grid −2…2,
* rank/alpha are read from the checkpoint's ``.alpha`` entries and factor
  shapes when present (exact), falling back to filename sniffing.

TPU shape (SURVEY §3.3): the whole sampler is one jitted two-phase loop —
base params while ``t > start_noise``, slider-merged params after — and the
scale sweep reuses the compiled sampler (the slider scale enters via the
merged params, all shapes static).
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.infer.generate import (
    flip_step_for_start_noise,
    latents_to_images,
    sample_loop,
)
from sliders_conceptmod_tpu.models import factory


def infer_network_settings(lora_weight: str):
    """Filename sniffing — reference generate_images_xl.py:459-484."""
    if "full" in lora_weight:
        train_method = "full"
    elif "noxattn" in lora_weight:
        train_method = "noxattn"
    else:
        train_method = "noxattn"
    network_type = "lierla" if train_method == "xattn" else "c3lier"
    rank, alpha = 1, 4.0
    if "rank4" in lora_weight:
        rank = 4
    if "rank8" in lora_weight:
        rank = 8
    if "alpha1" in lora_weight:
        alpha = 1.0
    return train_method, network_type, rank, alpha


def settings_from_tensors(sd) -> "tuple[int, float] | None":
    """Exact rank/alpha from checkpoint tensors (improvement over filename
    sniffing)."""
    ranks = {v.shape[0] for k, v in sd.items() if k.endswith(".lora_down.weight")}
    alphas = {float(v) for k, v in sd.items() if k.endswith(".alpha")}
    if len(ranks) >= 1 and len(alphas) == 1:
        return max(ranks), alphas.pop()
    return None


def settings_from_checkpoint(path: str):
    """Exact rank/alpha from the checkpoint tensors (improvement over
    filename sniffing; safetensors only)."""
    if not str(path).endswith(".safetensors"):
        return None
    from safetensors.numpy import load_file

    return settings_from_tensors(load_file(path))


def load_prompts_csv(path: str):
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append(
                (int(row["case_number"]), row["prompt"], int(row["evaluation_seed"]))
            )
    return rows


def run(args):
    rows = load_prompts_csv(args.prompts_path)
    scales = [float(s) for s in args.scales.split(",")]
    name = os.path.basename(args.model_name)
    for scale in scales:
        os.makedirs(f"{args.save_path}/{name}/{scale}", exist_ok=True)

    # --w8a8 additionally quantizes activations per token so the quantized
    # Dense matmuls run int8×int8 on the MXU at 2× the bf16 rate
    if getattr(args, "w8a8", False):
        args.quantize_base = True
    quantize_base = bool(getattr(args, "quantize_base", False))
    if quantize_base and not args.batch_scales:
        # the sequential path merges the slider into the base per scale —
        # impossible over int8; the overlay path is the batched one
        raise SystemExit("--quantize_base requires --batch_scales (the slider "
                         "runs via the apply-time overlay, never merged)")
    if getattr(args, "mesh_data", 1) > 1 and not args.batch_scales:
        raise SystemExit("--mesh_data shards the batched scale grid — it "
                         "requires --batch_scales")
    tokenizers, text_encoders, unet, scheduler, vae = factory.load_models_xl(
        args.base, scheduler_name="ddim", weight_dtype=jnp.bfloat16, with_vae=True,
        quantize_base=quantize_base,
    )
    unet.act_quant = bool(getattr(args, "w8a8", False))

    # split the file into unet / text-encoder parts: accepts raw unet
    # sliders, raw notrigger te saves, and combine_loras outputs — the
    # in-framework consumer of the notrigger pipeline (reference delegates
    # this to diffusers/PEFT loaders; combine_loras.py:26-62 schema)
    from sliders_conceptmod_tpu.adapters import slider_file as sfile

    parts = sfile.load_slider_file(args.model_name, [te.params for te in text_encoders])
    sites, lora_params = [], {}
    if parts.unet is not None:
        train_method, network_type, rank, alpha = infer_network_settings(args.model_name)
        exact = settings_from_tensors(parts.unet)
        if exact is not None:
            rank, alpha = exact
        targets = lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER
        if network_type == "c3lier":
            targets = targets + lora_lib.UNET_TARGET_REPLACE_MODULE_CONV
        sites = lora_lib.create_sites(
            unet.params, rank=rank, alpha=alpha, target_replace=targets, train_method=train_method
        )
        sites = lora_lib.filter_sites_to_keys(parts.unet.keys(), sites)
        if not sites:
            raise ValueError(f"No matching LoRA keys between UNet and {args.model_name}")
        lora_params = lora_lib.load_weights_from_tensors(parts.unet, sites)
    elif not parts.has_te:
        raise ValueError(f"{args.model_name} carries neither unet nor text-encoder slider parts")

    schedule = scheduler.set_timesteps(args.ddim_steps)
    flip = flip_step_for_start_noise(schedule, args.start_noise)
    unet_apply = unet.apply_fn()

    latent_res = args.image_size // 8

    @jax.jit
    def sample_fn(params_base, params_slider, latents, text_emb, added):
        # base params through the SIGNATURE (CLAUDE.md: closure capture bakes
        # the 5.1GB frozen UNet into the executable as constants)
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
            added_cond_kwargs=added,
        )

    from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids

    if args.batch_scales:
        # the whole scale grid in ONE trajectory (sample_loop_scales): a v5e
        # is latency-bound at batch 1, so S sequential 50-step chains waste
        # ~S× wall-clock vs one chain carrying S per-row-multiplier rows
        from sliders_conceptmod_tpu.infer.generate import sample_loop_scales

        scales_vec = jnp.asarray(scales, jnp.float32)

        # --mesh_data N: shard the scale×sample rows over the mesh data axis
        # (SURVEY §7.1 L7 — sweep sharded across chips). Rows are fully
        # independent trajectories; params replicate, XLA partitions the
        # batch dim from the input shardings alone.
        sweep_mesh = None
        if args.mesh_data > 1:
            from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

            if (len(scales) * args.num_samples) % args.mesh_data:
                raise SystemExit(
                    f"--mesh_data={args.mesh_data} must divide scales*num_samples "
                    f"({len(scales)}*{args.num_samples}={len(scales) * args.num_samples})"
                )
            sweep_mesh = mesh_lib.make_mesh(data=args.mesh_data)

        @jax.jit
        def sample_scales_fn(params_base, lp, latents, text_emb, added):
            return sample_loop_scales(
                unet_apply, params_base, sites, lp, scales_vec, flip, scheduler,
                schedule, latents, text_emb, jax.random.PRNGKey(0),
                guidance_scale=args.guidance_scale, added_cond_kwargs=added,
            )

    neg = args.negative_prompts or ""
    import dataclasses as _dc

    def encode_case(prompt: str, scale: float):
        """(text_emb [2N], added) for one prompt. Text-encoder slider parts
        merge at ``scale`` before encoding — including the uncond row: the
        notrigger mechanism IS the empty prompt drifting toward the concept
        (adapters/slider_file.py docstring). No start_noise gating for te
        parts: embeddings are fixed per trajectory."""
        if parts.has_te:
            merged = parts.merged_text_encoder_params(
                [te.params for te in text_encoders], scale
            )
            encs = [_dc.replace(te, params=p) for te, p in zip(text_encoders, merged)]
        else:
            encs = text_encoders
        text, pooled = factory.encode_prompts_xl(encs, [prompt] * args.num_samples)
        text_u, pooled_u = factory.encode_prompts_xl(encs, [neg] * args.num_samples)
        text_emb = jnp.concatenate([text_u, text], axis=0)
        added = {
            "text_embeds": jnp.concatenate([pooled_u, pooled], axis=0),
            "time_ids": jnp.tile(
                jnp.asarray(get_add_time_ids(args.image_size, args.image_size)),
                (2 * args.num_samples, 1),
            ),
        }
        return text_emb, added

    for case_number, prompt, seed in rows:
        if not (args.from_case <= case_number <= args.till_case):
            continue
        per_scale_first = []
        if not parts.has_te:
            text_emb, added = encode_case(prompt, 0.0)
        if args.batch_scales:
            S, N = len(scales), args.num_samples
            if all(
                os.path.exists(f"{args.save_path}/{name}/{s}/{case_number}_0.png")
                for s in scales
            ):
                for s in scales:
                    per_scale_first.append(
                        np.asarray(Image.open(f"{args.save_path}/{name}/{s}/{case_number}_0.png"))
                    )
            else:
                key = jax.random.PRNGKey(seed)
                lat0 = (
                    jax.random.normal(key, (N, 4, latent_res, latent_res), jnp.float32)
                    * schedule.init_noise_sigma
                )
                lat_b = jnp.tile(lat0, (S, 1, 1, 1))
                if parts.has_te:
                    # per-scale te-merged embeddings: rows are scale-major
                    # uncond(S*N) ++ cond(S*N), matching sample_loop_scales
                    per_sc = [encode_case(prompt, s) for s in scales]
                    emb_b = jnp.concatenate(
                        [e[0][:N] for e in per_sc] + [e[0][N:] for e in per_sc], axis=0
                    )
                    added_b = {
                        k_: jnp.concatenate(
                            [e[1][k_][:N] for e in per_sc]
                            + [e[1][k_][N:] for e in per_sc], axis=0
                        )
                        for k_ in per_sc[0][1]
                    }
                else:
                    emb_b = jnp.concatenate(
                        [jnp.tile(text_emb[:N], (S, 1, 1)), jnp.tile(text_emb[N:], (S, 1, 1))], axis=0
                    )
                    added_b = {
                        k_: jnp.concatenate(
                            [jnp.tile(v[:N], (S,) + (1,) * (v.ndim - 1)),
                             jnp.tile(v[N:], (S,) + (1,) * (v.ndim - 1))], axis=0
                        )
                        for k_, v in added.items()
                    }
                if sweep_mesh is not None:
                    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

                    shard = mesh_lib.data_sharded(sweep_mesh)
                    lat_b = jax.device_put(lat_b, shard)
                    emb_b = jax.device_put(emb_b, shard)
                    added_b = {k_: jax.device_put(v, shard) for k_, v in added_b.items()}
                final_b = sample_scales_fn(
                    unet.params, lora_params, lat_b.astype(jnp.bfloat16), emb_b, added_b
                )
                for si, scale in enumerate(scales):
                    images = latents_to_images(
                        vae.decode, final_b[si * N:(si + 1) * N], vae.config.scaling_factor
                    )
                    for idx in range(images.shape[0]):
                        Image.fromarray(images[idx]).save(
                            f"{args.save_path}/{name}/{scale}/{case_number}_{idx}.png"
                        )
                    per_scale_first.append(images[0])
                print(f"case {case_number}: saved {S * N} images (batched scales)")
            if per_scale_first:
                os.makedirs(f"{args.save_path}/{name}/all", exist_ok=True)
                Image.fromarray(np.concatenate(per_scale_first, axis=1)).save(
                    f"{args.save_path}/{name}/all/{case_number}.png"
                )
            continue

        for scale in scales:
            out_path = f"{args.save_path}/{name}/{scale}/{case_number}_0.png"
            if os.path.exists(out_path):
                # resume: keep the already-generated column so the per-case
                # composite isn't rebuilt from the new scales alone
                per_scale_first.append(np.asarray(Image.open(out_path)))
                continue
            key = jax.random.PRNGKey(seed)
            latents = (
                jax.random.normal(
                    key, (args.num_samples, 4, latent_res, latent_res), jnp.float32
                )
                * schedule.init_noise_sigma
            )
            if parts.has_te:
                text_emb, added = encode_case(prompt, scale)
            # release the previous scale's merged tree before building the
            # next (base + two merged SDXL trees is 15.3GB — transient OOM
            # at 1024px otherwise)
            params_slider = None  # noqa: F841
            params_slider = lora_lib.merge_lora_params(unet.params, sites, lora_params, scale)
            final = sample_fn(
                unet.params, params_slider, latents.astype(jnp.bfloat16), text_emb, added
            )
            images = latents_to_images(vae.decode, final, vae.config.scaling_factor)
            for idx in range(images.shape[0]):
                Image.fromarray(images[idx]).save(
                    f"{args.save_path}/{name}/{scale}/{case_number}_{idx}.png"
                )
            per_scale_first.append(images[0])
            print(f"case {case_number} scale {scale}: saved {images.shape[0]} images")
        if per_scale_first:
            # composite grid across the scale sweep (matches the SD1 CLI)
            os.makedirs(f"{args.save_path}/{name}/all", exist_ok=True)
            Image.fromarray(np.concatenate(per_scale_first, axis=1)).save(
                f"{args.save_path}/{name}/all/{case_number}.png"
            )


def build_parser():
    parser = argparse.ArgumentParser(
        prog="generateImages", description="Generate slider scale sweeps"
    )
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--negative_prompts", type=str, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--base", type=str, default="stabilityai/stable-diffusion-xl-base-1.0")
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--start_noise", type=int, default=750)
    parser.add_argument("--scales", type=str, default="-2,-1,0,1,2")
    parser.add_argument(
        "--batch_scales", action="store_true",
        help="Run the whole scale grid as ONE batched trajectory via the "
        "per-row LoRA overlay (latency-bound chips: ~S× sweep throughput).",
    )
    parser.add_argument(
        "--quantize_base", action="store_true",
        help="int8 UNet Dense kernels (adapters/quant.py): 2.1 GiB more v5e "
        "HBM headroom for big batched sweeps. Requires --batch_scales.",
    )
    parser.add_argument(
        "--w8a8", action="store_true",
        help="W8A8: per-token dynamic int8 activations on top of the int8 "
        "kernels — MXU matmuls at 2× the bf16 rate (implies --quantize_base).",
    )
    parser.add_argument(
        "--mesh_data", type=int, default=1,
        help="Shard the batched scale grid over N mesh data-axis devices "
        "(rows are independent trajectories; needs --batch_scales and "
        "scales*num_samples divisible by N).",
    )
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
