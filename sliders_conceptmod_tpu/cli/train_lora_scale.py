"""CLI: visual (image-pair) slider training — reference
``trainscripts/imagesliders/train_lora-scale.py:376-419`` flag surface
(--config_file --alpha --rank --name --attributes --folder_main --folders
--scales) for SD1/2, and the 512px XL variant (train_lora-scale-xl.py) when
the config's model path is an XL checkpoint.

``--folders`` and ``--scales`` are comma-separated and index-matched: folder
i holds the renders for slider value scales[i]; pairs are (−s, +s) with the
same filename (reference :398-406,211-220).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.core import prompts as prompt_util
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import imageslider
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def train(config, prompts, folder_main: str, folders, scales, rank: int = 4, save_file: bool = True, resume_from=None):
    if getattr(getattr(config, "tpu", None), "quantize_base", False) or getattr(
        getattr(config, "tpu", None), "w8a8_warmup", False
    ):
        raise NotImplementedError(
            "tpu.quantize_base / tpu.w8a8_warmup are supported by the text-slider trainers "
            "(train_lora/_xl/_sd3/_flux); the image-pair trainer merges ±scale "
            "into the base per step — set quantize_base: false."
        )
    scales = np.asarray(scales)
    folders = np.asarray(folders)
    if folders.shape != scales.shape:
        raise ValueError("--folders and --scales must be index-matched")

    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    apply_tpu_runtime_flags(getattr(config, "tpu", None))
    # tpu.student_overlay: fuse the ±scale double pass into ONE 2-row UNet
    # call with per-row overlay multipliers [+s, −s] (train/imageslider.py).
    # Default OVERLAY by measurement (BASELINE.md r5 image-pair A/Bs:
    # overlay 68.55 vs merged 55.40 steps/s SD1 @256px, +23.8%; 10.64 vs
    # 8.98 XL @512px, +18.5% — the fused 2-row call beats two merges).
    student_overlay, overlay_warmup = config_util.resolve_student_overlay(
        getattr(config, "tpu", None) or config_util.TPUConfig(), False, "lora",
        default_overlay=True,
    )
    if overlay_warmup:
        raise NotImplementedError(
            "tpu.overlay_warmup: true — the image-pair trainer has no "
            "warm-up chain (latents come from noised VAE posteriors); "
            "leave it unset."
        )
    is_xl = "xl" in str(config.pretrained_model.name_or_path).lower()
    resolution = 512 if is_xl else 256  # reference resize (:219 / xl :220)

    weight_dtype = config_util.parse_precision(config.train.precision)
    settings = prompts[0]
    pooled = None
    add_tids = None
    if is_xl:
        from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids

        tokenizers, text_encoders, unet, scheduler, vae = factory.load_models_xl(
            config.pretrained_model.name_or_path,
            scheduler_name=config.train.noise_scheduler,
            weight_dtype=weight_dtype,
            with_vae=True,
        )
        emb, pooled_map = {}, {}
        for prompt_str in {settings.positive, settings.neutral, settings.unconditional}:
            text, pool = factory.encode_prompts_xl(text_encoders, [prompt_str])
            emb[prompt_str] = text[0]
            pooled_map[prompt_str] = pool[0]
        pooled = {
            "positive": pooled_map[settings.positive],
            "neutral": pooled_map[settings.neutral],
            "uncond": pooled_map[settings.unconditional],
        }
        add_tids = jnp.asarray(get_add_time_ids(resolution, resolution))
    else:
        tokenizer, te, vae, unet, scheduler = factory.load_models(
            config.pretrained_model.name_or_path,
            scheduler_name=config.train.noise_scheduler,
            v2=config.pretrained_model.v2,
            v_pred=config.pretrained_model.v_pred,
            weight_dtype=weight_dtype,
            with_vae=True,
        )
        emb = {
            p: factory.encode_prompts(te, [p], config.pretrained_model.clip_skip)[0]
            for p in {settings.positive, settings.neutral, settings.unconditional}
        }

    sites = lora_lib.create_sites(
        unet.params,
        rank=rank,
        alpha=config.network.alpha,
        target_replace=lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER
        + (lora_lib.UNET_TARGET_REPLACE_MODULE_CONV if config.network.type == "c3lier" else []),
        train_method=config.network.training_method,
    )
    key = jax.random.PRNGKey(config.tpu.seed)
    key, k_init = jax.random.split(key)
    lora_params = lora_lib.init_lora_params(k_init, sites)

    sched_fn = get_lr_schedule(
        config.train.lr_scheduler, config.train.lr, config.train.iterations, config.train.eta_min
    )
    optimizer = get_optimizer(config.train.optimizer, sched_fn, config.train.optimizer_args)
    opt_state = optimizer.init(lora_params)

    bank = imageslider.build_image_bank(
        folder_main, list(folders), [float(s) for s in scales], vae.encode, resolution
    )
    schedule = scheduler.set_timesteps(config.train.max_denoising_steps)
    icfg = imageslider.ImageSliderConfig(
        max_denoising_steps=config.train.max_denoising_steps,
        scaling_factor=vae.config.scaling_factor,
    )
    step = imageslider.make_image_slider_step(
        unet.apply_fn(),
        sites,
        scheduler,
        schedule,
        optimizer,
        icfg,
        positive_emb=emb[settings.positive],
        neutral_emb=emb[settings.neutral],
        uncond_emb=emb[settings.unconditional],
        pooled=pooled,
        add_time_ids=add_tids,
        student_overlay=student_overlay,
    )

    save_path = Path(config.save.path)
    # reference lora.py:274-283: exports cast to save.precision
    save_dtype = config_util.parse_save_precision(config.save.precision)
    from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger

    logger = MetricsLogger(save_path, config.save.name, config.logging.verbose)
    from sliders_conceptmod_tpu.train import checkpoint as ckpt

    lora_params, opt_state, start_step, key = ckpt.maybe_restore(
        resume_from, lora_params, opt_state, key
    )
    for i in range(start_step, config.train.iterations):
        key, k = jax.random.split(key)
        lora_params, opt_state, metrics = step(unet.params, lora_params, opt_state, k, bank)
        logger.log(i, metrics)
        if (
            save_file
            and config.save.per_steps
            and i % config.save.per_steps == 0
            and i != 0
            and i != config.train.iterations - 1
        ):
            save_path.mkdir(parents=True, exist_ok=True)
            lora_lib.save_weights(save_path / f"{config.save.name}_{i}steps.safetensors", sites, lora_params, dtype=save_dtype)
            ckpt.save_resume(save_path, config.save.name, lora_params, opt_state, i + 1, key)

    logger.close()
    if save_file:
        save_path.mkdir(parents=True, exist_ok=True)
        lora_lib.save_weights(save_path / f"{config.save.name}_last.safetensors", sites, lora_params, dtype=save_dtype)
    return sites, lora_params


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]
    config.network.alpha = args.alpha
    config.network.rank = args.rank
    config.save.name += f"_alpha{args.alpha}_rank{args.rank}_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"

    prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, attributes)
    folders = [f.strip() for f in args.folders.split(",")]
    scales = [float(s) for s in args.scales.split(",")]
    if args.stylecheck is not None:
        # batch mode "a-b": one slider per numbered folder_main{i}
        # (reference train_lora-scale.py:408-417)
        import os as _os

        lo, hi = (int(x) for x in args.stylecheck.split("-"))
        base_name = config.save.name
        for i in range(lo, hi):
            folder_main = args.folder_main + f"{i}"
            config.save.name = f"{_os.path.basename(folder_main)}_alpha{args.alpha}_rank{args.rank}"
            config.save.path = f"models/{config.save.name}"
            train(config, prompts, folder_main, folders, scales, rank=args.rank)
        config.save.name = base_name
    else:
        train(
            config, prompts, args.folder_main, folders, scales, rank=args.rank,
            resume_from=getattr(args, "resume_from", None),
        )


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--device", type=int, default=0, help="Ignored on TPU.")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--attributes", type=str, default=None)
    parser.add_argument("--folder_main", type=str, required=True)
    parser.add_argument("--stylecheck", type=str, default=None, help='"a-b" batch range')
    parser.add_argument("--folders", type=str, required=True)
    parser.add_argument("--scales", type=str, required=True)
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="orbax resume checkpoint dir (deterministic resume — SURVEY §5)",
    )
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
