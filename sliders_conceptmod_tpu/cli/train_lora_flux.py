"""CLI: Flux textual slider training (few-step flow matching).

Flag-surface parity: reference ``conceptmod/textsliders/train_lora_flux.py``
(same argparse as the XL trainer). Reference specifics preserved: 8
inference steps with dynamic μ-shift, timesteps_to fixed at 0, no CFG,
gradient accumulation to effective batch 8 via optax.MultiSteps, hardcoded
AdamW(1e-4, wd 1e-6)+cosine(T_max=50), grad clip-value 1.0, '-'-delimited
LoRA over Attention modules (dual and single stream q/k/v + dual to_out).
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import jax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.core import prompts as prompt_util
from sliders_conceptmod_tpu.diffusion.flow_match import calculate_shift
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import esd, esd_flux
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

import optax


def train(config, prompts, rank=4, peft_type="lora", save_file=True, on_step_complete=None, resume_from=None):
    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    apply_tpu_runtime_flags(getattr(config, "tpu", None))
    dynamic_resolution = any(getattr(p, "dynamic_resolution", False) for p in prompts)
    weight_dtype = config_util.parse_precision(config.train.precision)
    # tpu.quantize_base: int8 frozen base (adapters/quant.py) — full-depth
    # schnell fits one v5e; the student LoRA runs via the apply-time overlay
    quantize_base = bool(getattr(config.tpu, "quantize_base", False))
    if getattr(config.tpu, "w8a8_warmup", False):
        raise NotImplementedError(
            "tpu.w8a8_warmup accelerates a gradient-stopped partial-denoise "
            "warm-up chain (SD1/SDXL/SD3 trainers); the Flux trainer has no "
            "warm-up — timesteps_to=0 fixed (reference train_lora_flux.py:"
            "238-239) — set w8a8_warmup: false."
        )
    if quantize_base and peft_type == "dora":
        raise NotImplementedError(
            "tpu.quantize_base requires full-precision base magnitudes for "
            "DoRA's per-column norm init — use peft_type=lora with a "
            "quantized base."
        )
    # tpu.student_overlay (core/config.resolve_student_overlay): on a bf16
    # base it skips the dense dL/dW' weight-grads. overlay_warmup is
    # meaningless here — the Flux trainer has no warm-up chain
    # (timesteps_to=0 fixed, reference train_lora_flux.py:238-239)
    student_overlay, _ = config_util.resolve_student_overlay(
        config.tpu, quantize_base, peft_type
    )
    # multi-chip straight from the yaml tpu: block (SURVEY §2.2) — brought up
    # BEFORE the first model load: jax.distributed.initialize must run before
    # anything initializes the XLA backend (loading device_puts weights), and
    # after it jax.devices() is global so the mesh spans the whole slice
    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

    samples_per_step = max(getattr(config.tpu, "samples_per_step", 1), 1)
    mesh = mesh_lib.training_mesh_from_config(config.tpu, samples_per_step)
    multihost = mesh is not None and jax.process_count() > 1

    tokenizers, encode_raw, transformer, scheduler = factory.load_models_flux(
        config.pretrained_model.name_or_path,
        weight_dtype=weight_dtype,
        quantize_base=quantize_base,
    )
    flux_cfg = transformer.config

    def encode_fn(prompt: str):
        return encode_raw(prompt)

    if peft_type == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        peft_mod = lora_lib

    sites = peft_mod.create_sites(
        transformer.params,
        rank=rank,
        alpha=config.network.alpha,
        target_replace=["Attention"],
        train_method=config.network.training_method,
        delimiter="-",
    )
    key = jax.random.PRNGKey(config.tpu.seed)
    key, k_init = jax.random.split(key)
    init_extra = {"base_params": transformer.params} if peft_type == "dora" else {}
    lora_params = peft_mod.init_lora_params(k_init, sites, **init_extra)

    resolution = prompts[0].resolution
    batch_size = prompts[0].batch_size
    # grad accumulation to effective batch 8 (reference :222-226).
    # tpu.samples_per_step folds accumulation micro-steps into per-step DP
    # samples (same averaged gradient — mean over samples ≡ MultiSteps' mean
    # over micro grads): samples_per_step=8 turns the reference's sequential
    # accumulation chain into 8-way data parallelism over the mesh.
    eff_rows = batch_size * samples_per_step
    accumulation_steps = math.ceil(8 / eff_rows) if eff_rows < 8 else 1

    base_opt = get_optimizer(
        "adamw",
        get_lr_schedule("cosine", 1e-4, 50, 1e-6),
        weight_decay=1e-6,
        grad_clip_value=1.0,
    )
    optimizer = optax.MultiSteps(base_opt, every_k_schedule=accumulation_steps)
    opt_state = optimizer.init(lora_params)

    bank = esd.build_prompt_bank(prompts, encode_fn)

    vae_scale = 8 if "tiny" not in str(config.pretrained_model.name_or_path).lower() else 2
    n_steps = 8  # reference num_inference_steps (train_lora_flux.py:240)
    # latent channels: packed token dim / 4
    latent_channels = flux_cfg.in_channels // 4
    is_tiny = "tiny" in str(config.pretrained_model.name_or_path).lower()

    # dynamic_resolution: the reference draws a bucketed (h, w) per iteration
    # (train_lora_flux.py:241-245) — one compiled step per bucket; the flow
    # schedule's timestep shift follows each bucket's ACTUAL token count, as
    # the reference's diffusion_flux derives mu from image_seq_len
    # (train_util.py:640-657)
    from sliders_conceptmod_tpu.train.loop_utils import resolution_bucket_picker

    buckets, pick_bucket = resolution_bucket_picker(
        dynamic_resolution, resolution, config.tpu.seed
    )

    def build_step(h: int, w: int):
        gh, gw = h // vae_scale // 2, w // vae_scale // 2
        schedule = scheduler.set_timesteps(n_steps, mu=calculate_shift(gh * gw))
        fcfg = esd_flux.FluxESDConfig(
            samples_per_step=samples_per_step,
            shard_samples=mesh is not None and samples_per_step > 1,
            mesh=mesh,
            num_inference_steps=n_steps,
            batch_size=batch_size,
            height=h,
            width=w,
            latent_channels=latent_channels,
            vae_scale=vae_scale,
            remat=not is_tiny,
        )
        return esd_flux.make_flux_esd_train_step(
            transformer.apply_fn(), sites, schedule, optimizer, fcfg,
            merge_fn=peft_mod.merge_lora_params,
            student_overlay=student_overlay,
            # per-block remat on the student caps fwd+bwd peak HBM at block
            # granularity — what fits the full-depth int8 schnell step on a v5e
            remat_apply=transformer.apply_fn(remat_blocks=True) if fcfg.remat else None,
        )

    step_fns = [build_step(h, w) for h, w in buckets]

    save_path = Path(config.save.path)
    # reference lora.py:274-283: exports cast to save.precision
    save_dtype = config_util.parse_save_precision(config.save.precision)
    from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger

    logger = MetricsLogger(save_path, config.save.name, config.logging.verbose)
    total_micro = config.train.iterations * accumulation_steps + 1  # reference :227
    from sliders_conceptmod_tpu.ops.attention import sequence_parallel_from_config
    from sliders_conceptmod_tpu.train import checkpoint as ckpt

    lora_params, opt_state, start_micro, key = ckpt.maybe_restore(
        resume_from, lora_params, opt_state, key
    )
    if mesh is not None:
        transformer.params, lora_params, opt_state, bank = mesh_lib.place_training_state(
            mesh, transformer.params, lora_params, opt_state, bank,
            tp=getattr(config.tpu, "mesh_model", 1) > 1,
        )

    # tpu.sequence_parallel: joint self-attention (4096+512 tokens at 1024px)
    # rings K/V over the mesh data axis — the long-sequence family
    with sequence_parallel_from_config(config.tpu):
        for i in range(start_micro, total_micro):
            key, k = jax.random.split(key)
            if multihost:
                k = mesh_lib.replicate_host_tree(k, mesh)
            # reference draws the bucket per prompt-pair iteration, i.e. per
            # MICRO step under accumulation — grads mix resolutions, as there
            bi = pick_bucket(i) if pick_bucket is not None else 0
            lora_params, opt_state, metrics = step_fns[bi](
                transformer.params, lora_params, opt_state, k, bank
            )
            if pick_bucket is not None:
                metrics = dict(metrics, height=buckets[bi][0], width=buckets[bi][1])
            logger.log(i, metrics)
            # periodic save at micro-step granularity (reference :414-426)
            if (
                save_file
                and jax.process_index() == 0  # multi-host: one writer per run
                and config.save.per_steps
                and i % config.save.per_steps == 0
                and i != 0
                and i != total_micro - 1  # skip-last-step, in micro-step units
            ):
                save_path.mkdir(parents=True, exist_ok=True)
                peft_mod.save_weights(save_path / f"{config.save.name}_{i}steps.safetensors", sites, lora_params, dtype=save_dtype)
                ckpt.save_resume(save_path, config.save.name, lora_params, opt_state, i + 1, key)
            # reference fires per OPTIMIZER step, with the macro counter (:427-429)
            if (i + 1) % accumulation_steps == 0 and on_step_complete is not None:
                on_step_complete((i + 1) // accumulation_steps)

    logger.close()
    if save_file:
        if jax.process_index() == 0:  # multi-host: one writer per run
            save_path.mkdir(parents=True, exist_ok=True)
            peft_mod.save_weights(save_path / f"{config.save.name}_last.safetensors", sites, lora_params, dtype=save_dtype)
        return None
    return peft_mod.state_dict_numpy(sites, lora_params)


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
    train(
        config, prompts, rank=args.rank, peft_type=args.peft_type,
        resume_from=getattr(args, "resume_from", None),
    )


def train_lora(
    target,
    positive,
    negative,
    unconditional,
    alpha=1.0,
    device=0,
    name=None,
    attributes=None,
    batch_size=1,
    config_file="data/config-xl.yaml",
    resolution=512,
    steps=None,
    on_step_complete=None,
    peft_type="lora",
    rank=4,
):
    """Programmatic API — same surface as the XL trainer's train_lora
    (reference train_lora_xl.py:421-458): writes a prompts yaml, trains,
    returns the state dict."""
    import os

    import yaml

    spec = {
        "target": target,
        "positive": positive,
        "negative": negative,
        "unconditional": unconditional,
        "neutral": target,
        "action": "enhance",
        "resolution": resolution,
        "dynamic_resolution": False,
        "batch_size": batch_size,
    }
    prompts_path = os.path.join(os.path.dirname(config_file) or ".", "prompts-api.yaml")
    with open(prompts_path, "w") as f:
        yaml.dump([spec], f)
    config = config_util.load_config_from_yaml(config_file)
    config.prompts_file = prompts_path
    if name is not None:
        config.save.name = name
    if steps is not None:
        config.train.iterations = steps
    attr_list = [a.strip() for a in attributes.split(",")] if attributes else []
    config.network.alpha = alpha
    config.network.rank = rank
    config.save.name += f"_alpha{alpha}_rank{rank}_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"
    prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, attr_list)
    return train(
        config, prompts, rank=rank, peft_type=peft_type, save_file=False,
        on_step_complete=on_step_complete,
    )


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--alpha", type=float, required=True)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--device", type=int, default=0, help="Ignored on TPU.")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--attributes", type=str, default=None)
    parser.add_argument("--peft_type", type=str, default="lora")
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="orbax resume checkpoint dir (deterministic resume — SURVEY §5)",
    )
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
