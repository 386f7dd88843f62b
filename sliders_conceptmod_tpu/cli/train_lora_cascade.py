"""CLI: Stable Cascade (Stage-C prior) textual slider training.

Flag-surface parity: reference ``conceptmod/textsliders/train_lora_cascade.py``
(argparse at :425-472: --config_file --alpha(required) --rank --device --name
--attributes; save-name decoration at :370-376; ``train_lora`` programmatic
API at :383-421) — with the upstream breakage repaired instead of replicated
(SURVEY §2.4): the sampled prompt pair is used (not the ``settings`` variable
leaked from the caching loop), and the ``wuerstchen`` scheduler name actually
resolves (diffusion/wuerstchen.py) next to the shipped beta-scheduler path.

Reference quirks kept: honors config optimizer/lr (lr_min = lr/100,
:103-110), NO grad clipping (:312-314), saves torch-pickle ``.pt``
(:329-346), prediction guidance hardcoded 4, ``timesteps_to`` fixed at
``max_denoising_steps − 1``. ``c3lier`` network type degenerates to
attention-only exactly as upstream: the conv class-name list
(ResnetBlock2D/…) matches nothing inside a StableCascadeUNet.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.core import prompts as prompt_util
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import esd, esd_cascade
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def train(config, prompts, rank=4, peft_type="lora", save_file=True, on_step_complete=None, resume_from=None):
    if getattr(getattr(config, "tpu", None), "quantize_base", False):
        raise NotImplementedError(
            "tpu.quantize_base is supported by the text-slider trainers "
            "(train_lora/_xl/_sd3/_flux); the cascade teacher/student merge "
            "into the bf16 base (no HBM-fit need at 12x12 effnet latents) — "
            "set quantize_base: false. The warm-up perf lever here is "
            "tpu.w8a8_warmup (dual-tree int8 warm-up chain)."
        )
    # tpu.w8a8_warmup (r5): the DUAL-TREE route only — cascade's fixed
    # (T−1)-step warm-up is the largest warm-up share of any family (19 of
    # ~21 model evals/step), and its 2048-wide channelwise matmuls are the
    # shape where W8A8 measured +23% on SD3. The bf16 base keeps the exact
    # teacher/student paths; a one-time int8 copy (+~3.6 GiB for the 3.6B
    # prior) serves only the warm-up chain, slider via the apply-time
    # overlay (train/esd_cascade.py overlay_warmup).
    w8a8_warmup = bool(getattr(getattr(config, "tpu", None), "w8a8_warmup", False))
    if w8a8_warmup and peft_type != "lora":
        raise NotImplementedError(
            "tpu.w8a8_warmup rides the LoRA overlay on the int8 warm-up copy "
            "— DoRA merges; use peft_type='lora'."
        )
    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    apply_tpu_runtime_flags(getattr(config, "tpu", None))
    # tpu.student_overlay: overlay-student + merged-warm-up split. Default
    # MERGED by measurement (BASELINE.md r5 cascade A/B: overlay 3.109 vs
    # merged 3.120 steps/s, −0.4% — a wash; the cascade step's warm-up
    # dominates and the student pays the interceptors for nothing).
    student_overlay, overlay_warmup = config_util.resolve_student_overlay(
        getattr(config, "tpu", None) or config_util.TPUConfig(), False, peft_type
    )
    if overlay_warmup:
        raise NotImplementedError(
            "tpu.overlay_warmup: true — the cascade bf16 warm-up always runs "
            "the merged tree; the overlay warm-up exists only as part of "
            "tpu.w8a8_warmup's dual-tree route. Leave it unset."
        )
    dynamic_resolution = any(getattr(p, "dynamic_resolution", False) for p in prompts)
    weight_dtype = config_util.parse_precision(config.train.precision)
    # multi-chip straight from the yaml tpu: block (SURVEY §2.2) — brought up
    # BEFORE the first model load: jax.distributed.initialize must run before
    # anything initializes the XLA backend (loading device_puts weights), and
    # after it jax.devices() is global so the mesh spans the whole slice
    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

    samples_per_step = max(getattr(config.tpu, "samples_per_step", 1), 1)
    mesh = mesh_lib.training_mesh_from_config(config.tpu, samples_per_step)
    multihost = mesh is not None and jax.process_count() > 1

    tokenizer, te, prior, scheduler = factory.load_models_cascade(
        config.pretrained_model.name_or_path,
        scheduler_name=config.train.noise_scheduler,
        weight_dtype=weight_dtype,
    )
    prior_cfg = prior.config
    is_tiny = "tiny" in str(config.pretrained_model.name_or_path).lower()

    def encode_fn(prompt: str):
        text, pooled = factory.encode_prompts_cascade(te, [prompt])
        if is_tiny:  # project the tiny tower into the tiny prior's cond dims
            text = text[..., : prior_cfg.clip_text_in_channels]
            pooled = pooled[..., : prior_cfg.clip_text_pooled_in_channels]
        return text[0], pooled[0]

    if peft_type == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        peft_mod = lora_lib

    # reference: DEFAULT_TARGET_REPLACE (+ conv list under c3lier, which
    # matches no Stage-C module class), train_lora_cascade.py:53-55,87-93
    target_replace = list(lora_lib.DEFAULT_TARGET_REPLACE)
    if config.network.type == "c3lier":
        target_replace += lora_lib.UNET_TARGET_REPLACE_MODULE_CONV
    sites = peft_mod.create_sites(
        prior.params,
        rank=rank,
        alpha=config.network.alpha,
        target_replace=target_replace,
        train_method=config.network.training_method,
    )
    key = jax.random.PRNGKey(config.tpu.seed)
    key, k_init = jax.random.split(key)
    init_extra = {"base_params": prior.params} if peft_type == "dora" else {}
    lora_params = peft_mod.init_lora_params(k_init, sites, **init_extra)

    # reference honors config here (unlike the XL trainer): optimizer from
    # config.train.optimizer, lr_min = lr/100, no grad clip (:97-110,312-314)
    sched_fn = get_lr_schedule(
        config.train.lr_scheduler, config.train.lr, config.train.iterations, config.train.lr / 100
    )
    optimizer = get_optimizer(config.train.optimizer, sched_fn, config.train.optimizer_args)
    opt_state = optimizer.init(lora_params)

    bank = esd.build_prompt_bank(prompts, encode_fn)
    empty_text, empty_pooled = encode_fn("")

    # dual-tree w8a8 warm-up: one-time int8 copy of the frozen prior,
    # consumed only by the warm-up chain (the bf16 tree keeps
    # teacher/student exact) — same hygiene as train/trainer.py
    warm_params = None
    warm_apply_fn = None
    if w8a8_warmup:
        from sliders_conceptmod_tpu.adapters import quant

        warm_params, warm_scales = quant.quantize_params(prior.params)
        warm_apply_fn = quant.wrap_apply(
            prior.apply_fn(), warm_scales, weight_dtype, act_quant=True
        )

    schedule = scheduler.set_timesteps(config.train.max_denoising_steps)

    # dynamic_resolution: the reference draws a bucketed (h, w) per iteration
    # (train_lora_cascade.py:181-185) — one compiled step per bucket of the
    # fixed ≤4-shape set (train/loop_utils.resolution_bucket_picker)
    from sliders_conceptmod_tpu.train.loop_utils import resolution_bucket_picker

    buckets, pick_bucket = resolution_bucket_picker(
        dynamic_resolution, prompts[0].resolution, config.tpu.seed
    )

    def build_step(h: int, w: int):
        ccfg = esd_cascade.CascadeESDConfig(
            samples_per_step=samples_per_step,
            shard_samples=mesh is not None and samples_per_step > 1,
            # tpu.share_warmup: one shared (T−1)-step warm-up chain per step
            # (Cascade's warm-up trip count is FIXED, so the chain is the
            # dominant per-step cost); tails keep per-sample pairs — see
            # CascadeESDConfig.share_warmup for the documented deviations
            share_warmup=bool(getattr(config.tpu, "share_warmup", False)),
            mesh=mesh,
            max_denoising_steps=config.train.max_denoising_steps,
            batch_size=prompts[0].batch_size,
            height=h,
            width=w,
            latent_channels=prior_cfg.in_channels,
            resolution_multiple=prior_cfg.resolution_multiple,
            remat=not is_tiny,
        )
        return esd_cascade.make_cascade_esd_train_step(
            prior.apply_fn(),
            sites,
            scheduler,
            schedule,
            optimizer,
            ccfg,
            empty_text=empty_text,
            empty_pooled=empty_pooled,
            clip_image_dim=prior_cfg.clip_image_in_channels,
            merge_fn=peft_mod.merge_lora_params,
            student_overlay=student_overlay,
            # W8A8 on the gradient-stopped warm-up only (tpu.w8a8_warmup) —
            # the dual-tree int8 copy rides the apply-time overlay
            warm_apply=warm_apply_fn,
            overlay_warmup=w8a8_warmup,
        )

    step_fns = [build_step(h, w) for h, w in buckets]

    save_path = Path(config.save.path)
    # reference lora.py:274-283: exports cast to save.precision
    save_dtype = config_util.parse_save_precision(config.save.precision)
    from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger

    logger = MetricsLogger(save_path, config.save.name, config.logging.verbose)
    from sliders_conceptmod_tpu.train import checkpoint as ckpt

    lora_params, opt_state, start_step, key = ckpt.maybe_restore(
        resume_from, lora_params, opt_state, key
    )
    if mesh is not None:
        # (empty_text/empty_pooled are small make-time closure constants —
        # they compile into the executable, no placement needed)
        prior.params, lora_params, opt_state, bank = mesh_lib.place_training_state(
            mesh, prior.params, lora_params, opt_state, bank,
            tp=getattr(config.tpu, "mesh_model", 1) > 1,
        )
        if warm_params is not None:
            if getattr(config.tpu, "mesh_model", 1) > 1:
                raise NotImplementedError(
                    "dual-tree w8a8_warmup + tensor parallelism: the int8 "
                    "warm-up copy is not TP-sharded — use mesh_model: 1."
                )
            warm_params = mesh_lib.replicate_host_tree(warm_params, mesh)
    for i in range(start_step, config.train.iterations):
        key, k = jax.random.split(key)
        if multihost:
            k = mesh_lib.replicate_host_tree(k, mesh)
        bi = pick_bucket(i) if pick_bucket is not None else 0
        lora_params, opt_state, metrics = step_fns[bi](
            prior.params, lora_params, opt_state, k, bank, warm_params
        )
        if pick_bucket is not None:
            metrics = dict(metrics, height=buckets[bi][0], width=buckets[bi][1])
        logger.log(i, metrics)
        if (
            save_file
            and jax.process_index() == 0  # multi-host: one writer per run
            and config.save.per_steps
            and i % config.save.per_steps == 0
            and i != 0
            and i != config.train.iterations - 1
        ):
            save_path.mkdir(parents=True, exist_ok=True)
            # reference saves torch-pickle .pt for cascade (:329-338)
            peft_mod.save_weights(save_path / f"{config.save.name}_{i}steps.pt", sites, lora_params, dtype=save_dtype)
            ckpt.save_resume(save_path, config.save.name, lora_params, opt_state, i + 1, key)
        if on_step_complete is not None:
            on_step_complete(i)

    logger.close()
    if save_file:
        if jax.process_index() == 0:  # multi-host: one writer per run
            save_path.mkdir(parents=True, exist_ok=True)
            peft_mod.save_weights(save_path / f"{config.save.name}_last.pt", sites, lora_params, dtype=save_dtype)
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
    rank=4,
    device=0,
    name=None,
    attributes=None,
    batch_size=1,
    config_file="data/config-cascade.yaml",
    resolution=1024,
    steps=None,
    on_step_complete=None,
    peft_type="lora",
):
    """Programmatic API — reference train_lora_cascade.py:383-421 (writes a
    prompts yaml with neutral=target / enhance / g=4, trains, returns the
    state dict)."""
    import os

    import yaml

    spec = {
        "target": target,
        "positive": positive,
        "negative": negative,
        "unconditional": unconditional,
        "neutral": target,
        "action": "enhance",
        "guidance_scale": 4,
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
