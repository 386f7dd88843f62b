"""CLI: SD3 textual slider training (MMDiT + flow matching).

Flag-surface parity: reference ``conceptmod/textsliders/train_lora_sd3.py``
(same argparse as the XL trainer: --config_file --alpha --rank --device
--name --attributes --peft_type) with the reference's SD3 specifics:
delimiter "-" LoRA keys over target ["Attention"] (:104-111), stepped-latent
ESD loss (train/esd_sd3.py), 16-channel latents, T5 dropped at encode time.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.core import prompts as prompt_util
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import esd, esd_sd3
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def train(config, prompts, rank=4, peft_type="lora", save_file=True, on_step_complete=None, resume_from=None):
    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    apply_tpu_runtime_flags(getattr(config, "tpu", None))
    dynamic_resolution = any(getattr(p, "dynamic_resolution", False) for p in prompts)
    weight_dtype = config_util.parse_precision(config.train.precision)
    # tpu.quantize_base: int8 frozen MMDiT (adapters/quant.py) — SD3.5-Large
    # class bases fit one v5e; the student LoRA runs via the apply-time overlay
    quantize_base = bool(getattr(config.tpu, "quantize_base", False))
    # tpu.w8a8_warmup: W8A8 (int8 MXU matmuls) on the gradient-stopped
    # warm-up chain only — teacher/student stay exact (train/esd_sd3.py
    # warm_apply, same lever as SD1/SDXL's train/esd.py). WITHOUT
    # quantize_base this is the DUAL-TREE route (train/trainer.py): the
    # bf16 base keeps the exact merged-teacher + overlay-student paths and
    # a one-time int8 copy (+~2.2 GiB for SD3-Medium) serves only the
    # 28-step flow warm-up — where W8A8 measured +23% on SD3's wide matmuls.
    w8a8_warmup = bool(getattr(config.tpu, "w8a8_warmup", False))
    dual_tree_warmup = w8a8_warmup and not quantize_base
    if quantize_base and peft_type == "dora":
        raise NotImplementedError(
            "tpu.quantize_base requires full-precision base magnitudes for "
            "DoRA's per-column norm init — use peft_type=lora with a "
            "quantized base."
        )
    if dual_tree_warmup and peft_type != "lora":
        raise NotImplementedError(
            "tpu.w8a8_warmup without quantize_base (dual-tree) rides the LoRA "
            "overlay on the int8 warm-up copy — DoRA merges; use peft_type='lora'."
        )
    # tpu.student_overlay (core/config.resolve_student_overlay): on a bf16
    # base it skips the dense dL/dW' weight-grads. default_overlay=True for
    # bf16 LoRA: the overlay-student + merged-warm-up split measured +4.3%
    # on SD3 (3.181 vs 3.050 steps/s, BASELINE.md r3 overlay A/B) — the
    # same split that won on SD1/XL; DoRA resolves merged.
    student_overlay, overlay_warmup = config_util.resolve_student_overlay(
        config.tpu, quantize_base, peft_type, default_overlay=(peft_type == "lora")
    )
    if dual_tree_warmup:
        # the int8 warm-up copy cannot host a merge: warm-up must overlay
        if not student_overlay:
            raise ValueError(
                "tpu.w8a8_warmup with a bf16 base needs tpu.student_overlay "
                "(the int8 warm-up copy rides the apply-time LoRA overlay)"
            )
        if getattr(config.tpu, "overlay_warmup", None) is False:
            raise ValueError(
                "tpu.overlay_warmup: false is incompatible with the dual-tree "
                "w8a8_warmup — the int8 warm-up copy cannot host a merged tree"
            )
        overlay_warmup = True
        if getattr(config.tpu, "mesh_model", 1) > 1:
            # knowable from config alone — fail before the model load and the
            # ~2.2 GiB int8 quantize copy, not after (ADVICE r3)
            raise NotImplementedError(
                "dual-tree w8a8_warmup + tensor parallelism: the int8 "
                "warm-up copy is not TP-sharded — use quantize_base: true "
                "(one int8 tree, TP-shardable) or mesh_model: 1."
            )
    # multi-chip straight from the yaml tpu: block (SURVEY §2.2) — brought up
    # BEFORE the first model load: jax.distributed.initialize must run before
    # anything initializes the XLA backend (loading device_puts weights), and
    # after it jax.devices() is global so the mesh spans the whole slice
    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

    samples_per_step = max(getattr(config.tpu, "samples_per_step", 1), 1)
    mesh = mesh_lib.training_mesh_from_config(config.tpu, samples_per_step)
    multihost = mesh is not None and jax.process_count() > 1

    tokenizers, text_encoders, transformer, scheduler = factory.load_models_sd3(
        config.pretrained_model.name_or_path,
        weight_dtype=weight_dtype,
        quantize_base=quantize_base,
    )
    mm_cfg = transformer.config
    is_tiny = "tiny" in str(config.pretrained_model.name_or_path).lower()

    def encode_fn(prompt: str):
        text, pooled = factory.encode_prompts_sd3(
            text_encoders,
            [prompt],
            joint_attention_dim=mm_cfg.joint_attention_dim,
            t5_seq_len=4 if is_tiny else 256,
        )
        return text[0], pooled[0]

    if peft_type == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        peft_mod = lora_lib

    # reference: target ["Attention"], delimiter "-" (train_lora_sd3.py:104-111)
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

    sched_fn = get_lr_schedule("cosine", 1e-4, 50, 1e-6)
    optimizer = get_optimizer("adamw", sched_fn, weight_decay=1e-6, grad_clip_norm=0.2)
    opt_state = optimizer.init(lora_params)

    bank = esd.build_prompt_bank(prompts, encode_fn)
    # encode_fn's closure keeps the CLIP-L/G towers alive — free them before
    # the (dual-tree) int8 copy claims its HBM (same hygiene as trainer.py)
    del encode_fn, text_encoders
    resolution = prompts[0].resolution
    batch_size = prompts[0].batch_size

    # dual-tree w8a8 warm-up: one-time int8 copy of the frozen MMDiT,
    # consumed only by the warm-up chain (warm_params through the step's
    # jit signature; the bf16 tree keeps teacher/student exact)
    warm_params = None
    warm_apply_fn = None
    if w8a8_warmup:
        if dual_tree_warmup:
            from sliders_conceptmod_tpu.adapters import quant

            warm_params, warm_scales = quant.quantize_params(transformer.params)
            warm_apply_fn = quant.wrap_apply(
                transformer.apply_fn(), warm_scales, weight_dtype, act_quant=True
            )
        else:
            warm_apply_fn = transformer.apply_fn(act_quant=True)

    schedule = scheduler.set_timesteps(config.train.max_denoising_steps)

    # dynamic_resolution: the reference draws a bucketed (h, w) per iteration
    # (train_lora_sd3.py:195-199) — here one compiled step per bucket of the
    # fixed ≤4-shape set, picked per iteration with the host RNG
    from sliders_conceptmod_tpu.train.loop_utils import resolution_bucket_picker

    buckets, pick_bucket = resolution_bucket_picker(
        dynamic_resolution, resolution, config.tpu.seed
    )

    def build_step(h: int, w: int):
        scfg = esd_sd3.SD3ESDConfig(
            samples_per_step=samples_per_step,
            shard_samples=mesh is not None and samples_per_step > 1,
            # tpu.share_warmup: the per-step samples share ONE batch-1 warm-up
            # chain (trajectory snapshots at each sample's t_k) — SD3's
            # 28-step flow warm-up is the largest warm-up share of any family
            # (BASELINE.md), so this is where the lever pays most
            share_warmup=bool(getattr(config.tpu, "share_warmup", False)),
            mesh=mesh,
            max_denoising_steps=config.train.max_denoising_steps,
            train_cfg_scale=config.train.cfg,
            batch_size=batch_size,
            height=h,
            width=w,
            latent_channels=mm_cfg.in_channels,
            remat=not is_tiny,
        )
        return esd_sd3.make_sd3_esd_train_step(
            transformer.apply_fn(), sites, schedule, optimizer, scfg,
            merge_fn=peft_mod.merge_lora_params,
            student_overlay=student_overlay,
            overlay_warmup=overlay_warmup,
            # per-block remat on the student: block-granular fwd+bwd peak HBM
            # (the SD3.5-Large-class fit lever; models/mmdit.py remat_blocks)
            remat_apply=transformer.apply_fn(remat_blocks=True) if scfg.remat else None,
            # W8A8 on the gradient-stopped warm-up only (tpu.w8a8_warmup) —
            # over the int8 base, or the dual-tree int8 copy (warm_params)
            warm_apply=warm_apply_fn,
        )

    step_fns = [build_step(h, w) for h, w in buckets]

    save_path = Path(config.save.path)
    # reference lora.py:274-283: exports cast to save.precision
    save_dtype = config_util.parse_save_precision(config.save.precision)
    from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger

    logger = MetricsLogger(save_path, config.save.name, config.logging.verbose)
    from sliders_conceptmod_tpu.ops.attention import sequence_parallel_from_config

    from sliders_conceptmod_tpu.train import checkpoint as ckpt

    lora_params, opt_state, start_step, key = ckpt.maybe_restore(
        resume_from, lora_params, opt_state, key
    )
    if mesh is not None:
        transformer.params, lora_params, opt_state, bank = mesh_lib.place_training_state(
            mesh, transformer.params, lora_params, opt_state, bank,
            tp=getattr(config.tpu, "mesh_model", 1) > 1,
        )
        if warm_params is not None:
            # dual_tree + mesh_model>1 already rejected at config time above
            warm_params = mesh_lib.replicate_host_tree(warm_params, mesh)

    # tpu.sequence_parallel: the MMDiT joint sequence (4096+154 tokens at
    # 1024px) rings K/V over the mesh data axis when it divides evenly
    with sequence_parallel_from_config(config.tpu):
        for i in range(start_step, config.train.iterations):
            key, k = jax.random.split(key)
            if multihost:
                k = mesh_lib.replicate_host_tree(k, mesh)
            bi = pick_bucket(i) if pick_bucket is not None else 0
            lora_params, opt_state, metrics = step_fns[bi](
                transformer.params, lora_params, opt_state, k, bank, warm_params
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
                peft_mod.save_weights(save_path / f"{config.save.name}_{i}steps.safetensors", sites, lora_params, dtype=save_dtype)
                ckpt.save_resume(save_path, config.save.name, lora_params, opt_state, i + 1, key)
            if on_step_complete is not None:
                on_step_complete(i)

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
