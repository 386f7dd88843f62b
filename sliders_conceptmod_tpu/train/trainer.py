"""Textual-slider trainer — the L4 layer (reference train_lora{,_xl}.py).

Flow parity (reference ``conceptmod/textsliders/train_lora_xl.py:41-394``):
load models → build LoRA/DoRA network → encode+cache the 5 prompts per pair
(then drop the text encoders) → per-iteration ESD step → periodic + final
``.safetensors`` saves with the reference key schema.

Reference quirks handled explicitly (SURVEY §2.4):
* the XL trainer hardcodes AdamW(lr=1e-4, wd=1e-6) + CosineAnnealingLR
  (T_max=50, η_min=1e-6) and grad-clip 0.2, ignoring config.train.*
  (train_lora_xl.py:104-105,349). ``tpu.honor_network_config=False``
  reproduces that; the default honors the config (documented deviation).
* SD1 trainer semantics follow the *working* upstream 4-prompt flow; the
  fork's train_lora.py is broken against its own 5-prompt PromptEmbedsPair
  (SURVEY §2.4) — the 5th prompt defaults to unconditional here, which makes
  the 5-prompt loss collapse to the 4-prompt one.

TPU-native additions (SURVEY §5): deterministic resume (step + PRNG key +
optimizer state via orbax), steps/sec metrics, optional jax profiler trace,
data-parallel samples via tpu.samples_per_step over the mesh data axis.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.config import (
    RootConfig,
    parse_precision,
    parse_save_precision,
    resolve_student_overlay,
)
from sliders_conceptmod_tpu.core.prompts import PromptSettings
from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import esd
from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def _uniform_field(prompts: List[PromptSettings], field: str):
    vals = {getattr(p, field) for p in prompts}
    if len(vals) > 1:
        raise NotImplementedError(
            f"All prompt pairs must share one {field} per run (got {vals}); mixed "
            f"values would force one XLA compile per value — split into runs."
        )
    return vals.pop()


@dataclass
class TrainResult:
    sites: list
    lora_params: dict
    losses: List[float]
    steps_per_sec: float


def train(
    config: RootConfig,
    prompts: List[PromptSettings],
    rank: int = 4,
    peft_type: str = "lora",
    on_step_complete: Optional[Callable[[int], None]] = None,
    save_file: bool = True,
    resume_from: Optional[str] = None,
) -> TrainResult:
    tpu_cfg = config.tpu
    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    # before any compile (incl. weightless jitted init) so the persistent
    # executable cache sees every executable of the run
    apply_tpu_runtime_flags(tpu_cfg)
    # multi-chip straight from the yaml tpu: block (SURVEY §2.2), brought up
    # BEFORE the first model load / device query: the helper joins the
    # jax.distributed world when configured (must precede XLA backend init)
    # and builds the (data, model) mesh; single-device runs get mesh=None —
    # the exact 1-chip graph. Shared with the sd3/flux/cascade CLIs.
    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

    samples_per_step = max(getattr(tpu_cfg, "samples_per_step", 1), 1)
    mesh_model = max(getattr(tpu_cfg, "mesh_model", 1), 1)
    mesh = mesh_lib.training_mesh_from_config(tpu_cfg, samples_per_step)
    # tpu.quantize_base: int8 frozen UNet Dense kernels (adapters/quant.py) —
    # here a PERF knob, not a fit knob: the ESD step is weight-streaming
    # bound (BASELINE.md phase table), and int8 halves the bytes every UNet
    # pass streams. The student runs through the apply-time overlay
    # (ESDConfig.student_overlay — an int8 base cannot host a merge).
    quantize_base = bool(getattr(tpu_cfg, "quantize_base", False))
    if quantize_base and peft_type == "dora":
        raise NotImplementedError(
            "tpu.quantize_base requires full-precision base magnitudes for "
            "DoRA's norm decomposition — use peft_type='lora' or "
            "quantize_base: false."
        )
    # tpu.w8a8_warmup: W8A8 (int8 MXU matmuls) on the gradient-stopped
    # warm-up chain only — teacher/student stay weight-only exact. Without
    # quantize_base this is the DUAL-TREE route: the bf16 base keeps the
    # exact merged-teacher + overlay-student paths and a one-time int8 copy
    # (quantized at setup, +2.7 GiB HBM for SDXL) serves only the warm-up
    # chain — the w8a8 speedup without the int8 rounding on the teacher
    # target or the student grads.
    w8a8_warmup = bool(getattr(tpu_cfg, "w8a8_warmup", False))
    dual_tree_warmup = w8a8_warmup and not quantize_base
    if dual_tree_warmup and peft_type != "lora":
        raise NotImplementedError(
            "tpu.w8a8_warmup without quantize_base (dual-tree) rides the LoRA "
            "overlay on the int8 warm-up copy — DoRA merges; use peft_type='lora'."
        )
    # default_overlay=True for bf16 LoRA: the overlay-student + merged-warm-up
    # split is the measured winner on SD1/XL (BASELINE.md r3 overlay A/B:
    # SDXL +1.4%, SD1.5 +0.4% over the merged path); DoRA resolves merged
    student_overlay, overlay_warmup = resolve_student_overlay(
        tpu_cfg, quantize_base, peft_type, default_overlay=(peft_type == "lora")
    )
    if dual_tree_warmup:
        # the int8 warm-up copy cannot host a merge: warm-up must overlay
        if not student_overlay:
            raise ValueError(
                "tpu.w8a8_warmup with a bf16 base needs tpu.student_overlay "
                "(the int8 warm-up copy rides the apply-time LoRA overlay)"
            )
        if getattr(tpu_cfg, "overlay_warmup", None) is False:
            raise ValueError(
                "tpu.overlay_warmup: false is incompatible with the dual-tree "
                "w8a8_warmup — the int8 warm-up copy cannot host a merged tree"
            )
        overlay_warmup = True
    weight_dtype = parse_precision(config.train.precision)
    # reference lora.py:274-283: the export is cast to save.precision
    save_dtype = parse_save_precision(config.save.precision)
    is_xl = "xl" in str(config.pretrained_model.name_or_path).lower()
    save_path = Path(config.save.path)

    metadata = {
        "prompts": json.dumps([p.model_dump() for p in prompts]),
        "config": config.model_dump_json(),
    }

    # --- models -----------------------------------------------------------
    if is_xl:
        tokenizers, text_encoders, unet, scheduler = factory.load_models_xl(
            config.pretrained_model.name_or_path,
            scheduler_name=config.train.noise_scheduler,
            weight_dtype=weight_dtype,
            quantize_base=quantize_base,
        )

        def encode_fn(prompt: str):
            text, pooled = factory.encode_prompts_xl(text_encoders, [prompt])
            return text[0], pooled[0]

    else:
        tokenizer, te, unet, scheduler = factory.load_models(
            config.pretrained_model.name_or_path,
            scheduler_name=config.train.noise_scheduler,
            v2=config.pretrained_model.v2,
            v_pred=config.pretrained_model.v_pred,
            weight_dtype=weight_dtype,
            quantize_base=quantize_base,
        )

        def encode_fn(prompt: str):
            return factory.encode_prompts(te, [prompt], config.pretrained_model.clip_skip)[0], None

    # --- adapter ----------------------------------------------------------
    if peft_type == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        peft_mod = lora_lib

    alpha = config.network.alpha
    target_replace = ["Attention"]
    if config.network.type == "c3lier":
        target_replace = (
            lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER + lora_lib.UNET_TARGET_REPLACE_MODULE_CONV
        )
    sites = peft_mod.create_sites(
        unet.params,
        rank=rank,
        alpha=alpha,
        target_replace=target_replace,
        train_method=config.network.training_method,
    )
    key = jax.random.PRNGKey(tpu_cfg.seed)
    key, k_init = jax.random.split(key)
    init_extra = {"base_params": unet.params} if peft_type == "dora" else {}
    lora_params = peft_mod.init_lora_params(k_init, sites, **init_extra)

    # --- optimizer --------------------------------------------------------
    iterations = config.train.iterations
    if is_xl and not tpu_cfg.honor_network_config:
        # reference hardcoded values, train_lora_xl.py:104-105,349
        sched = get_lr_schedule("cosine", 1e-4, 50, 1e-6)
        optimizer = get_optimizer("adamw", sched, weight_decay=1e-6, grad_clip_norm=0.2)
    else:
        sched = get_lr_schedule(
            config.train.lr_scheduler, config.train.lr, iterations, config.train.eta_min
        )
        optimizer = get_optimizer(
            config.train.optimizer,
            sched,
            config.train.optimizer_args,
            grad_clip_norm=0.2 if is_xl else None,
        )

    # --- prompt bank (then the encoders are garbage-collectable) ----------
    bank = esd.build_prompt_bank(prompts, encode_fn)
    # encode_fn's closure is what actually keeps the towers alive — deleting
    # only the local names leaves bigG+CLIP-L resident in HBM for the whole
    # run (caught as a RESOURCE_EXHAUSTED on v5e at full SDXL scale)
    del encode_fn
    if is_xl:
        del text_encoders
    else:
        del te

    # dual-tree w8a8 warm-up: one-time int8 copy of the frozen base, consumed
    # only by the warm-up chain (the bf16 tree keeps teacher/student exact).
    # Quantized AFTER the text towers are freed (HBM headroom: bf16 4.78 GiB
    # + int8 2.70 GiB for SDXL still leaves >8 GiB on a 16 GiB v5e at 512px).
    warm_params = None
    warm_apply_fn = None
    if w8a8_warmup:
        if dual_tree_warmup:
            from sliders_conceptmod_tpu.adapters import quant

            warm_params, warm_scales = quant.quantize_params(unet.params)
            warm_apply_fn = quant.wrap_apply(
                unet.apply_fn(), warm_scales, weight_dtype, act_quant=True
            )
        else:
            # int8-everywhere base: the warm-up reads the same (already int8)
            # base tree with act-quant switched on
            warm_apply_fn = unet.apply_fn(act_quant=True)

    resolution = _uniform_field(prompts, "resolution")
    batch_size = _uniform_field(prompts, "batch_size")
    dynamic_crops = _uniform_field(prompts, "dynamic_crops")
    dynamic_resolution = _uniform_field(prompts, "dynamic_resolution")

    schedule = scheduler.set_timesteps(config.train.max_denoising_steps)
    merge_fn = peft_mod.merge_lora_params

    pipelined = bool(getattr(tpu_cfg, "pipeline_warmup", False))
    if pipelined and dynamic_resolution:
        raise ValueError(
            "tpu.pipeline_warmup carries the warm-up state across steps at one "
            "fixed shape — incompatible with dynamic_resolution buckets"
        )

    def build_step(height: int, width: int):
        ecfg = esd.ESDConfig(
            max_denoising_steps=config.train.max_denoising_steps,
            train_cfg_scale=config.train.cfg,
            batch_size=batch_size,
            height=height,
            width=width,
            samples_per_step=samples_per_step,
            shard_samples=mesh is not None and samples_per_step > 1,
            mesh=mesh,
            # measured on v5e (BASELINE.md): no-remat is ~4% faster and fits
            # HBM at <=512px; above that activation memory needs remat
            remat_unet=max(height, width) > 512,
            pipeline_warmup=pipelined,
            fuse_teacher_student=bool(getattr(tpu_cfg, "fuse_teacher_student", False)),
            # per-iteration crop redraw happens in-graph (esd.draw_time_ids) —
            # a host-side draw here would freeze ONE crop into the compiled
            # step for the whole run
            dynamic_crops=bool(dynamic_crops) and is_xl,
            # int8 base: the student LoRA rides the apply-time overlay (a
            # merge cannot land in an int8 tree). On a bf16 base the knob is
            # a perf A/B: the overlay backward skips the dense dL/dW'
            # weight-grad matmuls of the merged path (tpu.student_overlay)
            student_overlay=student_overlay,
            overlay_warmup=overlay_warmup,
            share_warmup=bool(getattr(tpu_cfg, "share_warmup", False)),
        )
        add_tids = jnp.asarray(get_add_time_ids(height, width, False)) if is_xl else None
        return esd.make_esd_train_step(
            unet.apply_fn(),
            sites,
            scheduler,
            schedule,
            optimizer,
            ecfg,
            add_time_ids=add_tids,
            merge_fn=merge_fn,
            # W8A8 on the gradient-stopped warm-up only (tpu.w8a8_warmup) —
            # over the int8 base, or the dual-tree int8 copy (warm_params)
            warm_apply=warm_apply_fn,
        )

    # per-iteration resolution from a fixed pre-compilable bucket set
    # (reference train_lora_xl.py:186-200; XLA-safe design in
    # diffusion/sampling.dynamic_resolution_buckets — shared with the
    # sd3/flux/cascade trainers via loop_utils.resolution_bucket_picker)
    from sliders_conceptmod_tpu.train.loop_utils import resolution_bucket_picker

    buckets, pick_bucket = resolution_bucket_picker(
        dynamic_resolution, resolution, tpu_cfg.seed
    )
    step_fns = [build_step(h, w) for h, w in buckets]
    opt_state = optimizer.init(lora_params)
    from sliders_conceptmod_tpu.train import checkpoint as ckpt

    lora_params, opt_state, start_step, key = ckpt.maybe_restore(
        resume_from, lora_params, opt_state, key
    )

    multihost = False
    if mesh is not None:
        # every host holds identical values (one checkpoint, one seed), so
        # the host→global placement helpers assemble the mesh-wide arrays;
        # single-host this is a plain device_put
        unet.params, lora_params, opt_state, bank = mesh_lib.place_training_state(
            mesh, unet.params, lora_params, opt_state, bank, tp=mesh_model > 1
        )
        if warm_params is not None:
            if mesh_model > 1:
                raise NotImplementedError(
                    "dual-tree w8a8_warmup + tensor parallelism: the int8 "
                    "warm-up copy is not TP-sharded — use quantize_base: true "
                    "(one int8 tree, TP-shardable) or mesh_model: 1."
                )
            warm_params = mesh_lib.replicate_host_tree(warm_params, mesh)
        multihost = jax.process_count() > 1

    if multihost and not pipelined:
        # AOT-compile every bucket's step, then BARRIER all ranks before the
        # first execution: on shared-core hosts the per-rank cold compiles
        # serialize, and rank skew at the first collective can exceed Gloo's
        # fixed ~30 s context-init deadline (VERDICT r4 weak #1 — the red
        # 2-process test). Compilation executes no collectives, so ranks may
        # skew freely here; the coordination-service barrier (gRPC, 10-min
        # budget) re-syncs them, and the loop runs the precompiled
        # executables (an AOT compile does NOT seed the jit call cache).
        k_ex = mesh_lib.replicate_host_tree(jax.random.PRNGKey(0), mesh)
        step_fns = [
            f.lower(unet.params, lora_params, opt_state, k_ex, bank, warm_params).compile()
            for f in step_fns
        ]
        mesh_lib.barrier("sliders_pre_first_step")
    elif multihost:
        # pipeline_warmup keeps lazy jit (the carry protocol has two
        # entry points) — the ranks' first-collective skew is then bounded
        # only by Gloo's ~30 s context-init deadline; say so out loud
        print(
            "[trainer] multihost + tpu.pipeline_warmup: steps compile lazily; "
            "if ranks' compile times skew >30 s the first collective can hit "
            "Gloo's context-init deadline — prefer pipeline_warmup: false "
            "on multihost runs"
        )

    if config.tpu.profile_dir:
        jax.profiler.start_trace(config.tpu.profile_dir)

    # observability: optional wandb (reference train_lora_xl.py:59-60,343-346)
    # + always-on metrics jsonl next to the checkpoints
    wandb_run = None
    if config.logging.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=f"LECO_{config.save.name}", config=metadata)
        except Exception as e:  # wandb not installed / offline
            print(f"wandb disabled: {e}")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(
        save_path,
        config.save.name,
        # wandb wants a value per step; verbose prints per step — both force
        # the per-step host sync the buffered logger otherwise avoids
        verbose=config.logging.verbose,
        flush_every=1 if wandb_run is not None else 64,
    )

    # --- loop -------------------------------------------------------------
    carry = None
    if pipelined:
        # resume note: the carry is re-drawn (not checkpointed) — the first
        # post-resume step's warm-up sample differs from the uninterrupted run
        key, k_carry = jax.random.split(key)
        carry = step_fns[0].init_carry(unet.params, lora_params, k_carry, bank, warm_params)
    for i in range(start_step, iterations):
        key, k_step = jax.random.split(key)
        if multihost:
            # jit inputs must be process-spanning arrays; the key is derived
            # identically on every host from tpu.seed
            k_step = mesh_lib.replicate_host_tree(k_step, mesh)
        bi = pick_bucket(i) if pick_bucket is not None else 0
        if pipelined:
            lora_params, opt_state, metrics, carry = step_fns[0](
                unet.params, lora_params, opt_state, k_step, bank, carry, warm_params
            )
        else:
            lora_params, opt_state, metrics = step_fns[bi](
                unet.params, lora_params, opt_state, k_step, bank, warm_params
            )
        if pick_bucket is not None:
            metrics = dict(metrics, height=buckets[bi][0], width=buckets[bi][1])
        logger.log(i, metrics)
        if wandb_run is not None:
            wandb_run.log({"loss": logger.current_loss(), "iteration": i})
        if (
            save_file
            and jax.process_index() == 0  # multi-host: one writer per run
            and config.save.per_steps
            and i % config.save.per_steps == 0
            and i != 0
            and i != iterations - 1
        ):
            save_path.mkdir(parents=True, exist_ok=True)
            peft_mod.save_weights(
                save_path / f"{config.save.name}_{i}steps.safetensors",
                sites,
                lora_params,
                dtype=save_dtype,
                metadata=metadata,
            )
            ckpt.save_resume(save_path, config.save.name, lora_params, opt_state, i + 1, key)
        if on_step_complete is not None:
            on_step_complete(i)

    jax.block_until_ready(jax.tree.leaves(lora_params)[0])
    sps = logger.close()
    losses = logger.losses

    if config.tpu.profile_dir:
        jax.profiler.stop_trace()
    if wandb_run is not None:
        wandb_run.finish()

    if save_file and jax.process_index() == 0:  # multi-host: one writer per run
        save_path.mkdir(parents=True, exist_ok=True)
        peft_mod.save_weights(
            save_path / f"{config.save.name}_last.safetensors",
            sites,
            lora_params,
            dtype=save_dtype,
            metadata=metadata,
        )

    return TrainResult(sites=sites, lora_params=lora_params, losses=losses, steps_per_sec=sps)
