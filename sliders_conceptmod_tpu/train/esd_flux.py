"""ESD slider step for Flux (few-step flow matching, packed latents).

Semantics-parity target: reference ``train_lora_flux.py:86-447`` with
``predict_noise_flux`` / ``diffusion_flux`` (train_util.py:384-447,606-675):

* ``timesteps_to = 0`` ALWAYS (train_lora_flux.py:238-239) — the "warm-up"
  loop is empty; branches predict from *pure packed noise* at the first
  schedule timestep,
* 8 inference steps with dynamic time-shift μ from the packed image
  sequence length (train_util.py:640-657),
* NO CFG batching — each branch is a single un-guided forward with its own
  prompt embeddings; ``guidance=None`` (schnell) (train_util.py:404-409,
  :286-305). Deviation for dev checkpoints (which the reference cannot
  train — guidance_embeds requires a value on every forward): the factory
  bundle injects the diffusers FluxPipeline default ``guidance=3.5``
  (models/factory.TransformerBundle.default_kwargs),
* branch outputs are scheduler-stepped latents from step index 0
  (train_util.py:446; ``_step_index`` save/restore in the reference is
  replaced by the explicit index),
* gradient accumulation to effective batch 8 (train_lora_flux.py:222-226,
  387-399) — realized with optax.MultiSteps; grad clip-value 1.0 (:397),
* AdamW(1e-4, wd 1e-6) + CosineAnnealingLR(T_max=50) hardcoded (:151-152).

TPU restructurings: the three teacher branches batch into ONE 3-row
forward (they share the timestep and latents; no uncond row exists here).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, FlowSchedule
from sliders_conceptmod_tpu.models.flux import pack_latents, prepare_latent_image_ids
from sliders_conceptmod_tpu.train.esd import (
    ROLE_NEGATIVE,
    ROLE_NEUTRAL,
    ROLE_POSITIVE,
    ROLE_TARGET,
    PromptBank,
    sampled_loss_and_grad,
)


@dataclass(frozen=True)
class FluxESDConfig:
    num_inference_steps: int = 8  # reference train_lora_flux.py:240
    batch_size: int = 1
    height: int = 512
    width: int = 512
    latent_channels: int = 16
    vae_scale: int = 8
    remat: bool = True
    # independent ESD samples per optimizer step (vmapped; under a mesh the
    # sample axis shards over the data axis — esd.sampled_loss_and_grad).
    # NOTE the reference reaches effective batch 8 via sequential gradient
    # accumulation (train_lora_flux.py:222-226); samples_per_step=8 computes
    # the SAME averaged gradient in one step, so on a pod the accumulation
    # chain becomes 8-way data parallelism.
    samples_per_step: int = 1
    shard_samples: bool = False
    mesh: object = None


def make_flux_esd_train_step(
    transformer_apply: Callable,  # (params, tokens, t, context, pooled, txt_ids, img_ids)
    sites,
    schedule: FlowSchedule,
    optimizer: optax.GradientTransformation,
    cfg: FluxESDConfig,
    merge_fn=None,
    student_overlay: bool = False,
    remat_apply: Callable | None = None,
):
    """``student_overlay=True`` applies the student's LoRA via the apply-time
    interceptor (adapters.lora.lora_overlay) instead of merging it into the
    base tree — required when the base is int8-quantized (adapters/quant.py:
    merging would need a lossy dequant→merge→requant round trip every step;
    the overlay leaves the int8 base untouched and adds the fp32 adapter
    delta on top, the reference's own forward-hook composition).

    ``remat_apply``: a per-BLOCK-rematted apply (``bundle.apply_fn(
    remat_blocks=True)``) used for the student's grad pass — caps fwd+bwd
    peak HBM at block granularity, which is what fits the full-depth int8
    schnell TRAIN step on one v5e (whole-model jax.checkpoint does not lower
    the fwd+bwd peak — its backward re-materializes every residual)."""
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    if remat_apply is not None:
        student_apply = remat_apply
    else:
        student_apply = jax.checkpoint(transformer_apply) if cfg.remat else transformer_apply
    b = cfg.batch_size
    gh = cfg.height // cfg.vae_scale // 2
    gw = cfg.width // cfg.vae_scale // 2
    img_ids = jnp.asarray(prepare_latent_image_ids(gh, gw))

    def tile(row):
        return jnp.tile(row[None], (b,) + (1,) * row.ndim)

    def predict_step(apply_fn, params, tokens, text, pooled, step_index, n_rows):
        """single un-guided forward + flow step — predict_noise_flux."""
        t = jnp.broadcast_to(schedule.timesteps[step_index] / 1000.0, (n_rows * b,))
        txt_ids = jnp.zeros((text.shape[1], 3))
        v = apply_fn(params, tokens, t, text, pooled, txt_ids, img_ids)
        return FlowMatchScheduler.step(schedule, v, step_index, tokens)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def train_step(base_params, lora_params, opt_state, key, bank: PromptBank):
        def sample_loss(lp, k):
            k_pair, k_noise = jax.random.split(k, 2)
            n_pairs = bank.text.shape[0]
            pair = jax.random.randint(k_pair, (), 0, n_pairs)
            text = bank.text[pair]
            pooled = bank.pooled[pair]
            g_pair = bank.guidance[pair]
            sign = bank.sign[pair]

            latents = jax.random.normal(
                k_noise,
                (b, cfg.latent_channels, cfg.height // cfg.vae_scale, cfg.width // cfg.vae_scale),
                jnp.float32,
            )
            tokens = pack_latents(latents)  # timesteps_to = 0: no warm-up

            # teacher: one 3-row batch (positive / neutral / negative), no CFG
            t_idx = 0
            teacher_rows = jnp.concatenate(
                [tile(text[r]) for r in (ROLE_POSITIVE, ROLE_NEUTRAL, ROLE_NEGATIVE)], axis=0
            )
            teacher_pooled = jnp.concatenate(
                [tile(pooled[r]) for r in (ROLE_POSITIVE, ROLE_NEUTRAL, ROLE_NEGATIVE)], axis=0
            )
            stepped = predict_step(
                transformer_apply,
                base_params,
                jnp.concatenate([tokens] * 3, axis=0),
                teacher_rows,
                teacher_pooled,
                t_idx,
                3,
            )
            pos_lat, neu_lat, neg_lat = jnp.split(stepped, 3, axis=0)
            esd_target = jax.lax.stop_gradient(
                (neu_lat + sign * g_pair * (pos_lat - neg_lat)).astype(jnp.float32)
            )

            if student_overlay:
                with lora_lib.lora_overlay(sites, lp, jnp.ones((b,), jnp.float32)):
                    tgt = predict_step(
                        student_apply,
                        base_params,
                        tokens,
                        tile(text[ROLE_TARGET]),
                        tile(pooled[ROLE_TARGET]),
                        t_idx,
                        1,
                    )
            else:
                sp = merge(base_params, sites, lp, 1.0)
                tgt = predict_step(
                    student_apply, sp, tokens, tile(text[ROLE_TARGET]), tile(pooled[ROLE_TARGET]), t_idx, 1
                )
            diff = tgt.astype(jnp.float32) - esd_target
            return jnp.mean(diff * diff)

        loss, grads = sampled_loss_and_grad(
            sample_loss, lora_params, key, cfg.samples_per_step, cfg.shard_samples, cfg.mesh
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step
