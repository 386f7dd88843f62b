"""ESD slider step for Stable Cascade (Stage-C prior).

Semantics-parity target: reference ``train_lora_cascade.py:163-305`` with
``diffusion_cascade`` / ``predict_noise_cascade``
(``train_util.py:492-576,844-972``), minus the upstream breakage the build
must not replicate (SURVEY §2.4):

* the reference trains on ``settings`` — a variable LEAKED from the
  prompt-caching loop (always the last YAML pair) — instead of the sampled
  ``prompt_pair``. This build uses the sampled pair (documented fix).
* ``DDPMWuerstchenScheduler`` is referenced but never imported; the shipped
  path runs a beta scheduler (config: euler_a) stepped at integer timesteps
  with the Stage-C *ratio* derived via ``get_t_conditioning``
  (train_util.py:710-718,927-945). Both that path and the proper
  ratio-space ``wuerstchen`` scheduler are supported here.

Faithful quirks kept:

* ``timesteps_to`` is FIXED at ``max_denoising_steps − 1`` (the random draw
  is commented out upstream, train_lora_cascade.py:233-238) — so the
  warm-up trip count is static,
* prediction guidance is hardcoded 4 (``guidance_scale=4  # TODO``,
  :262,276,289,303,... ) independent of the pair's loss guidance,
* the CFG unconditional row is the EMPTY prompt (``negative_prompt=''`` in
  ``encode_prompt_cascade``), not the pair's ``unconditional``,
* branch predictions are RAW guided image-embedding predictions (never
  scheduler-stepped, unlike SD3) — the loss compares predictions directly,
* warm-up runs with the slider ON (multiplier 1), gradient-stopped, on the
  pair's ``unconditional`` prompt,
* ``current_timestep = timesteps₁₀₀₀[int(t_to·1000/T)]`` re-indexing
  (train_lora_cascade.py:269-273).

TPU restructurings (house style, train/esd.py): static-trip warm-up
``fori_loop``, one 4-row batched teacher call, adapter-merge slider,
metrics as device scalars.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import math
import optax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler
from sliders_conceptmod_tpu.diffusion.wuerstchen import (
    WuerstchenScheduler,
    get_t_conditioning,
)
from sliders_conceptmod_tpu.train.esd import (
    ROLE_NEGATIVE,
    ROLE_NEUTRAL,
    ROLE_POSITIVE,
    ROLE_TARGET,
    ROLE_UNCOND,
    PromptBank,
    data_partition_spec,
    sampled_loss_and_grad,
)


@dataclass(frozen=True)
class CascadeESDConfig:
    max_denoising_steps: int = 20
    predict_guidance: float = 4.0  # reference hardcodes 4 (TODO upstream)
    batch_size: int = 1
    height: int = 1024
    width: int = 1024
    latent_channels: int = 16
    resolution_multiple: float = 42.67  # train_util.py:899
    remat: bool = True
    # independent ESD samples per optimizer step (vmapped; under a mesh the
    # sample axis shards over the data axis — esd.sampled_loss_and_grad)
    samples_per_step: int = 1
    shard_samples: bool = False
    # shared-prefix warm-up (tpu.share_warmup): the per-step samples share
    # ONE batch-1 warm-up chain — Cascade runs a FIXED (T−1)-step warm-up
    # every iteration (reference train_lora_cascade.py:238), so the chain is
    # the dominant cost and every sample reads the SAME depth: no snapshot
    # buffer needed, the chain's end state is the one shared context.
    # DEVIATIONS (opt-in A/B only): the chain rides sample 0's draws (its
    # pair's unconditional prompt, initial latent, scheduler noise); the
    # teacher/student tails KEEP per-sample pairs — unlike train/esd.py's
    # shared-pair convention — because with a fixed t_to a shared pair would
    # collapse all samples into bit-identical rows (pair diversity is the
    # only per-sample variation left). samples_per_step > 1 + batch_size == 1
    # only.
    share_warmup: bool = False
    mesh: object = None

    @property
    def latent_hw(self):
        return (
            math.ceil(self.height / self.resolution_multiple),
            math.ceil(self.width / self.resolution_multiple),
        )


def make_cascade_esd_train_step(
    prior_apply: Callable,  # (params, x, r, clip_text, clip_text_pooled, clip_img)
    sites,
    scheduler,  # NoiseScheduler (beta path) or WuerstchenScheduler
    schedule,  # matching T-step schedule
    optimizer: optax.GradientTransformation,
    cfg: CascadeESDConfig,
    empty_text: jnp.ndarray,  # [S, D] embedding of ""
    empty_pooled: jnp.ndarray,  # [1, Dp]
    clip_image_dim: int,
    merge_fn=None,
    student_overlay: bool = False,
    warm_apply: Callable | None = None,
    overlay_warmup: bool = False,
):
    """``student_overlay=True``: run ONLY the student prediction through the
    apply-time LoRA overlay while the (dominant, T−1-step) gradient-stopped
    warm-up keeps the once-per-step merged tree — the same merged-warm-up +
    overlay-student split that is the measured SD1/XL winner
    (tpu.student_overlay/overlay_warmup, BASELINE.md r3 overlay A/B): the
    backward skips the dense dL/dW′ weight-grad matmuls over the 3.6B prior.
    LoRA only (DoRA's norm decomposition needs the merged tree).

    ``warm_apply`` + ``overlay_warmup=True`` (r5, tpu.w8a8_warmup): the
    DUAL-TREE W8A8 warm-up — the bf16 base keeps the exact merged/overlay
    teacher+student paths while the fixed (T−1)-step warm-up chain runs a
    one-time int8 copy (``warm_params`` through the step signature) with
    per-token int8 activations (int8×int8 MXU). Cascade's warm-up is the
    LARGEST warm-up share of any family (19 of ~21 model evals/step) and its
    2048-wide channelwise matmuls are the shape where W8A8 measured +23% on
    SD3 (BASELINE.md). The int8 copy cannot host a merge, so the warm-up
    slider rides the apply-time overlay — DECOUPLED from ``student_overlay``
    here (deviation from train/esd.py's knob hierarchy, documented: the
    cascade student default is merged pending its own A/B). Cascade still
    has no ``quantize_base`` route (teacher/student merge into the bf16
    base; no HBM-fit need at 12×12 effnet latents)."""
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    if student_overlay and merge_fn is not None and merge_fn is not lora_lib.merge_lora_params:
        raise ValueError("student_overlay supports the LoRA overlay only (DoRA merges)")
    if warm_apply is not None and not overlay_warmup:
        raise ValueError(
            "warm_apply (the w8a8 dual-tree warm-up) requires overlay_warmup=True "
            "— an int8 warm-up copy cannot host a merged slider"
        )
    if overlay_warmup and merge_fn is not None and merge_fn is not lora_lib.merge_lora_params:
        raise ValueError("overlay_warmup supports the LoRA overlay only (DoRA merges)")
    warmup_apply = warm_apply if warm_apply is not None else prior_apply
    if cfg.share_warmup and (cfg.samples_per_step == 1 or cfg.batch_size != 1):
        raise ValueError(
            "share_warmup needs the multi-sample path "
            "(samples_per_step > 1, batch_size == 1)"
        )
    overlay_one = jnp.ones((1,), jnp.float32)
    student_apply = jax.checkpoint(prior_apply) if cfg.remat else prior_apply
    b = cfg.batch_size
    g = cfg.predict_guidance
    T = cfg.max_denoising_steps
    t_to = T - 1  # fixed, reference train_lora_cascade.py:238
    lh, lw = cfg.latent_hw
    is_wuerstchen = isinstance(scheduler, WuerstchenScheduler)

    if is_wuerstchen:
        # conditioning ratio IS the schedule ratio; "1000-step" re-index is
        # linspace(1,0,1001)[int(t_to·1000/T)]
        warm_ratios = schedule.timesteps[:T]
        current_ratio = jnp.float32(1.0 - (t_to * 1000 // T) / 1000.0)
        init_sigma = 1.0
    else:
        if schedule.kind == "lms":
            raise NotImplementedError("cascade trainer: lms needs state threading; use euler_a/ddim/ddpm/wuerstchen")
        acp = schedule.alphas_cumprod
        warm_ratios = get_t_conditioning(schedule.timesteps, acp)
        # reference: scheduler.set_timesteps(1000); timesteps[int(t_to·1000/T)]
        # (leading spacing over 1000 train steps ⇒ timesteps[i] = 999 − i)
        current_train_t = 999 - (t_to * 1000 // T)
        current_ratio = get_t_conditioning(jnp.int32(current_train_t), acp)
        current_sigma = ((1.0 - acp[current_train_t]) / acp[current_train_t]) ** 0.5
        init_sigma = schedule.init_noise_sigma

    def tile(row):
        return jnp.tile(row[None], (b,) + (1,) * row.ndim)

    def sched_step(model_output, i, sample, key):
        if is_wuerstchen:
            return scheduler.step(schedule, model_output, i, sample, key)
        prev, _ = scheduler.step(schedule, model_output, i, sample, key=key)
        return prev

    def scale_in(sample, i):
        if is_wuerstchen:
            return sample
        return NoiseScheduler.scale_model_input(schedule, sample, i)

    def predict_guided(apply_fn, params, x_in, ratio, text_c, pooled_c):
        """CFG rows [cond, uncond('')] → u + g·(c − u) (reference
        predict_noise_cascade: torch.lerp(uncond, text, g), :570-575)."""
        doubled = jnp.concatenate([x_in, x_in], axis=0)
        rr = jnp.broadcast_to(ratio, (2 * b,))
        text = jnp.concatenate([text_c, tile(empty_text)], axis=0)
        pooled = jnp.concatenate([pooled_c, tile(empty_pooled)], axis=0)
        img = jnp.zeros((2 * b, 1, clip_image_dim), x_in.dtype)
        pred = apply_fn(params, doubled, rr, text, pooled, img)
        pred_c, pred_u = jnp.split(pred, 2, axis=0)
        return pred_u + g * (pred_c - pred_u)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def train_step(base_params, lora_params, opt_state, key, bank: PromptBank, warm_params=None):
      # None-vs-tree is static per trace — trace-time guard (mirrors
      # train/esd_sd3.py): an int8 dual tree without a dequantizing
      # warm_apply would push int8 leaves through the exact apply
      if warm_params is not None and warm_apply is None:
          raise ValueError(
              "warm_params (dual int8 tree) requires a dequantizing warm_apply "
              "— pass quant.wrap_apply(prior_apply, scales, act_quant=True)"
          )

      def warm_chain(lp, pair, k_noise, k_warm):
        """(T−1)-step slider-ON gradient-stopped warm-up from the pair's
        unconditional prompt (reference quirk), scaled to the branch input —
        shared between the per-sample and shared-chain paths so they cannot
        desync. ``warm_params`` (dual-tree int8 copy) feeds ONLY this chain."""
        text = bank.text[pair]
        pooled = bank.pooled[pair]
        latents0 = (
            jax.random.normal(k_noise, (b, cfg.latent_channels, lh, lw), jnp.float32)
            * init_sigma
        )
        warm_text, warm_pooled = tile(text[ROLE_UNCOND]), tile(pooled[ROLE_UNCOND])
        if overlay_warmup:
            slp = jax.lax.stop_gradient(lp)
            wp = base_params if warm_params is None else warm_params

            def wpred(x_in, ratio, tc, pc):
                with lora_lib.lora_overlay(sites, slp, overlay_one):
                    return predict_guided(warmup_apply, wp, x_in, ratio, tc, pc)

        else:
            student_params = jax.lax.stop_gradient(merge(base_params, sites, lp, 1.0))

            def wpred(x_in, ratio, tc, pc):
                return predict_guided(prior_apply, student_params, x_in, ratio, tc, pc)

        def body(i, lat):
            guided = wpred(scale_in(lat, i), warm_ratios[i], warm_text, warm_pooled)
            return sched_step(guided, i, lat, jax.random.fold_in(k_warm, i))

        denoised = jax.lax.stop_gradient(jax.lax.fori_loop(0, t_to, body, latents0))
        # branch-input scaling at the raw train timestep: σ-space schedulers
        # (euler_a/lms) divide by √(σ²+1) (diffusers scale_model_input);
        # ddim/ddpm scale_model_input is the identity — matching the warm-up
        # loop's scale_in, which routes through NoiseScheduler.scale_model_input
        if is_wuerstchen or schedule.kind not in ("euler_a", "lms"):
            return denoised
        return (denoised / jnp.sqrt(current_sigma**2 + 1)).astype(denoised.dtype)

      def sample_tail(lp, pair, x_in):
        """Teacher target + student loss for ``pair`` from a gradient-stopped
        warm-up context ``x_in`` (already branch-input scaled)."""
        text = bank.text[pair]
        pooled = bank.pooled[pair]
        g_pair = bank.guidance[pair]
        sign = bank.sign[pair]

        # teacher: pos/neu/neg cond rows + one shared '' row, one batched call
        troles = (ROLE_POSITIVE, ROLE_NEUTRAL, ROLE_NEGATIVE)
        teacher_text = jnp.concatenate([tile(text[r]) for r in troles] + [tile(empty_text)], axis=0)
        teacher_pooled = jnp.concatenate([tile(pooled[r]) for r in troles] + [tile(empty_pooled)], axis=0)
        rr = jnp.broadcast_to(current_ratio, (4 * b,))
        img = jnp.zeros((4 * b, 1, clip_image_dim), x_in.dtype)
        preds = prior_apply(
            base_params, jnp.concatenate([x_in] * 4, axis=0), rr, teacher_text, teacher_pooled, img
        )
        p_pos, p_neu, p_neg, p_unc = jnp.split(preds, 4, axis=0)
        guided = lambda p: p_unc + g * (p - p_unc)
        esd_target = jax.lax.stop_gradient(
            (guided(p_neu) + sign * g_pair * (guided(p_pos) - guided(p_neg))).astype(jnp.float32)
        )

        if student_overlay:
            # the (1,)-shaped multiplier broadcasts over the CFG-doubled rows
            def s_apply(p, *a):
                with lora_lib.lora_overlay(sites, lp, overlay_one):
                    return student_apply(p, *a)

            tgt = predict_guided(
                s_apply, base_params, x_in, current_ratio,
                tile(text[ROLE_TARGET]), tile(pooled[ROLE_TARGET]),
            )
        else:
            sp = merge(base_params, sites, lp, 1.0)
            tgt = predict_guided(
                student_apply, sp, x_in, current_ratio, tile(text[ROLE_TARGET]), tile(pooled[ROLE_TARGET])
            )
        diff = tgt.astype(jnp.float32) - esd_target
        return jnp.mean(diff * diff)

      def sample_loss(lp, k):
        k_pair, k_noise, k_warm = jax.random.split(k, 3)
        pair = jax.random.randint(k_pair, (), 0, bank.text.shape[0])
        return sample_tail(lp, pair, warm_chain(lp, pair, k_noise, k_warm))

      if cfg.share_warmup:
        # tpu.share_warmup: ONE batch-1 warm-up chain per step (sample 0's
        # draws — its pair's uncond prompt, latent, noise); the tails keep
        # per-sample PAIRS (t_to is fixed, so pair diversity is the only
        # per-sample variation — see CascadeESDConfig.share_warmup). The
        # per-sample key splits match the vmap path, so with a 1-pair bank
        # the share step reduces EXACTLY to the vmap path's sample-0
        # computation (equivalence-tested, tests/test_cascade.py).
        keys = jax.random.split(key, cfg.samples_per_step)
        pairs = jax.vmap(
            lambda k: jax.random.randint(
                jax.random.split(k, 3)[0], (), 0, bank.text.shape[0]
            )
        )(keys)
        _, k_noise0, k_warm0 = jax.random.split(keys[0], 3)

        def shared_loss(lp):
            x_in = warm_chain(lp, pairs[0], k_noise0, k_warm0)
            losses = jax.vmap(lambda pair: sample_tail(lp, pair, x_in))(pairs)
            if cfg.shard_samples:
                losses = jax.lax.with_sharding_constraint(
                    losses, data_partition_spec(cfg.mesh)
                )
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(shared_loss)(lora_params)
      else:
        loss, grads = sampled_loss_and_grad(
            sample_loss, lora_params, key, cfg.samples_per_step, cfg.shard_samples, cfg.mesh
        )
      updates, opt_state = optimizer.update(grads, opt_state, lora_params)
      lora_params = optax.apply_updates(lora_params, updates)
      return lora_params, opt_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step
