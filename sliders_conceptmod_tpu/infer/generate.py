"""Slider inference: full denoising with per-step slider gating.

Semantics-parity target: the reference's patched SDXL ``__call__``
(``conceptmod/textsliders/generate_images_xl.py:38-393``): per timestep the
slider multiplier is 0 while ``t > start_noise`` (structure preservation)
and flips to the requested scale afterwards (:324-328); the UNet runs inside
``with network:`` (:336-344); CFG combine with optional guidance-rescale
(:347-353); scheduler step; final VAE decode with fp32 upcast (:364-385).

TPU-first design: the timesteps are a static descending table, so the
0→scale flip happens exactly once per trajectory. Instead of re-merging (or
mutating) adapters inside the loop, the sampler runs TWO ``lax.fori_loop``
segments under one jit — steps with ``t > start_noise`` on the base params,
the rest on params merged once at the requested scale. No per-step Python,
no duplicate param trees beyond the single merged copy.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.diffusion.sampling import rescale_noise_cfg
from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler, Schedule


def flip_step_for_start_noise(schedule: Schedule, start_noise: float) -> int:
    """First step index whose train timestep is <= start_noise (host-side;
    timesteps descend)."""
    ts = np.asarray(schedule.timesteps)
    idx = np.argmax(ts <= start_noise)
    if ts[0] <= start_noise:  # slider active from the very start
        return 0
    if not np.any(ts <= start_noise):
        return len(ts)
    return int(idx)


def sample_loop(
    unet_apply: Callable,
    params_structure,  # base params (slider scale 0 phase)
    params_slider,  # merged params (slider scale s phase)
    flip_step: int,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    latents: jnp.ndarray,
    text_embeddings: jnp.ndarray,  # [2B, S, D] uncond ++ cond
    key: jax.Array,
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.0,
    added_cond_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Full denoise with the one-time slider flip at ``flip_step``.

    CFG follows diffusers semantics: ``guidance_scale <= 1`` disables
    classifier-free guidance and runs the CONDITIONAL rows only (turbo
    models are distilled without CFG — ``u + 0·(c−u) = u`` would wrongly
    return the unconditional prediction, and g==1 reduces to the
    conditional anyway). ``text_embeddings`` stays [2B] uncond++cond either
    way; the fast path slices the cond half statically (half the UNet rows).
    """
    n = schedule.num_inference_steps
    state = scheduler.init_step_state(latents.shape)
    try:
        use_cfg = float(guidance_scale) > 1.0
    except jax.errors.ConcretizationTypeError:
        # traced guidance (e.g. serve.py jits it as an argument): keep the
        # dynamic CFG path — u + g·(c−u) is correct for any g > 1 and for
        # g == 1; traced turbo-style g < 1 callers must pass a Python float
        use_cfg = True
    B = latents.shape[0]
    if not use_cfg:
        cond_emb = text_embeddings[B:]
        cond_added = (
            {k_: v[v.shape[0] // 2:] for k_, v in added_cond_kwargs.items()}
            if added_cond_kwargs is not None
            else None
        )

    def make_body(params):
        def body(i, carry):
            lat, st, k = carry
            k, sub = jax.random.split(k)
            if not use_cfg:
                scaled = scheduler.scale_model_input(schedule, lat, i)
                guided = unet_apply(
                    params, scaled, schedule.timesteps[i], cond_emb, added_cond_kwargs=cond_added
                )
            else:
                doubled = jnp.concatenate([lat] * 2, axis=0)
                scaled = scheduler.scale_model_input(schedule, doubled, i)
                eps = unet_apply(
                    params,
                    scaled,
                    schedule.timesteps[i],
                    text_embeddings,
                    added_cond_kwargs=added_cond_kwargs,
                )
                uncond, cond = jnp.split(eps, 2, axis=0)
                guided = uncond + guidance_scale * (cond - uncond)
                if guidance_rescale > 0:
                    guided = rescale_noise_cfg(guided, cond, guidance_rescale)
            lat, st = scheduler.step(schedule, guided, i, lat, st, key=sub)
            return (lat, st, k)

        return body

    carry = (latents, state, key)
    if flip_step > 0:
        carry = jax.lax.fori_loop(0, flip_step, make_body(params_structure), carry)
    if flip_step < n:
        carry = jax.lax.fori_loop(flip_step, n, make_body(params_slider), carry)
    return carry[0]


def sample_loop_scales(
    unet_apply: Callable,
    params,
    sites,
    lora_params,
    scales: jnp.ndarray,  # [S] slider scales, one trajectory row-group each
    flip_step: int,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    latents: jnp.ndarray,  # [S*N, ...] scale-major (same seed tiled per scale)
    text_embeddings: jnp.ndarray,  # [2*S*N] uncond ++ cond
    key: jax.Array,
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.0,
    added_cond_kwargs: Optional[dict] = None,
    adapter_idx=None,
) -> jnp.ndarray:
    """Every slider scale of a sweep in ONE batched trajectory.

    The eval sweep protocol (reference generate_images_xl.py:494-507) runs
    the scale grid sequentially — but a v5e is latency-bound at batch 1
    (BASELINE.md phase table: batch-4 UNet fwd ≈ batch-1 cost), so S
    sequential 50-step chains waste ~S× wall-clock. This sampler batches all
    S scales into one chain using the apply-time LoRA overlay
    (adapters/lora.lora_overlay) with a per-row multiplier: rows carry their
    own slider scale against a SINGLE weight stream, and the pre-flip
    structure-preservation phase (multiplier 0 while t > start_noise,
    reference :324-328) becomes a traced gate instead of a params swap.

    Numerics: overlay ≡ merge (tests/test_lora_overlay.py) up to bf16
    rounding — the overlay adds the rank-r path in fp32 while merging folds
    it into the bf16 kernel.

    ``key`` may be a single PRNG key (legacy: stochastic schedulers draw the
    whole batch from one stream) or a stacked [B]-batch of keys — then every
    row's trajectory NOISE STREAM comes from its OWN key via fold_in(step),
    so a row's stochastic inputs are independent of which other rows share
    the batch (the micro-batched-serving seed-reproducibility contract,
    serve.py). Scope: the contract is about the noise; numerical outputs
    still carry executable-level float jitter across batch shapes (and the
    stacked-adapter path below computes the rank-r delta through a gathered
    einsum, padded to the combo's max rank) — solo vs batched rows agree to
    a few bf16/uint8 LSB, not bitwise (tests/test_sample_scales.py,
    tests/test_stacked_adapters.py bound it).

    ``adapter_idx`` ([B] ints) switches the overlay to the stacked-adapter
    path: ``lora_params`` carries a stacked leading adapter axis
    (adapters/lora.stack_adapters) and each row runs under its OWN adapter —
    rows serving different sliders share this one trajectory (serve.py
    cross-slider batching).
    """
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.diffusion.schedulers import is_batched_key

    n = schedule.num_inference_steps
    state = scheduler.init_step_state(latents.shape)
    scales = jnp.asarray(scales, jnp.float32)
    B = latents.shape[0]
    reps = B // scales.shape[0]
    row_scales = jnp.repeat(scales, reps)  # [S*N]
    per_row_keys = is_batched_key(key)
    try:
        use_cfg = float(guidance_scale) > 1.0
    except jax.errors.ConcretizationTypeError:
        use_cfg = True
    if not use_cfg:
        cond_emb = text_embeddings[B:]
        cond_added = (
            {k_: v[v.shape[0] // 2:] for k_, v in added_cond_kwargs.items()}
            if added_cond_kwargs is not None
            else None
        )

    if adapter_idx is not None:
        adapter_idx = jnp.asarray(adapter_idx)

    def body(i, carry):
        lat, st, k = carry
        if per_row_keys:
            sub = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(k)
        else:
            k, sub = jax.random.split(k)
        gate = jnp.where(i < flip_step, 0.0, 1.0)  # slider off while t > start_noise
        if not use_cfg:
            scaled = scheduler.scale_model_input(schedule, lat, i)
            with lora_lib.lora_overlay(
                sites, lora_params, gate * row_scales, adapter_idx=adapter_idx
            ):
                guided = unet_apply(
                    params, scaled, schedule.timesteps[i], cond_emb, added_cond_kwargs=cond_added
                )
        else:
            doubled = jnp.concatenate([lat] * 2, axis=0)
            scaled = scheduler.scale_model_input(schedule, doubled, i)
            with lora_lib.lora_overlay(
                sites, lora_params, gate * jnp.concatenate([row_scales] * 2),
                adapter_idx=None if adapter_idx is None
                else jnp.concatenate([adapter_idx] * 2),
            ):
                eps = unet_apply(
                    params,
                    scaled,
                    schedule.timesteps[i],
                    text_embeddings,
                    added_cond_kwargs=added_cond_kwargs,
                )
            uncond, cond = jnp.split(eps, 2, axis=0)
            guided = uncond + guidance_scale * (cond - uncond)
            if guidance_rescale > 0:
                guided = rescale_noise_cfg(guided, cond, guidance_rescale)
        lat, st = scheduler.step(schedule, guided, i, lat, st, key=sub)
        return (lat, st, k)

    carry = jax.lax.fori_loop(0, n, body, (latents, state, key))
    return carry[0]


def latents_to_images(vae_decode: Callable, latents: jnp.ndarray, scaling_factor: float) -> np.ndarray:
    """latents → uint8 HWC images (VAE decode in fp32, [-1,1] → [0,255])."""
    imgs = vae_decode((latents / scaling_factor).astype(jnp.float32))
    imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
    imgs = jnp.transpose(imgs, (0, 2, 3, 1))
    return np.asarray(jnp.round(imgs * 255).astype(jnp.uint8))
