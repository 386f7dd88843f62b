"""CFG noise prediction + partial/full denoising loops, pure-functional.

Semantics-parity targets (reference ``conceptmod/textsliders/train_util.py``):
* ``get_initial_latents`` (:90-105): N(0,1)·init_noise_sigma, [B,4,H/8,W/8],
* ``get_add_time_ids`` (:976-1011): XL micro-conditioning (+dynamic crops),
* ``predict_noise{,_xl}`` (:276-302, :449-489): CFG-batched single UNet call,
* ``diffusion{,_xl}`` (:306-327, :677-708): step loop from step 0 to
  ``total_timesteps`` — here a ``lax.fori_loop`` whose trip count may be a
  *traced* scalar, so one compiled graph serves every sampled
  ``timesteps_to`` (XLA lowers it to a bounded while loop; no per-step
  recompile, no wasted full-length scan),
* guidance-rescale is OFF in training — the reference computes it and drops
  the result (``train_util.py:484-489``, documented bug SURVEY §2.4); we
  expose it as an explicit flag for the inference path only.

TPU-first batching note: teacher branches in the trainers share one
unconditional prediction instead of recomputing it per CFG pair — see
``train/esd.py`` (identical math, 4 batch rows instead of 6).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler, Schedule

UNET_IN_CHANNELS = 4  # reference train_util.py:20
VAE_SCALE_FACTOR = 8  # reference train_util.py:21
UNET_ATTENTION_TIME_EMBED_DIM = 256  # reference train_util.py:23
TEXT_ENCODER_2_PROJECTION_DIM = 1280  # reference train_util.py:24
UNET_PROJECTION_CLASS_EMBEDDING_INPUT_DIM = 2816  # reference train_util.py:25


def get_initial_latents(
    key: jax.Array,
    schedule: Schedule,
    n_imgs: int,
    height: int,
    width: int,
    n_prompts: int = 1,
    channels: int = UNET_IN_CHANNELS,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Reference train_util.py:90-105 (noise · init_noise_sigma, tiled)."""
    noise = jax.random.normal(
        key,
        (n_imgs, channels, height // VAE_SCALE_FACTOR, width // VAE_SCALE_FACTOR),
        dtype=dtype,
    )
    noise = jnp.tile(noise, (n_prompts, 1, 1, 1))
    return noise * schedule.init_noise_sigma


def apply_noise_offset(key: jax.Array, latents: jnp.ndarray, noise_offset: float) -> jnp.ndarray:
    """Offset noise (crosslabs blog) — reference train_util.py:42-47. Present
    in the reference's library but unused by its trainers; kept for parity."""
    offs = jax.random.normal(key, (latents.shape[0], latents.shape[1], 1, 1), latents.dtype)
    return latents + noise_offset * offs


def get_add_time_ids(
    height: int,
    width: int,
    dynamic_crops: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """XL micro-conditioning ids [1, 6] — reference train_util.py:976-1011.

    Host-side (resolutions are host-side per iteration); returns numpy.
    """
    if dynamic_crops:
        rng = rng or np.random.default_rng()
        random_scale = rng.random() * 2 + 1
        original_size = (int(height * random_scale), int(width * random_scale))
        # max(1, ·): scale can land exactly at 1+ε so original == target and
        # integers(0, 0) raises — the reference's torch.randint(0, 0) shares
        # this latent crash (~1/res odds per call); guard instead of porting it
        crops_coords_top_left = (
            int(rng.integers(0, max(1, original_size[0] - height))),
            int(rng.integers(0, max(1, original_size[1] - width))),
        )
        target_size = (height, width)
    else:
        original_size = (height, width)
        crops_coords_top_left = (0, 0)
        target_size = (height, width)

    add_time_ids = list(original_size + crops_coords_top_left + target_size)
    passed = UNET_ATTENTION_TIME_EMBED_DIM * len(add_time_ids) + TEXT_ENCODER_2_PROJECTION_DIM
    if passed != UNET_PROJECTION_CLASS_EMBEDDING_INPUT_DIM:
        raise ValueError(
            f"Model expects an added time embedding vector of length "
            f"{UNET_PROJECTION_CLASS_EMBEDDING_INPUT_DIM}, but a vector of {passed} was created."
        )
    return np.array([add_time_ids], dtype=np.float32)


# ---------------------------------------------------------------------------
# CFG prediction
# ---------------------------------------------------------------------------

# unet_apply(params, sample, timestep, encoder_hidden_states, added_cond_kwargs=None)
UNetApply = Callable[..., jnp.ndarray]


def _cfg_call(
    unet_apply: UNetApply,
    unet_params,
    scaled_input: jnp.ndarray,  # [2B, C, H, W] (uncond rows first)
    timestep,
    text_embeddings: jnp.ndarray,  # [2B, S, D]
    guidance_scale,
    added_cond_kwargs: Optional[dict],
) -> jnp.ndarray:
    noise_pred = unet_apply(
        unet_params, scaled_input, timestep, text_embeddings, added_cond_kwargs=added_cond_kwargs
    )
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    return uncond + guidance_scale * (cond - uncond)


def predict_noise(
    unet_apply: UNetApply,
    unet_params,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    latents: jnp.ndarray,  # [B, C, H, W]
    text_embeddings: jnp.ndarray,  # [2B, S, D] uncond ++ cond, or [B] cond-only
    *,
    step_index=None,  # schedule-index timestep (sampler loops)
    train_t=None,  # raw train timestep (teacher/student branches)
    guidance_scale=7.5,
    added_cond_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """One CFG-guided ε-prediction — reference predict_noise{,_xl}
    (train_util.py:276-302,449-489). Exactly one of step_index/train_t.

    When ``text_embeddings`` has the same batch as ``latents`` the call is
    cond-only (the g==1 fast path: u + 1·(c−u) ≡ c) — no doubling, no
    combine; identical math, half the UNet rows.
    """
    if (step_index is None) == (train_t is None):
        raise ValueError("predict_noise: pass exactly one of step_index / train_t")
    use_cfg = text_embeddings.shape[0] != latents.shape[0]
    model_in = jnp.concatenate([latents] * 2, axis=0) if use_cfg else latents
    if step_index is not None:
        scaled = scheduler.scale_model_input(schedule, model_in, step_index)
        timestep = schedule.timesteps[step_index]
    else:
        if use_cfg and jnp.ndim(train_t) >= 1:
            # per-row timesteps double with the CFG rows
            train_t = jnp.tile(train_t, 2)
        scaled = scheduler.scale_model_input_train_t(schedule, model_in, train_t)
        timestep = train_t
    if not use_cfg:
        return unet_apply(
            unet_params, scaled, timestep, text_embeddings, added_cond_kwargs=added_cond_kwargs
        )
    return _cfg_call(
        unet_apply, unet_params, scaled, timestep, text_embeddings, guidance_scale, added_cond_kwargs
    )


def denoise_partial(
    unet_apply: UNetApply,
    unet_params,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    latents: jnp.ndarray,
    text_embeddings: jnp.ndarray,  # [2B, S, D]
    key: jax.Array,
    *,
    total_steps,  # may be traced — fori_loop trip count
    start_step=0,
    guidance_scale=1.0,
    added_cond_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Denoise steps [start_step, total_steps) — reference diffusion{,_xl}
    (train_util.py:306-327,677-708). Stochastic schedulers consume one
    fresh PRNG subkey per step."""
    state = scheduler.init_step_state(latents.shape)

    def body(i, carry):
        lat, st, k = carry
        k, sub = jax.random.split(k)
        eps = predict_noise(
            unet_apply,
            unet_params,
            scheduler,
            schedule,
            lat,
            text_embeddings,
            step_index=i,
            guidance_scale=guidance_scale,
            added_cond_kwargs=added_cond_kwargs,
        )
        lat, st = scheduler.step(schedule, eps, i, lat, st, key=sub)
        return (lat, st, k)

    latents, _, _ = jax.lax.fori_loop(start_step, total_steps, body, (latents, state, key))
    return latents


def denoise_partial_per_row(
    unet_apply: UNetApply,
    unet_params,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    latents: jnp.ndarray,  # [B, C, H, W] — independent samples as ROWS
    text_embeddings: jnp.ndarray,  # [B or 2B, S, D]
    key: jax.Array,
    *,
    total_steps,  # [B] int vector — per-row trip counts
    guidance_scale=1.0,
    added_cond_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Like :func:`denoise_partial` but each row denoises its OWN number of
    steps inside ONE shared loop to ``max(total_steps)``, with finished rows
    masked out.

    This is the fused-sample warm-up: independent per-step samples
    (``ESDConfig.samples_per_step``) batch onto the row axis. Wasted-FLOP
    bound: E[max of k trips]/E[single trip] ≈ 1.6 at k=4. Measured on v5e the
    fused step is +5% over vmapping the divergent loops (the chip is already
    compute-bound at batch 1 — BASELINE.md phase table); the structural win
    is ONE row axis for the mesh to shard and no per-sample loop machinery.
    """
    state = scheduler.init_step_state(latents.shape)
    row_mask_shape = (latents.shape[0],) + (1,) * (latents.ndim - 1)

    def mask_state(active, new_st, old_st):
        def pick(a, b):
            if a.ndim == latents.ndim + 1:  # leading history axis (LMS)
                return jnp.where(active[None], a, b)
            return jnp.where(active, a, b)

        return jax.tree.map(pick, new_st, old_st)

    def body(i, carry):
        lat, st, k = carry
        k, sub = jax.random.split(k)
        eps = predict_noise(
            unet_apply,
            unet_params,
            scheduler,
            schedule,
            lat,
            text_embeddings,
            step_index=i,
            guidance_scale=guidance_scale,
            added_cond_kwargs=added_cond_kwargs,
        )
        new_lat, new_st = scheduler.step(schedule, eps, i, lat, st, key=sub)
        active = (i < total_steps).reshape(row_mask_shape)
        return (jnp.where(active, new_lat, lat), mask_state(active, new_st, st), k)

    latents, _, _ = jax.lax.fori_loop(
        0, jnp.max(total_steps), body, (latents, state, key)
    )
    return latents


def denoise_shared_snapshots(
    unet_apply: UNetApply,
    unet_params,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    latents: jnp.ndarray,  # [1, C, H, W] — ONE shared chain
    text_embeddings: jnp.ndarray,  # [1 or 2, S, D]
    key: jax.Array,
    *,
    total_steps,  # [B] int vector — per-row snapshot depths (all >= 1)
    guidance_scale=1.0,
    added_cond_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Shared-prefix warm-up (tpu.share_warmup): run ONE batch-1 chain to
    ``max(total_steps)`` and return ``[B, ...]`` rows where row b is the
    chain state after ``total_steps[b]`` steps — snapshots of one shared
    trajectory instead of B independent chains.

    Cuts the per-iteration warm-up UNet row count from B (CFG: 2B) to 1
    (CFG: 2) regardless of samples_per_step. DEVIATION from the reference's
    independent per-sample warm-ups (train_lora_xl.py:209-231): the samples'
    warm-up noise is perfectly correlated (same initial latent, same
    stochastic-scheduler draws — each sample's context latent is an earlier/
    later state of the SAME trajectory). Opt-in only, for the A/B against
    the latency-bound warm-up chain (BASELINE.md)."""
    state = scheduler.init_step_state(latents.shape)
    B = total_steps.shape[0]
    hit_shape = (B,) + (1,) * (latents.ndim - 1)
    snaps = jnp.zeros((B,) + latents.shape[1:], latents.dtype)

    def body(i, carry):
        lat, st, k, snaps = carry
        k, sub = jax.random.split(k)
        eps = predict_noise(
            unet_apply,
            unet_params,
            scheduler,
            schedule,
            lat,
            text_embeddings,
            step_index=i,
            guidance_scale=guidance_scale,
            added_cond_kwargs=added_cond_kwargs,
        )
        lat, st = scheduler.step(schedule, eps, i, lat, st, key=sub)
        # rows with total_steps == i+1 snapshot the post-step state; the
        # [1, ...] chain broadcasts over the B-row snapshot buffer
        hit = (total_steps == i + 1).reshape(hit_shape)
        snaps = jnp.where(hit, lat, snaps)
        return (lat, st, k, snaps)

    _, _, _, snaps = jax.lax.fori_loop(
        0, jnp.max(total_steps), body, (latents, state, key, snaps)
    )
    return snaps


def rescale_noise_cfg(noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray, guidance_rescale: float = 0.0):
    """CFG-rescale (arXiv 2305.08891 §3.4) — reference train_util.py:330-348.
    Inference-path option only; training keeps it off (SURVEY §2.4)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


def concat_embeddings(uncond: jnp.ndarray, cond: jnp.ndarray, n_imgs: int) -> jnp.ndarray:
    """[uncond; cond] row-repeated n_imgs — reference train_util.py:267-273."""
    return jnp.repeat(jnp.concatenate([uncond, cond], axis=0), n_imgs, axis=0)


def current_train_timestep(timesteps_to, max_denoising_steps: int, num_train_timesteps: int = 1000):
    """The raw train timestep for the teacher/student branches: the reference
    re-sets the scheduler to 1000 steps (timesteps [999..0]) and indexes
    ``int(timesteps_to · 1000 / max_steps)`` (train_lora_xl.py:233-238)."""
    idx = (timesteps_to * num_train_timesteps) // max_denoising_steps
    return num_train_timesteps - 1 - idx


def get_random_resolution_in_bucket(rng: np.random.Generator, bucket_resolution: int = 512) -> Tuple[int, int]:
    """Reference train_util.py:1085-1097. Host-side; NOTE: each distinct
    resolution is a separate XLA compile — prefer a small fixed bucket set
    (:func:`dynamic_resolution_buckets`)."""
    step = 64
    min_step = bucket_resolution // 2 // step
    max_step = bucket_resolution // step
    height = int(rng.integers(min_step, max_step)) * step
    width = int(rng.integers(min_step, max_step)) * step
    return height, width


def dynamic_resolution_buckets(bucket_resolution: int = 512, step: int = 64) -> List[Tuple[int, int]]:
    """XLA-safe dynamic resolution (SURVEY §7.4 design).

    The reference draws h,w uniformly from [r/2, r) in 64px steps per
    iteration (train_util.py:1085-1097; consulted at train_lora_xl.py:186-200)
    — up to 16 distinct shapes, each a fresh XLA executable. Quantize that
    range to a fixed ≤4-shape set covering both the scale extremes and the
    two aspect orientations; the trainer keeps one compiled step per bucket
    and picks per iteration with the host RNG (documented deviation: same
    range, coarser grid).
    """
    r = bucket_resolution
    lo = max(step, (r // 2 // step) * step)
    hi = max(lo, ((r - step) // step) * step)
    mid = max(lo, ((lo + hi) // 2 // step) * step)
    buckets = [(lo, lo), (hi, mid), (mid, hi), (hi, hi)]
    seen, out = set(), []
    for b in buckets:  # small r collapses shapes — dedup, order-preserving
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out
