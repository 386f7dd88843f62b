"""Visual (image-pair) slider training — reference ``trainscripts/imagesliders``.

Semantics-parity target (``train_lora-scale.py:173-343`` + ``get_noisy_image``
``train_util.py:200-235``): per iteration pick a scale s from the configured
set and a paired image (same filename) from the −s and +s folders; VAE-encode
both (posterior *sample*), add the same-seed noise at the schedule timestep
``timesteps_to``; then two slider passes — multiplier +s predicting the
*high* image's noise under the ``positive`` prompt, multiplier −s predicting
the *low* image's noise under the ``neutral`` prompt — gradients accumulated
into one optimizer step (train_lora-scale.py:284-335).

Reference quirks handled:
* the ``high_latents``/``low_latents`` teacher predictions are computed and
  never used in the loss (train_lora-scale.py:254-278 vs :300-329) — dead
  compute; this build skips them (2 UNet forwards saved per step),
* ``timesteps_to ∈ [1, max_denoising_steps−1)`` (:186-188, narrower than the
  textual trainer),
* the two backward passes without ``zero_grad`` between them ≡ summing the
  two losses and differentiating once — that is what this step does.

TPU-first: all images are VAE-encoded ONCE into an on-device bank of
posterior (mean, logvar); per-step sampling, noising, both student passes
and the update are a single jitted function (SURVEY §3.2 "TPU shape").
Disk/PIL I/O happens only at bank construction.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.diffusion.sampling import current_train_timestep
from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler, Schedule

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".webp")


@jax.tree_util.register_dataclass
@dataclass
class ImageBank:
    """VAE posterior moments for every (folder, image): [F, N, 4, h, w].

    folder order matches the ``folders`` CLI argument; ``pair_table`` maps
    each unique |scale| to its (low_folder, high_folder) indices.
    """

    mean: jnp.ndarray
    logvar: jnp.ndarray
    pair_table: jnp.ndarray  # int32 [U, 2]: (low_idx, high_idx)
    pair_scales: jnp.ndarray  # fp32 [U]: the positive scale values


def list_paired_images(folder_main: str, folders: Sequence[str]) -> List[str]:
    """Filenames present in the first folder (reference samples by index of
    the first folder's listing and opens the same name in the second,
    train_lora-scale.py:216-220)."""
    first = os.path.join(folder_main, folders[0])
    ims = [f for f in sorted(os.listdir(first)) if f.lower().endswith(IMAGE_EXTENSIONS)]
    if not ims:
        raise FileNotFoundError(f"No images in {first}")
    return ims


def load_image_array(path: str, resolution: int) -> np.ndarray:
    """PIL → [-1, 1] NCHW float32 (diffusers VaeImageProcessor semantics)."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((resolution, resolution))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = arr * 2.0 - 1.0
    return arr.transpose(2, 0, 1)[None]


def build_image_bank(
    folder_main: str,
    folders: Sequence[str],
    scales: Sequence[float],
    vae_encode: Callable,
    resolution: int,
) -> ImageBank:
    """Encode every image once; build the |scale| → (−s, +s) folder table."""
    scales_arr = np.asarray(scales, dtype=np.float32)
    names = list_paired_images(folder_main, folders)

    # native threaded decode when available (io/native.py); PIL fallback
    def load_folder(folder):
        paths = [os.path.join(folder_main, folder, n) for n in names]
        try:
            from sliders_conceptmod_tpu.io.native import load_images_native

            batch = load_images_native(paths, resolution)
        except Exception:
            batch = None
        if batch is None:
            batch = np.concatenate([load_image_array(p, resolution) for p in paths])
        return batch

    means, logvars = [], []
    for folder in folders:
        batch = load_folder(folder)
        mean, logvar = vae_encode(jnp.asarray(batch))
        means.append(mean)
        logvars.append(logvar)

    uniq = sorted({abs(float(s)) for s in scales_arr if s != 0})
    table, pair_scales = [], []
    for s in uniq:
        low = int(np.nonzero(scales_arr == -s)[0][0])
        high = int(np.nonzero(scales_arr == s)[0][0])
        table.append((low, high))
        pair_scales.append(s)

    return ImageBank(
        mean=jnp.stack(means),
        logvar=jnp.stack(logvars),
        pair_table=jnp.asarray(table, jnp.int32),
        pair_scales=jnp.asarray(pair_scales, jnp.float32),
    )


@dataclass(frozen=True)
class ImageSliderConfig:
    max_denoising_steps: int = 50
    scaling_factor: float = 0.18215
    num_train_timesteps: int = 1000
    remat_unet: bool = False


def make_image_slider_step(
    unet_apply: Callable,
    sites,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    optimizer,
    cfg: ImageSliderConfig,
    positive_emb: jnp.ndarray,  # [S, D] (usually the "" embedding)
    neutral_emb: jnp.ndarray,
    uncond_emb: jnp.ndarray,
    merge_fn=None,
    pooled: Optional[dict] = None,  # XL: {"positive","neutral","uncond"} [Dp]
    add_time_ids: Optional[jnp.ndarray] = None,  # XL [1, 6]
    student_overlay: bool = False,
):
    """SD1 path when ``pooled`` is None; XL variant (reference
    train_lora-scale-xl.py, 512px + text_time conditioning) otherwise.

    ``student_overlay=True`` (tpu.student_overlay): FUSE the reference's two
    ±scale student passes — separate ``merge(+s)``/``merge(−s)`` trees, two
    fwd+bwd weight streams (train_lora-scale.py:254-329) — into ONE 2-row
    UNet call with per-row slider multipliers ``[+s, −s]`` via the
    apply-time LoRA overlay. Identical math up to matmul re-association
    (the overlay computes W·x + mult·(α/r)·up(down(x)) per row — the
    reference's own forward-hook formula); halves the weight bytes streamed
    per iteration AND skips the dense dL/dW′ weight-grad matmuls of the
    merged path. LoRA only (image sliders have no DoRA variant upstream)."""
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    if student_overlay and merge_fn is not None and merge_fn is not lora_lib.merge_lora_params:
        raise ValueError("student_overlay supports the LoRA overlay only")
    student_apply = jax.checkpoint(unet_apply) if cfg.remat_unet else unet_apply
    is_xl = pooled is not None

    # the reference runs the CFG pair at guidance 1 (train_lora-scale.py:254-278)
    # — u + 1·(c−u) ≡ c, so only the conditional row is evaluated here
    def cfg_rows(cond):
        return cond[None]

    def xl_kwargs(pool_cond):
        if not is_xl:
            return None
        return {
            "text_embeds": pool_cond[None],
            "time_ids": add_time_ids,
        }

    @jax.jit
    def step(base_params, lora_params, opt_state, key, bank: ImageBank):
        ks = jax.random.split(key, 6)
        n_pairs = bank.pair_table.shape[0]
        n_imgs = bank.mean.shape[1]
        u = jax.random.randint(ks[0], (), 0, n_pairs)
        img_idx = jax.random.randint(ks[1], (), 0, n_imgs)
        # reference: randint(1, max−1) (train_lora-scale.py:186-188)
        timesteps_to = jax.random.randint(ks[2], (), 1, cfg.max_denoising_steps - 1)
        scale = bank.pair_scales[u]
        low_f, high_f = bank.pair_table[u, 0], bank.pair_table[u, 1]

        def sample_latents(folder_idx, k):
            mean = bank.mean[folder_idx, img_idx]
            logvar = bank.logvar[folder_idx, img_idx]
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(k, mean.shape, mean.dtype)
            return (cfg.scaling_factor * z)[None]

        # same-seed posterior draw AND same noise for both images
        # (reference re-seeds the generator between the two get_noisy_image
        # calls, train_lora-scale.py:222-246)
        z_low = sample_latents(low_f, ks[3])
        z_high = sample_latents(high_f, ks[3])
        noise = jax.random.normal(ks[4], z_low.shape, z_low.dtype)
        t_noise = schedule.timesteps[timesteps_to]
        noisy_low = scheduler.add_noise(schedule, z_low, noise, t_noise)
        noisy_high = scheduler.add_noise(schedule, z_high, noise, t_noise)

        current_t = current_train_timestep(
            timesteps_to, cfg.max_denoising_steps, cfg.num_train_timesteps
        )

        def predict(params, latents, rows, added):
            scaled = scheduler.scale_model_input_train_t(schedule, latents, current_t)
            if added is None:
                return student_apply(params, scaled, current_t, rows)
            return student_apply(params, scaled, current_t, rows, added_cond_kwargs=added)

        def fused_loss_fn(lp):
            # one 2-row call, per-row multipliers [+s, −s] — rows are
            # (high image, positive prompt) and (low image, neutral prompt)
            latents = jnp.concatenate([noisy_high, noisy_low], axis=0)
            rows = jnp.concatenate([cfg_rows(positive_emb), cfg_rows(neutral_emb)], axis=0)
            added = None
            if is_xl:
                added = {
                    "text_embeds": jnp.stack([pooled["positive"], pooled["neutral"]]),
                    "time_ids": jnp.tile(add_time_ids, (2, 1)),
                }
            with lora_lib.lora_overlay(sites, lp, jnp.stack([scale, -scale])):
                eps = predict(base_params, latents, rows, added)
            eps_high, eps_low = jnp.split(eps, 2, axis=0)
            l_high = jnp.mean((eps_high.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
            l_low = jnp.mean((eps_low.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
            return l_high + l_low, (l_high, l_low)

        def merged_loss_fn(lp):
            p_plus = merge(base_params, sites, lp, scale)
            p_minus = merge(base_params, sites, lp, -scale)
            eps_high = predict(
                p_plus, noisy_high, cfg_rows(positive_emb), xl_kwargs(pooled["positive"]) if is_xl else None
            )
            eps_low = predict(
                p_minus, noisy_low, cfg_rows(neutral_emb), xl_kwargs(pooled["neutral"]) if is_xl else None
            )
            l_high = jnp.mean((eps_high.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
            l_low = jnp.mean((eps_low.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
            return l_high + l_low, (l_high, l_low)

        loss_fn = fused_loss_fn if student_overlay else merged_loss_fn

        (loss, (l_high, l_low)), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora_params)
        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, {"loss": loss, "loss_high": l_high, "loss_low": l_low}

    return step
