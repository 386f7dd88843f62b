"""Slider inference for flow-matching families (SD3 / Flux).

The reference's SD3/Flux inference surface is notebook/pipeline-level only
(SURVEY L6 lists SD1/XL generators); this module completes the framework so
flow-matching sliders can be swept the same way: a two-phase Euler sampler
(base params while ``t > start_noise``, slider-merged params after) mirroring
infer/generate.py, plus the 16-channel SD3 VAE decode conventions
(scaling_factor 1.5305, shift_factor 0.0609).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, FlowSchedule


def flip_step_for_start_noise(schedule: FlowSchedule, start_noise: float) -> int:
    """First step index whose (continuous) timestep is <= start_noise."""
    ts = np.asarray(schedule.timesteps)
    if ts[0] <= start_noise:
        return 0
    if not np.any(ts <= start_noise):
        return len(ts)
    return int(np.argmax(ts <= start_noise))


def sample_flow_loop(
    apply_fn: Callable,  # (params, latents, t_vec, context, pooled) -> velocity
    params_structure,
    params_slider,
    flip_step: int,
    schedule: FlowSchedule,
    latents: jnp.ndarray,
    text_embeddings: jnp.ndarray,  # [2B] uncond ++ cond, or [B] cond-only
    pooled: jnp.ndarray,
    guidance_scale: float = 7.0,
    slider_overlay: Optional[Callable] = None,
) -> jnp.ndarray:
    """Two-phase flow-Euler sampling with CFG (cond-only when the embedding
    batch matches the latents batch). ``guidance_scale <= 1`` statically
    disables CFG and uses the conditional rows (diffusers semantics —
    ``v_u + 0·(v_c − v_u)`` would return the unconditional velocity).

    ``slider_overlay``: zero-arg callable returning a context manager (e.g.
    ``lambda: lora_overlay(sites, lp, row_scale)``); when given, the
    post-flip phase runs the forward inside it over ``params_slider``
    (pass the BASE tree there) instead of a merged tree — the
    quantized-base path, where merging into int8 is not possible."""
    n = schedule.num_inference_steps
    b = latents.shape[0]
    use_cfg = text_embeddings.shape[0] != b
    try:
        no_cfg = use_cfg and float(guidance_scale) <= 1.0
    except jax.errors.ConcretizationTypeError:
        no_cfg = False  # traced guidance keeps the dynamic CFG path
    if no_cfg:
        text_embeddings = text_embeddings[b:]
        if pooled is not None and pooled.shape[0] == 2 * b:
            pooled = pooled[b:]
        use_cfg = False

    def make_body(params, overlaid=False):
        def fwd(*a):
            if overlaid and slider_overlay is not None:
                with slider_overlay():
                    return apply_fn(params, *a)
            return apply_fn(params, *a)

        def body(i, lat):
            t = schedule.timesteps[i]
            if use_cfg:
                doubled = jnp.concatenate([lat] * 2, axis=0)
                v = fwd(doubled, jnp.broadcast_to(t, (2 * b,)), text_embeddings, pooled)
                v_u, v_c = jnp.split(v, 2, axis=0)
                guided = v_u + guidance_scale * (v_c - v_u)
            else:
                guided = fwd(lat, jnp.broadcast_to(t, (b,)), text_embeddings, pooled)
            return FlowMatchScheduler.step(schedule, guided, i, lat)

        return body

    lat = latents
    if flip_step > 0:
        lat = jax.lax.fori_loop(0, flip_step, make_body(params_structure), lat)
    if flip_step < n:
        lat = jax.lax.fori_loop(flip_step, n, make_body(params_slider, overlaid=True), lat)
    return lat


def make_packed_overlay_sampler(apply_fn, sites, schedule: FlowSchedule, flip_step: int,
                                img_ids, guidance_embeds: bool, indexed: bool = False):
    """Jitted two-phase sampler over PACKED Flux tokens with the slider as a
    traced per-row overlay multiplier — ONE executable serves every float
    scale, and the base tree (int8 or bf16) is never merged into. Shared by
    the Flux sweep CLI, ``serve.FluxSliderService``, and the bench.

    ``sample(base, lp, row_scale, tokens, text, pooled, guidance)`` —
    ``guidance`` feeds the dev variant's distilled-guidance embedding and is
    ignored for schnell (``guidance_embeds=False``).

    ``indexed=True`` builds the heterogeneous-adapter variant
    ``sample(base, stacked_lp, row_scale, adapter_idx, tokens, ...)``:
    ``stacked_lp`` carries a stacked leading adapter axis
    (adapters/lora.stack_adapters) and each row runs under its own adapter —
    serve.py batches requests for DIFFERENT sliders into one call."""
    import jax

    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    n = schedule.num_inference_steps

    def _run(base, lp, row_scale, adapter_idx, tokens, text, pooled, guidance):
        txt_ids = jnp.zeros((text.shape[1], 3))
        gkw = {"guidance": guidance} if guidance_embeds else {}

        def make_body(scaled):
            def body(i, tok):
                t = jnp.broadcast_to(schedule.timesteps[i] / 1000.0, (tok.shape[0],))
                if scaled:
                    with lora_lib.lora_overlay(sites, lp, row_scale, adapter_idx=adapter_idx):
                        v = apply_fn(base, tok, t, text, pooled, txt_ids, img_ids, **gkw)
                else:
                    v = apply_fn(base, tok, t, text, pooled, txt_ids, img_ids, **gkw)
                return FlowMatchScheduler.step(schedule, v, i, tok)

            return body

        if flip_step > 0:
            tokens = jax.lax.fori_loop(0, flip_step, make_body(False), tokens)
        if flip_step < n:
            tokens = jax.lax.fori_loop(flip_step, n, make_body(True), tokens)
        return tokens

    if indexed:

        @jax.jit
        def sample_indexed(base, lp, row_scale, adapter_idx, tokens, text, pooled, guidance):
            return _run(base, lp, row_scale, adapter_idx, tokens, text, pooled, guidance)

        return sample_indexed

    @jax.jit
    def sample(base, lp, row_scale, tokens, text, pooled, guidance):
        return _run(base, lp, row_scale, None, tokens, text, pooled, guidance)

    return sample


def sd3_latents_to_images(vae_decode: Callable, latents: jnp.ndarray,
                          scaling_factor: float = 1.5305, shift_factor: float = 0.0609) -> np.ndarray:
    """SD3 VAE conventions: x = z / scaling + shift before decode."""
    z = latents.astype(jnp.float32) / scaling_factor + shift_factor
    imgs = vae_decode(z)
    imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
    imgs = jnp.transpose(imgs, (0, 2, 3, 1))
    return np.asarray(jnp.round(imgs * 255).astype(jnp.uint8))
