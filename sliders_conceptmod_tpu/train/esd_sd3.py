"""ESD slider step for SD3 (MMDiT + flow matching).

Semantics-parity target: reference ``train_lora_sd3.py:170-340`` with
``predict_noise_sd3`` (train_util.py:350-382):

* the branch predictions are **scheduler-stepped latents**, not raw
  velocity — ``predict_noise_sd3`` CFG-combines the velocity and then calls
  ``scheduler.step`` (train_util.py:380); the ESD loss compares those
  stepped latents,
* ``current_timestep = timesteps[timesteps_to]`` directly (no 1000-step
  re-indexing; train_lora_sd3.py:236-238),
* the reference deep-copies the scheduler per branch so every branch steps
  from the same ``_step_index`` (:241-314) — stateless step-by-index makes
  that a non-issue here (SURVEY §7.4),
* 16-channel latents, no init-noise scaling (train_util.py:50-66),
* AdamW/lr from config, grad-clip norm 0.2 (:330-340 equivalent).

TPU restructurings mirror train/esd.py: traced-trip-count warm-up loop,
4-row batched teacher call (CFG shares the uncond row; the flow step is
linear in the velocity so stepping batches too), adapter-merge slider.
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
class SD3ESDConfig:
    max_denoising_steps: int = 50
    train_cfg_scale: float = 1.0
    batch_size: int = 1
    height: int = 512
    width: int = 512
    latent_channels: int = 16
    vae_scale: int = 8
    remat: bool = True
    # independent ESD samples per optimizer step (vmapped; under a mesh the
    # sample axis shards over the data axis — esd.sampled_loss_and_grad)
    samples_per_step: int = 1
    shard_samples: bool = False
    # shared-prefix warm-up (tpu.share_warmup — same lever as
    # train/esd.py ESDConfig.share_warmup, extended here because SD3's
    # 28-step flow warm-up is the LARGEST warm-up share of any family
    # (avg ~14 of ~18 model evals/step, BASELINE.md)): the per-step samples
    # share ONE batch-1 warm-up chain to max(t_k), each sample reading the
    # trajectory snapshot at its own t_k (the flow step is deterministic, so
    # snapshots ARE the per-chain states — equivalence-tested). Warm-up cost
    # becomes independent of samples_per_step. DEVIATIONS (opt-in A/B only):
    # the per-step samples share one prompt pair (drawn from sample 0's key)
    # and one initial latent. samples_per_step > 1 + batch_size == 1 only.
    share_warmup: bool = False
    mesh: object = None


def make_sd3_esd_train_step(
    transformer_apply: Callable,  # (params, latents, t, context, pooled)
    sites,
    schedule: FlowSchedule,
    optimizer: optax.GradientTransformation,
    cfg: SD3ESDConfig,
    merge_fn=None,
    student_overlay: bool = False,
    remat_apply: Callable | None = None,
    warm_apply: Callable | None = None,
    overlay_warmup: bool | None = None,
):
    """``student_overlay=True``: apply the student LoRA via the apply-time
    interceptor instead of merging — required over an int8-quantized base
    (tpu.quantize_base, adapters/quant.py); the shape-(1,) row multiplier
    broadcasts over CFG-doubled batches.

    ``remat_apply``: a per-BLOCK-rematted apply (``bundle.apply_fn(
    remat_blocks=True)``) for the student grad pass — caps fwd+bwd peak HBM
    at block granularity (the SD3.5-Large-class fit lever; see
    train/esd_flux.py for why whole-model jax.checkpoint does not).

    ``warm_apply``: alternative MMDiT apply for the GRADIENT-STOPPED warm-up
    chain only (tpu.w8a8_warmup — ``bundle.apply_fn(act_quant=True)``: W8A8
    int8×int8 MXU matmuls on the latency-bound partial-denoise loop; teacher
    and student stay on the exact path, mirroring train/esd.py).

    ``warm_params`` (optional trailing step argument, mirroring
    train/esd.py): a SEPARATE frozen tree consumed only by ``warm_apply`` —
    the dual-tree route: the bf16 base keeps the EXACT teacher/student paths
    while the 28-step flow warm-up runs a one-time int8 copy with act-quant
    (tpu.w8a8_warmup WITHOUT tpu.quantize_base; SD3's wide 1536-col matmuls
    are where W8A8 measured +23%, BASELINE.md). ``None`` reuses
    ``base_params`` (the int8-everywhere quantize_base route). Flows through
    the jit signature like every frozen tree (CLAUDE.md convention).

    ``overlay_warmup``: warm-up path under ``student_overlay`` — ``None``
    follows ``student_overlay`` (overlay warm-up; REQUIRED over a quantized
    base); ``False`` keeps the warm-up on the once-per-step merged tree
    while only the student grad path uses the overlay (same bf16 split as
    train/esd.py ESDConfig.overlay_warmup)."""
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    if warm_apply is not None and not student_overlay:
        # merged-student warm-up would re-merge bf16 params and lose the int8
        # kernels W8A8 rides on — same constraint as train/esd.py
        raise ValueError("warm_apply requires student_overlay=True (quantized base)")
    if overlay_warmup is None:
        overlay_warmup = student_overlay
    if overlay_warmup and not student_overlay:
        raise ValueError("overlay_warmup=True requires student_overlay=True")
    if not overlay_warmup and warm_apply is not None:
        raise ValueError(
            "overlay_warmup=False needs the merged warm-up tree — impossible "
            "with a distinct warm_apply (quantized base)"
        )
    warmup_apply = warm_apply if warm_apply is not None else transformer_apply
    overlay_one = jnp.ones((1,), jnp.float32)
    if remat_apply is not None:
        student_apply = remat_apply
    else:
        student_apply = jax.checkpoint(transformer_apply) if cfg.remat else transformer_apply
    b = cfg.batch_size
    gs = cfg.train_cfg_scale
    # g==1 fast path: u + 1·(c−u) ≡ c — skip the uncond rows (see train/esd.py)
    use_cfg = float(gs) != 1.0
    if cfg.share_warmup and (cfg.samples_per_step == 1 or cfg.batch_size != 1):
        raise ValueError(
            "share_warmup needs the multi-sample path "
            "(samples_per_step > 1, batch_size == 1)"
        )

    def tile(row):
        return jnp.tile(row[None], (b,) + (1,) * row.ndim)

    def cfg_step(apply_fn, params, latents, rows, pooled_rows, step_index):
        """CFG velocity + flow step from ``step_index`` — predict_noise_sd3."""
        if not use_cfg:
            t = jnp.broadcast_to(schedule.timesteps[step_index], (b,))
            guided = apply_fn(params, latents, t, rows, pooled_rows)
            return FlowMatchScheduler.step(schedule, guided, step_index, latents)
        doubled = jnp.concatenate([latents] * 2, axis=0)
        t = jnp.broadcast_to(schedule.timesteps[step_index], (2 * b,))
        v = apply_fn(params, doubled, t, rows, pooled_rows)
        v_u, v_c = jnp.split(v, 2, axis=0)
        guided = v_u + gs * (v_c - v_u)
        return FlowMatchScheduler.step(schedule, guided, step_index, latents)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def train_step(base_params, lora_params, opt_state, key, bank: PromptBank, warm_params=None):
        # None-vs-tree is static per trace, so these are trace-time guards:
        # a warm_params tree fed to a merged warm-up would be silently
        # ignored, and one without a dequantizing warm_apply would push an
        # int8 tree through the exact apply and train on garbage (ADVICE r3)
        if warm_params is not None and not overlay_warmup:
            raise ValueError(
                "warm_params passed but overlay_warmup=False — the merged "
                "warm-up ignores the dual tree; drop warm_params or enable "
                "overlay_warmup"
            )
        if warm_params is not None and warm_apply is None:
            raise ValueError(
                "warm_params (dual int8 tree) requires a dequantizing "
                "warm_apply — pass bundle.apply_fn(act_quant=True) built "
                "over the quantized copy"
            )
        def rows_fns(text, pooled):
            """Per-role row batches for one pair's [5, S, D] bank slice."""

            def rows(role):
                if not use_cfg:
                    return tile(text[role])
                return jnp.concatenate([tile(text[ROLE_UNCOND]), tile(text[role])], axis=0)

            def prows(role):
                if not use_cfg:
                    return tile(pooled[role])
                return jnp.concatenate([tile(pooled[ROLE_UNCOND]), tile(pooled[role])], axis=0)

            return rows, prows

        def warm_step_fn(lp, rows, prows):
            """One slider-ON gradient-stopped warm-up flow step ``lat ← f(lat, i)``.
            warm_params (dual-tree int8 copy) feeds ONLY this chain — shared
            between the per-sample and shared-prefix paths so they cannot
            desync (the rule train/esd.py keeps with _warmup_apply_params)."""
            if overlay_warmup:
                slp = jax.lax.stop_gradient(lp)
                wp = base_params if warm_params is None else warm_params

                def f(lat, i):
                    with lora_lib.lora_overlay(sites, slp, overlay_one):
                        return cfg_step(
                            warmup_apply, wp, lat, rows(ROLE_TARGET), prows(ROLE_TARGET), i
                        )

            else:
                student_params = jax.lax.stop_gradient(merge(base_params, sites, lp, 1.0))

                def f(lat, i):
                    return cfg_step(
                        transformer_apply, student_params, lat, rows(ROLE_TARGET), prows(ROLE_TARGET), i
                    )

            return f

        def sample_tail(lp, text, pooled, g_pair, sign, denoised, t_idx, rows, prows):
            """Teacher target + student loss at flow step index ``t_idx`` from
            a gradient-stopped warm-up context ``denoised`` [b, C, h, w]."""
            troles = (ROLE_POSITIVE, ROLE_NEUTRAL, ROLE_NEGATIVE)
            if use_cfg:
                troles = (ROLE_UNCOND,) + troles
            n_rows = len(troles)
            teacher_rows = jnp.concatenate([tile(text[r]) for r in troles], axis=0)
            teacher_pooled = jnp.concatenate([tile(pooled[r]) for r in troles], axis=0)
            t_vec = jnp.broadcast_to(schedule.timesteps[t_idx], (n_rows * b,))
            v_all = transformer_apply(
                base_params, jnp.concatenate([denoised] * n_rows, axis=0), t_vec, teacher_rows, teacher_pooled
            )
            if use_cfg:
                v_u, v_p, v_n, v_neg = jnp.split(v_all, 4, axis=0)

                def stepped(v_c):
                    guided = v_u + gs * (v_c - v_u)
                    return FlowMatchScheduler.step(schedule, guided, t_idx, denoised)

                pos_lat, neu_lat, neg_lat = stepped(v_p), stepped(v_n), stepped(v_neg)
            else:
                v_p, v_n, v_neg = jnp.split(v_all, 3, axis=0)
                stepped = lambda v: FlowMatchScheduler.step(schedule, v, t_idx, denoised)
                pos_lat, neu_lat, neg_lat = stepped(v_p), stepped(v_n), stepped(v_neg)
            esd_target = jax.lax.stop_gradient(
                (neu_lat + sign * g_pair * (pos_lat - neg_lat)).astype(jnp.float32)
            )

            if student_overlay:
                with lora_lib.lora_overlay(sites, lp, overlay_one):
                    tgt = cfg_step(
                        student_apply, base_params, denoised, rows(ROLE_TARGET), prows(ROLE_TARGET), t_idx
                    )
            else:
                sp = merge(base_params, sites, lp, 1.0)
                tgt = cfg_step(student_apply, sp, denoised, rows(ROLE_TARGET), prows(ROLE_TARGET), t_idx)
            diff = tgt.astype(jnp.float32) - esd_target
            return jnp.mean(diff * diff)

        def sample_loss(lp, k):
            """One independent ESD sample: (pair, t_to, noise) draw → warm-up
            → teacher target → student loss. ``lp`` carries the gradient."""
            k_pair, k_t, k_noise = jax.random.split(k, 3)
            n_pairs = bank.text.shape[0]
            pair = jax.random.randint(k_pair, (), 0, n_pairs)
            timesteps_to = jax.random.randint(k_t, (), 1, cfg.max_denoising_steps)

            text = bank.text[pair]
            pooled = bank.pooled[pair]
            rows, prows = rows_fns(text, pooled)

            latents0 = jax.random.normal(
                k_noise,
                (b, cfg.latent_channels, cfg.height // cfg.vae_scale, cfg.width // cfg.vae_scale),
                jnp.float32,
            )
            wstep = warm_step_fn(lp, rows, prows)
            denoised = jax.lax.stop_gradient(
                jax.lax.fori_loop(0, timesteps_to, lambda i, lat: wstep(lat, i), latents0)
            )
            return sample_tail(
                lp, text, pooled, bank.guidance[pair], bank.sign[pair],
                denoised, timesteps_to, rows, prows,
            )

        if cfg.share_warmup:
            # tpu.share_warmup: ONE batch-1 warm-up chain to max(t_k), each
            # sample reading the trajectory snapshot at its own t_k. The
            # per-sample (pair, t_k) draws use the SAME key splits as the
            # vmap path, so with coinciding t_k the two paths compute the
            # identical loss (equivalence-tested, tests/test_esd_sd3.py).
            S = cfg.samples_per_step
            keys = jax.random.split(key, S)

            def draw(k):
                k_pair, k_t, _ = jax.random.split(k, 3)
                pair = jax.random.randint(k_pair, (), 0, bank.text.shape[0])
                t_to = jax.random.randint(k_t, (), 1, cfg.max_denoising_steps)
                return pair, t_to

            pairs, t_to = jax.vmap(draw)(keys)
            pair0 = pairs[0]  # one pair per step — the shared chain's context
            k_noise0 = jax.random.split(keys[0], 3)[2]
            latents0 = jax.random.normal(
                k_noise0,
                (1, cfg.latent_channels, cfg.height // cfg.vae_scale, cfg.width // cfg.vae_scale),
                jnp.float32,
            )
            text0 = bank.text[pair0]
            pooled0 = bank.pooled[pair0]
            rows0, prows0 = rows_fns(text0, pooled0)
            g0, s0 = bank.guidance[pair0], bank.sign[pair0]

            def shared_loss(lp):
                wstep = warm_step_fn(lp, rows0, prows0)
                hit_shape = (S,) + (1,) * (latents0.ndim - 1)
                snaps0 = jnp.zeros((S,) + latents0.shape[1:], latents0.dtype)

                def body(i, carry):
                    lat, snaps = carry
                    lat = wstep(lat, i)
                    # rows with t_k == i+1 snapshot the post-step state; the
                    # [1, ...] chain broadcasts over the S-row buffer
                    hit = (t_to == i + 1).reshape(hit_shape)
                    return lat, jnp.where(hit, lat, snaps)

                _, snaps = jax.lax.fori_loop(0, jnp.max(t_to), body, (latents0, snaps0))
                snaps = jax.lax.stop_gradient(snaps)
                if cfg.shard_samples:
                    snaps = jax.lax.with_sharding_constraint(
                        snaps, data_partition_spec(cfg.mesh)
                    )

                def tail(t_idx, ctx):
                    return sample_tail(lp, text0, pooled0, g0, s0, ctx[None], t_idx, rows0, prows0)

                losses = jax.vmap(tail)(t_to, snaps)
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
