"""The ESD slider training step — one jitted function per model family.

Semantics-parity target: the reference per-iteration loop
(``conceptmod/textsliders/train_lora_xl.py:165-351``; SD1 variant per
upstream semantics, SURVEY §2.4):

1. sample a prompt pair and ``timesteps_to ∈ [1, max_denoising_steps)``,
2. partial denoise from pure noise for ``timesteps_to`` steps **with the
   slider enabled** (load-bearing reference behavior,
   train_lora_xl.py:209-231), gradient-stopped,
3. teacher ε-predictions for positive / neutral / negative prompts with the
   slider OFF (train_lora_xl.py:240-299),
4. student ε-prediction for the target prompt with the slider ON and
   gradients flowing (train_lora_xl.py:305-325),
5. loss = MSE(student, neutral ∓ g·(positive − negative))
   (prompt_util.py:134-161), backward, grad-clip, optimizer step.

TPU-first restructurings (same math, different graph):
* the whole iteration is ONE jitted function; the warm-up loop is a
  ``lax.fori_loop`` whose trip count is the *traced* ``timesteps_to`` — no
  recompiles, no wasted full-length scan;
* the three teacher CFG calls share one unconditional prediction: rows
  [uncond, positive, neutral, negative] go through the UNet as a single
  batch of 4·B and the CFG combine ``u + g(c − u)`` is applied per branch —
  identical math to the reference's three 2·B calls (which recompute the
  uncond row each time), 4 rows instead of 6;
* the slider on/off flip is the LoRA merge multiplier (adapters/lora.py),
  not module mutation;
* optional data parallelism: ``samples_per_step > 1`` vmaps independent
  (pair, timestep, noise) draws and averages the loss — under a mesh the
  sample axis shards across chips and XLA inserts the gradient psum
  (SURVEY §2.2 DP plan). ``samples_per_step=1`` reproduces the reference's
  effective batch exactly.

Prompt embeddings are pre-encoded into a stacked bank (``PromptBank``) so
pair selection is a traced ``jnp.take`` — no host round-trip per step.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Optional

import jax
from jax.sharding import PartitionSpec as P
import jax.numpy as jnp
import optax

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.prompts import action_sign
from sliders_conceptmod_tpu.diffusion.sampling import (
    current_train_timestep,
    denoise_partial,
    denoise_partial_per_row,
    denoise_shared_snapshots,
    get_initial_latents,
    predict_noise,
)
from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler, Schedule

# role order inside the stacked bank
ROLE_TARGET, ROLE_POSITIVE, ROLE_NEGATIVE, ROLE_UNCOND, ROLE_NEUTRAL = range(5)


@jax.tree_util.register_dataclass
@dataclass
class PromptBank:
    """All prompt-pair embeddings stacked for traced indexing.

    text:    [P, 5, S, D]   (roles: target, positive, negative, uncond, neutral)
    pooled:  [P, 5, Dp] or None (XL only)
    guidance: [P]  per-pair guidance_scale (loss formula g, prompt_util.py:141)
    sign:    [P]   −1 erase / +1 enhance (prompt_util.py:134-161)
    """

    text: jnp.ndarray
    guidance: jnp.ndarray
    sign: jnp.ndarray
    pooled: Optional[jnp.ndarray] = None


def build_prompt_bank(settings_list, encode_fn) -> PromptBank:
    """Encode each pair's 5 prompts (deduplicated by string, reference
    PromptEmbedsCache prompt_util.py:50-61) and stack.

    ``encode_fn(prompt: str) -> (text [S,D], pooled [Dp] | None)``
    """
    cache = {}

    def enc(p: str):
        if p not in cache:
            cache[p] = encode_fn(p)
        return cache[p]

    texts, pooleds, gs, signs = [], [], [], []
    for s in settings_list:
        roles = [s.target, s.positive, s.negative, s.unconditional, s.neutral]
        t_list, p_list = zip(*[enc(p) for p in roles])
        texts.append(jnp.stack(t_list))
        if p_list[0] is not None:
            pooleds.append(jnp.stack(p_list))
        gs.append(s.guidance_scale)
        signs.append(action_sign(s.action))

    return PromptBank(
        text=jnp.stack(texts),
        pooled=jnp.stack(pooleds) if pooleds else None,
        guidance=jnp.asarray(gs, jnp.float32),
        sign=jnp.asarray(signs, jnp.float32),
    )


def draw_time_ids(key, height: int, width: int) -> jnp.ndarray:
    """Traced per-iteration XL crop conditioning [1, 6] — reference
    get_add_time_ids with dynamic_crops (train_util.py:976-1011), redrawn
    EVERY iteration (train_lora_xl.py:202-207): original size = target ×
    uniform[1,3), crop top-left uniform over the overhang. In-graph from the
    step key so runs are reproducible from tpu.seed (the host-side redraw
    would also force one compile per drawn value)."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1) * 2.0 + 1.0
    oh = jnp.floor(height * scale)
    ow = jnp.floor(width * scale)
    top = jnp.floor(jax.random.uniform(k2) * jnp.maximum(oh - height, 1.0))
    left = jnp.floor(jax.random.uniform(k3) * jnp.maximum(ow - width, 1.0))
    return jnp.stack(
        [oh, ow, top, left, jnp.float32(height), jnp.float32(width)]
    ).astype(jnp.float32)[None]


def data_partition_spec(mesh=None):
    """Sample-axis spec: a NamedSharding bound to ``mesh`` when given (no
    ambient mesh context needed — the trainer-CLI path), else the bare
    PartitionSpec for callers managing their own ``with mesh:`` scope."""
    if mesh is None:
        return P("data")
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P("data"))


def sampled_loss_and_grad(sample_loss, lora_params, key, samples_per_step: int,
                          shard_samples: bool = False, mesh=None):
    """value_and_grad of the mean of ``sample_loss(lp, k)`` over independent
    per-step samples — the shared DP machinery for every ESD family
    (SURVEY §2.2): >1 samples vmap over split keys; ``shard_samples`` pins
    the sample axis to the mesh data axis so each chip carries whole samples
    and XLA inserts the gradient all-reduce. ``samples_per_step == 1``
    reproduces the single-sample graph exactly."""
    if samples_per_step == 1:
        return jax.value_and_grad(lambda lp: sample_loss(lp, key))(lora_params)
    keys = jax.random.split(key, samples_per_step)
    if shard_samples:
        keys = jax.lax.with_sharding_constraint(keys, data_partition_spec(mesh))

    def mean_loss(lp):
        losses = jax.vmap(lambda k: sample_loss(lp, k))(keys)
        if shard_samples:
            losses = jax.lax.with_sharding_constraint(losses, data_partition_spec(mesh))
        return jnp.mean(losses)

    return jax.value_and_grad(mean_loss)(lora_params)


@dataclass(frozen=True)
class ESDConfig:
    max_denoising_steps: int = 50
    train_cfg_scale: float = 1.0  # config.train.cfg — warmup & branch guidance
    batch_size: int = 1
    height: int = 512
    width: int = 512
    samples_per_step: int = 1
    shard_samples: bool = False  # constrain the sample axis to the mesh 'data' axis
    num_train_timesteps: int = 1000
    remat_unet: bool = True  # jax.checkpoint the student UNet call
    # samples_per_step > 1: fuse the independent samples onto the row axis
    # (one masked warm-up loop to max trip, one teacher, one student) instead
    # of vmapping divergent loops. Numerically identical draws/loss; measured
    # +5% on v5e at 4 samples (BASELINE.md — the chip is compute-bound at
    # batch 1, so the win is overhead removal, not batching). Also gives the
    # mesh ONE row axis to shard. Falls back to vmap unless batch_size == 1.
    fuse_samples: bool = True
    # fuse the teacher branches AND the student prediction into ONE UNet
    # call against a single weight stream: the teacher rows ride with
    # per-row slider scale 0 and the student row with scale 1 through the
    # apply-time overlay (adapters/lora.lora_overlay) — identical math to
    # the separate calls (equivalence-tested), one fewer full pass over the
    # frozen weights (the teacher call's HBM stream). LoRA + guidance==1 +
    # samples_per_step==1 only.
    fuse_teacher_student: bool = False
    # per-iteration random crop conditioning for XL (reference
    # prompt_pair.dynamic_crops): time_ids drawn in-graph from the step key
    # (draw_time_ids), per sample on the DP/fused paths
    dynamic_crops: bool = False
    # apply the student LoRA via the apply-time interceptor instead of
    # merging — required over an int8-quantized base (tpu.quantize_base,
    # adapters/quant.py): an int8 tree cannot host a merge. Identical math
    # to the merged path up to matmul re-association (equivalence-tested).
    # LoRA only (DoRA's magnitude decomposition needs the merged tree).
    student_overlay: bool = False
    # warm-up path under student_overlay: None (default) runs the warm-up
    # through the overlay too — REQUIRED over a quantized base (the merged
    # tree cannot exist). False keeps the warm-up on the once-per-step
    # merged tree while only the student grad path uses the overlay: the
    # latency-bound warm-up chain keeps its unbroken XLA fusions (no
    # per-site interceptors) and the student backward still skips the dense
    # dL/dW' weight-grads. bf16 base only.
    overlay_warmup: Optional[bool] = None
    # software-pipeline the warm-up across step boundaries: step k's graph
    # computes the teacher/student/update from a CARRIED warm-up state and
    # the warm-up for step k+1 from the *pre-update* LoRA params — the two
    # subgraphs are independent, so XLA's scheduler can interleave the
    # latency-bound warm-up chain with the student backward. DEVIATION: the
    # warm-up sees params one optimizer step stale (the warm-up is already
    # gradient-stopped context generation; with lr→0 the sequence is
    # bit-identical, tests/test_esd_train.py). samples_per_step==1 only.
    pipeline_warmup: bool = False
    # shared-prefix warm-up (tpu.share_warmup, VERDICT r3 task 4): the
    # fused samples share ONE batch-1 warm-up chain to max(t_k), each
    # sample reading the trajectory snapshot at its own t_k
    # (diffusion/sampling.denoise_shared_snapshots). Warm-up cost becomes
    # independent of samples_per_step. DEVIATIONS (opt-in A/B only): the
    # per-step samples share one prompt pair (drawn once), one initial
    # latent, and correlated warm-up noise; with dynamic_crops the warm-up
    # rides sample 0's crop. fuse_samples + samples_per_step>1 only.
    share_warmup: bool = False
    # the Mesh behind shard_samples. When set, constraints bind to it as
    # NamedShardings — no ambient `with mesh:` context needed, which is what
    # lets the trainer CLIs drive DP (and multi-host DP: global meshes from
    # parallel/mesh.init_distributed) straight from the yaml tpu: block.
    # None keeps the bare-PartitionSpec behavior for callers that manage
    # their own mesh context.
    mesh: Optional[object] = None

    def data_spec(self):
        return data_partition_spec(self.mesh)


def make_esd_train_step(
    unet_apply: Callable,
    sites,
    scheduler: NoiseScheduler,
    schedule: Schedule,
    optimizer: optax.GradientTransformation,
    cfg: ESDConfig,
    add_time_ids: Optional[jnp.ndarray] = None,  # [1, 6] for XL
    merge_fn=None,  # adapter merge (LoRA default; DoRA passes its own)
    warm_apply: Optional[Callable] = None,
):
    """Build the jitted step: (base_params, lora_params, opt_state, key,
    bank[, warm_params]) → (lora_params, opt_state, metrics).

    ``warm_apply``: alternative UNet apply for the GRADIENT-STOPPED warm-up
    chain only (reference :209-231 — it just synthesizes the partially
    denoised context latents). The tpu.w8a8_warmup knob passes a W8A8
    (per-token int8 activations, int8×int8 MXU) apply here: the warm-up is
    the latency-bound section of the step (BASELINE.md phase table) and
    carries no gradients, so activation rounding is legal — while the
    teacher (sets the regression target) and student (takes the grads) keep
    the exact weight-only path. DEVIATION: warm-up context latents then
    carry ~1-2 % per-layer rounding noise vs the reference's fp trajectory;
    opt-in only.

    ``warm_params`` (optional trailing step argument): a SEPARATE frozen
    tree consumed only by ``warm_apply`` — the dual-tree route: a bf16 base
    keeps the exact merged teacher + overlay-student paths while the warm-up
    chain runs a one-time int8 copy of the same weights with act-quant
    (tpu.w8a8_warmup WITHOUT tpu.quantize_base). ``None`` (default) reuses
    ``base_params``, i.e. the int8-everywhere quantize_base route. Flows
    through the jit signature like every other frozen tree (CLAUDE.md
    convention — closure capture would bake GBs into the executable)."""

    is_xl = add_time_ids is not None
    b = cfg.batch_size
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    # CFG with guidance exactly 1.0 reduces to the conditional prediction:
    # u + 1·(c − u) = c. The reference still evaluates the uncond rows
    # (train_lora_xl.py:230,258 with config cfg=1.0 default) — skipping them
    # statically removes ~45%% of the UNet FLOPs per step with bit-identical
    # math. Any other guidance value keeps the full CFG batches.
    use_cfg = float(cfg.train_cfg_scale) != 1.0

    def tile(emb_row):  # [S, D] -> [b, S, D]
        return jnp.tile(emb_row[None], (b,) + (1,) * emb_row.ndim)

    # remat with matmul outputs saved: recomputes only cheap elementwise ops
    # in the backward pass — bf16 params leave ~4.5GB HBM headroom on v5e
    student_apply = (
        jax.checkpoint(unet_apply, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        if cfg.remat_unet
        else unet_apply
    )

    if cfg.fuse_teacher_student:
        if use_cfg:
            raise ValueError("fuse_teacher_student requires guidance == 1 (cond-only rows)")
        if merge_fn is not None and merge_fn is not lora_lib.merge_lora_params:
            raise ValueError("fuse_teacher_student supports the LoRA overlay only")
        if cfg.samples_per_step != 1:
            raise ValueError("fuse_teacher_student supports samples_per_step == 1 only")
    if cfg.share_warmup and (
        cfg.samples_per_step == 1 or not cfg.fuse_samples or cfg.batch_size != 1
    ):
        raise ValueError(
            "share_warmup needs the fused multi-sample path "
            "(samples_per_step > 1, fuse_samples, batch_size == 1)"
        )

    if cfg.student_overlay and merge_fn is not None and merge_fn is not lora_lib.merge_lora_params:
        raise ValueError("student_overlay supports the LoRA overlay only (DoRA merges)")
    if warm_apply is not None and not cfg.student_overlay:
        # a distinct warm-up apply implies a quantized base — the merged-tree
        # warm-up would hand it full-precision params it can't interpret
        raise ValueError("warm_apply requires student_overlay=True (quantized base)")
    warmup_apply = warm_apply if warm_apply is not None else unet_apply
    overlay_one = jnp.ones((1,), jnp.float32)

    def _overlay_apply(apply, lp):
        """apply under the slider-ON LoRA overlay (the int8-base student path;
        the (1,)-shaped multiplier broadcasts over CFG-doubled batches)."""

        def fn(p, *a, **kw):
            with lora_lib.lora_overlay(sites, lp, overlay_one):
                return apply(p, *a, **kw)

        return fn

    overlay_warmup = cfg.overlay_warmup if cfg.overlay_warmup is not None else cfg.student_overlay
    if cfg.overlay_warmup is False and warm_apply is not None:
        raise ValueError(
            "overlay_warmup=False needs the merged warm-up tree — impossible "
            "with a distinct warm_apply (quantized base)"
        )
    if cfg.overlay_warmup and not cfg.student_overlay:
        raise ValueError("overlay_warmup=True requires student_overlay=True")

    def _warmup_apply_params(base_params, lora_params, warm_params=None):
        """(apply, params) for the gradient-stopped warm-up — ONE place so the
        per-sample and fused paths cannot desync (the same rule that keeps
        teacher_and_loss shared). ``warm_params`` is the dual-tree int8 copy
        (None → the warm-up reads ``base_params``)."""
        if overlay_warmup:
            wp = base_params if warm_params is None else warm_params
            return _overlay_apply(warmup_apply, jax.lax.stop_gradient(lora_params)), wp
        return unet_apply, jax.lax.stop_gradient(merge(base_params, sites, lora_params, 1.0))

    def fused_teacher_student_loss(
        base_params, denoised, current_t, role_text, role_pooled, g_pair, sign, tids=None
    ):
        """One 4-row call: [positive, neutral, negative | student target] with
        per-row slider scales [0,0,0 | 1] via the apply-time overlay — same
        math as the separate teacher + student calls, one weight stream."""
        tids = add_time_ids if tids is None else tids
        roles = (ROLE_POSITIVE, ROLE_NEUTRAL, ROLE_NEGATIVE, ROLE_TARGET)
        rows = jnp.concatenate([role_text(r) for r in roles], axis=0)
        n = denoised.shape[0]
        t_all = current_t if jnp.ndim(current_t) == 0 else jnp.tile(current_t, len(roles))
        scaled = scheduler.scale_model_input_train_t(
            schedule, jnp.concatenate([denoised] * len(roles), axis=0), t_all
        )
        kw = None
        if is_xl:
            kw = {
                "text_embeds": jnp.concatenate([role_pooled(r) for r in roles], axis=0),
                "time_ids": jnp.tile(jnp.broadcast_to(tids, (n, 6)), (len(roles), 1)),
            }
        row_scale = jnp.concatenate([jnp.zeros(3 * n), jnp.ones(n)])

        def loss_fn(lp):
            with lora_lib.lora_overlay(sites, lp, row_scale):
                eps = student_apply(base_params, scaled, t_all, rows, added_cond_kwargs=kw)
            e_pos, e_neu, e_neg, e_stu = jnp.split(eps, 4, axis=0)
            esd_target = jax.lax.stop_gradient(
                (e_neu + sign * g_pair * (e_pos - e_neg)).astype(jnp.float32)
            )
            diff = e_stu.astype(jnp.float32) - esd_target
            return jnp.mean(diff * diff)

        return loss_fn

    def teacher_and_loss(
        base_params, denoised, current_t, role_text, role_pooled, cfg_rows, xl_kwargs, g_pair, sign,
        tids=None,
    ):
        """Shared tail of both sample paths: batched teacher call → CFG
        combine → ESD target → student loss_fn. ``role_text(r)``/
        ``role_pooled(r)`` yield the per-role row batches; ``current_t`` is a
        scalar (per-sample path) or [S] (fused path — teacher rows tile it);
        ``tids`` is [1, 6] (shared crop) or per-sample [S, 6] (fused path
        with dynamic_crops). The per-sample and fused paths are
        equivalence-tested (tests/test_esd_train.py) — keeping the math in
        ONE place is what preserves that."""
        tids = add_time_ids if tids is None else tids
        roles = (ROLE_POSITIVE, ROLE_NEUTRAL, ROLE_NEGATIVE)
        if use_cfg:
            roles = (ROLE_UNCOND,) + roles
        n_rows = len(roles)
        teacher_t = current_t if jnp.ndim(current_t) == 0 else jnp.tile(current_t, n_rows)
        teacher_rows = jnp.concatenate([role_text(r) for r in roles], axis=0)
        scaled = scheduler.scale_model_input_train_t(
            schedule, jnp.concatenate([denoised] * n_rows, axis=0), teacher_t
        )
        teacher_kwargs = None
        if is_xl:
            teacher_kwargs = {
                "text_embeds": jnp.concatenate([role_pooled(r) for r in roles], axis=0),
                "time_ids": jnp.tile(
                    jnp.broadcast_to(tids, (denoised.shape[0], 6)), (n_rows, 1)
                ),
            }
        teacher_eps = unet_apply(
            base_params, scaled, teacher_t, teacher_rows, added_cond_kwargs=teacher_kwargs
        )
        gs = cfg.train_cfg_scale
        if use_cfg:
            e_u, e_pos, e_neu, e_neg = jnp.split(teacher_eps, 4, axis=0)
            guided = lambda e: e_u + gs * (e - e_u)
            pos_lat, neu_lat, neg_lat = guided(e_pos), guided(e_neu), guided(e_neg)
        else:
            pos_lat, neu_lat, neg_lat = jnp.split(teacher_eps, 3, axis=0)

        # ESD target: neutral ∓ g·(positive − negative) (prompt_util.py:134-161)
        esd_target = jax.lax.stop_gradient(
            (neu_lat + sign * g_pair * (pos_lat - neg_lat)).astype(jnp.float32)
        )

        def loss_fn(lp):
            if cfg.student_overlay:
                s_apply, sp = _overlay_apply(student_apply, lp), base_params
            else:
                s_apply, sp = student_apply, merge(base_params, sites, lp, 1.0)
            student_eps = predict_noise(
                s_apply,
                sp,
                scheduler,
                schedule,
                denoised,
                cfg_rows(ROLE_TARGET),
                train_t=current_t,
                guidance_scale=gs,
                added_cond_kwargs=xl_kwargs(ROLE_TARGET),
            )
            diff = student_eps.astype(jnp.float32) - esd_target
            return jnp.mean(diff * diff)

        return loss_fn

    def _pair_closures(text, pooled, tids=None):
        tids = add_time_ids if tids is None else tids
        def cfg_rows(role):  # [2b, S, D] (uncond ++ cond), or [b] cond-only
            if not use_cfg:
                return tile(text[role])
            return jnp.concatenate([tile(text[ROLE_UNCOND]), tile(text[role])], axis=0)

        def xl_kwargs(role):
            if not is_xl:
                return None
            if not use_cfg:
                return {
                    "text_embeds": tile(pooled[role]),
                    "time_ids": jnp.tile(tids, (b, 1)),
                }
            return {
                "text_embeds": jnp.concatenate(
                    [tile(pooled[ROLE_UNCOND]), tile(pooled[role])], axis=0
                ),
                "time_ids": jnp.tile(tids, (2 * b, 1)),
            }

        return cfg_rows, xl_kwargs

    def warm_draw(base_params, lora_params, key, bank: PromptBank, warm_params=None):
        """Draw (pair, t_k, noise) and run the slider-ON gradient-stopped
        warm-up (reference :209-231). Returns the carry consumed by
        :func:`_sample_tail` — either immediately (one_sample) or one step
        later (pipeline_warmup)."""
        k_pair, k_t, k_noise, k_warm = jax.random.split(key, 4)
        n_pairs = bank.text.shape[0]
        pair = jax.random.randint(k_pair, (), 0, n_pairs)
        timesteps_to = jax.random.randint(k_t, (), 1, cfg.max_denoising_steps)

        text = bank.text[pair]  # [5, S, D]
        pooled = bank.pooled[pair] if bank.pooled is not None else None
        tids = (
            draw_time_ids(jax.random.fold_in(key, 7), cfg.height, cfg.width)
            if (is_xl and cfg.dynamic_crops)
            else None
        )
        cfg_rows, xl_kwargs = _pair_closures(text, pooled, tids)

        latents0 = get_initial_latents(k_noise, schedule, b, cfg.height, cfg.width)
        w_apply, w_params = _warmup_apply_params(base_params, lora_params, warm_params)
        denoised = denoise_partial(
            w_apply,
            w_params,
            scheduler,
            schedule,
            latents0,
            cfg_rows(ROLE_TARGET),
            k_warm,
            total_steps=timesteps_to,
            guidance_scale=cfg.train_cfg_scale,
            added_cond_kwargs=xl_kwargs(ROLE_TARGET),
        )
        denoised = jax.lax.stop_gradient(denoised)
        current_t = current_train_timestep(
            timesteps_to, cfg.max_denoising_steps, cfg.num_train_timesteps
        )
        carry = {"pair": pair, "denoised": denoised, "current_t": current_t}
        if tids is not None:
            carry["time_ids"] = tids  # same crop for teacher/student (reference)
        return carry

    def _sample_tail(base_params, carry, bank: PromptBank):
        """(3)-(5): teacher branches + student loss from a warm-up carry."""
        pair = carry["pair"]
        text = bank.text[pair]
        pooled = bank.pooled[pair] if bank.pooled is not None else None
        tids = carry.get("time_ids")
        cfg_rows, xl_kwargs = _pair_closures(text, pooled, tids)
        if cfg.fuse_teacher_student:
            return fused_teacher_student_loss(
                base_params,
                carry["denoised"],
                carry["current_t"],
                lambda r: tile(text[r]),
                (lambda r: tile(pooled[r])) if is_xl else None,
                bank.guidance[pair],
                bank.sign[pair],
                tids=tids,
            )
        return teacher_and_loss(
            base_params,
            carry["denoised"],
            carry["current_t"],
            lambda r: tile(text[r]),
            (lambda r: tile(pooled[r])) if is_xl else None,
            cfg_rows,
            xl_kwargs,
            bank.guidance[pair],
            bank.sign[pair],
            tids=tids,
        )

    def one_sample(base_params, lora_params, key, bank: PromptBank, warm_params=None):
        carry = warm_draw(base_params, lora_params, key, bank, warm_params)
        return _sample_tail(base_params, carry, bank)

    def fused_samples_loss(base_params, lora_params, keys, k_loop, bank: PromptBank, warm_params=None):
        """samples_per_step independent samples as ROWS of one batch: one
        masked warm-up loop to max(timesteps_to), one teacher call, one
        student call. Exactly the vmap path's per-sample draws (same key
        splits), so the semantics match the reference's independent-sample
        accumulation; only the stochastic scheduler noise comes from a
        shared per-iteration key (rows still get iid noise)."""
        S = cfg.samples_per_step

        def draw(key):
            k_pair, k_t, k_noise, _ = jax.random.split(key, 4)
            pair = jax.random.randint(k_pair, (), 0, bank.text.shape[0])
            timesteps_to = jax.random.randint(k_t, (), 1, cfg.max_denoising_steps)
            lat0 = get_initial_latents(k_noise, schedule, 1, cfg.height, cfg.width)[0]
            return pair, timesteps_to, lat0

        pair, timesteps_to, latents0 = jax.vmap(draw)(keys)
        if cfg.share_warmup:
            # ONE pair per step (drawn from the first sample's key) — the
            # shared chain needs one warm-up context; teacher/student below
            # still run per-sample at each sample's own t_k
            pair = jnp.broadcast_to(pair[:1], pair.shape)
        tids = None
        if is_xl and cfg.dynamic_crops:
            # identical per-sample derivation to warm_draw (fold_in(key, 7)),
            # so fused and vmap paths draw the same crops
            tids = jax.vmap(
                lambda k: draw_time_ids(jax.random.fold_in(k, 7), cfg.height, cfg.width)[0]
            )(keys)  # [S, 6]
        if cfg.shard_samples:

            latents0 = jax.lax.with_sharding_constraint(latents0, cfg.data_spec())

        text = bank.text[pair]  # [S, 5, seq, D]
        pooled = bank.pooled[pair] if bank.pooled is not None else None
        g_pair = bank.guidance[pair].reshape(S, 1, 1, 1)
        sign = bank.sign[pair].reshape(S, 1, 1, 1)

        def cfg_rows(role):
            if not use_cfg:
                return text[:, role]
            return jnp.concatenate([text[:, ROLE_UNCOND], text[:, role]], axis=0)

        def xl_kwargs(role):
            if not is_xl:
                return None
            tids_s = jnp.broadcast_to(add_time_ids if tids is None else tids, (S, 6))
            if not use_cfg:
                return {
                    "text_embeds": pooled[:, role],
                    "time_ids": tids_s,
                }
            return {
                "text_embeds": jnp.concatenate([pooled[:, ROLE_UNCOND], pooled[:, role]], axis=0),
                "time_ids": jnp.tile(tids_s, (2, 1)),
            }

        w_apply, w_params = _warmup_apply_params(base_params, lora_params, warm_params)
        if cfg.share_warmup:
            # one batch-1 chain (sample 0's latent/context/crop), per-sample
            # trajectory snapshots at each t_k
            warm_rows = (
                text[:1, ROLE_TARGET]
                if not use_cfg
                else jnp.concatenate([text[:1, ROLE_UNCOND], text[:1, ROLE_TARGET]], axis=0)
            )
            warm_kw = None
            if is_xl:
                tids_1 = jnp.broadcast_to(add_time_ids if tids is None else tids[:1], (1, 6))
                warm_kw = (
                    {"text_embeds": pooled[:1, ROLE_TARGET], "time_ids": tids_1}
                    if not use_cfg
                    else {
                        "text_embeds": jnp.concatenate(
                            [pooled[:1, ROLE_UNCOND], pooled[:1, ROLE_TARGET]], axis=0
                        ),
                        "time_ids": jnp.tile(tids_1, (2, 1)),
                    }
                )
            denoised = denoise_shared_snapshots(
                w_apply,
                w_params,
                scheduler,
                schedule,
                latents0[:1],
                warm_rows,
                k_loop,
                total_steps=timesteps_to,
                guidance_scale=cfg.train_cfg_scale,
                added_cond_kwargs=warm_kw,
            )
            if cfg.shard_samples:
                denoised = jax.lax.with_sharding_constraint(denoised, cfg.data_spec())
        else:
            denoised = denoise_partial_per_row(
                w_apply,
                w_params,
                scheduler,
                schedule,
                latents0,
                cfg_rows(ROLE_TARGET),
                k_loop,
                total_steps=timesteps_to,
                guidance_scale=cfg.train_cfg_scale,
                added_cond_kwargs=xl_kwargs(ROLE_TARGET),
            )
        denoised = jax.lax.stop_gradient(denoised)
        current_t = current_train_timestep(
            timesteps_to, cfg.max_denoising_steps, cfg.num_train_timesteps
        )  # [S]

        return teacher_and_loss(
            base_params,
            denoised,
            current_t,
            lambda r: text[:, r],
            (lambda r: pooled[:, r]) if is_xl else None,
            cfg_rows,
            xl_kwargs,
            g_pair,
            sign,
            tids=tids,
        )

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def train_step(base_params, lora_params, opt_state, key, bank: PromptBank, warm_params=None):
        # base_params flow through the jit signature — closure capture would
        # bake the frozen UNet (GBs) into the executable as constants.
        # lora_params/opt_state are donated: they're replaced every step and
        # the SDXL step runs within ~13MB of v5e HBM. warm_params (dual-tree
        # int8 warm-up copy) rides the same rule.
        if cfg.samples_per_step == 1:
            loss_fn = one_sample(base_params, lora_params, key, bank, warm_params)
            loss, grads = jax.value_and_grad(loss_fn)(lora_params)
        elif cfg.fuse_samples and cfg.batch_size == 1:
            keys = jax.random.split(key, cfg.samples_per_step)
            loss_fn = fused_samples_loss(
                base_params, lora_params, keys, jax.random.fold_in(key, 1), bank, warm_params
            )
            loss, grads = jax.value_and_grad(loss_fn)(lora_params)
        else:
            keys = jax.random.split(key, cfg.samples_per_step)
            if cfg.shard_samples:
                # pin the independent samples to the mesh data axis so XLA
                # partitions the vmapped UNet work per chip and inserts the
                # gradient all-reduce (SURVEY §2.2 DP plan)

                keys = jax.lax.with_sharding_constraint(keys, cfg.data_spec())

            def per_sample_loss(lp, k):
                return one_sample(base_params, lp, k, bank, warm_params)(lp)

            def mean_loss(lp):
                losses = jax.vmap(lambda k: per_sample_loss(lp, k))(keys)
                if cfg.shard_samples:

                    losses = jax.lax.with_sharding_constraint(losses, cfg.data_spec())
                return jnp.mean(losses)

            loss, grads = jax.value_and_grad(mean_loss)(lora_params)

        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        gnorm = optax.global_norm(grads)
        return lora_params, opt_state, {"loss": loss, "grad_norm": gnorm}

    if cfg.pipeline_warmup:
        if cfg.samples_per_step != 1:
            raise ValueError("pipeline_warmup supports samples_per_step == 1 only")

        @jax.jit
        def init_carry(base_params, lora_params, key, bank: PromptBank, warm_params=None):
            return warm_draw(base_params, lora_params, key, bank, warm_params)

        @functools.partial(jax.jit, donate_argnums=(1, 2, 5))
        def train_step_pipelined(
            base_params, lora_params, opt_state, key_next, bank, carry, warm_params=None
        ):
            # the grad path reads `carry` (drawn last step); the next warm-up
            # reads the PRE-update lora_params — independent subgraphs, so
            # the scheduler may overlap the warm-up chain with the backward
            loss_fn = _sample_tail(base_params, carry, bank)
            loss, grads = jax.value_and_grad(loss_fn)(lora_params)
            new_carry = warm_draw(base_params, lora_params, key_next, bank, warm_params)
            updates, opt_state = optimizer.update(grads, opt_state, lora_params)
            lora_params = optax.apply_updates(lora_params, updates)
            gnorm = optax.global_norm(grads)
            return lora_params, opt_state, {"loss": loss, "grad_norm": gnorm}, new_carry

        _init_carry_fn = init_carry

        class _PipelinedStep:
            """callable step + .init_carry (jit objects reject attributes)"""

            init_carry = staticmethod(_init_carry_fn)

            def __call__(self, *args):
                return train_step_pipelined(*args)

        return _PipelinedStep()

    return train_step
