"""Benchmark: textual-slider ESD training steps/sec on one chip.

BENCH_MODEL=sdxl (default) | sd15 (DDIM-50 budget) | sd3 (SD3-Medium MMDiT) |
cascade (Stage-C prior) | imgslider / imgslider-xl (image-pair ±s step) | tiny.

Prints ONE JSON line:
  {"metric": "sdxl_esd_train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R}

Baseline: the reference publishes no numbers (BASELINE.md). The north-star
budget is a 500-iteration SDXL rank-4 slider in <=10 min on v5e-8, i.e.
0.833 steps/s fleet-wide => 0.104 steps/s/chip. vs_baseline is measured
steps/s (single chip) divided by 0.104.

Config mirrors the reference SDXL training budget (data/config-xl.yaml:11-19):
euler_a, max_denoising_steps 12, batch 1, 512px, bf16, rank 4 — random-init
weights (no pretrained assets in this environment; identical FLOPs/graph).

Env overrides: BENCH_MODEL=tiny|sdxl (default sdxl), BENCH_STEPS, BENCH_RES.
"""

from __future__ import annotations

import json
import os
import sys
import time

# same persistent cache as the package default (sliders_conceptmod_tpu/__init__.py)
# so bench compiles and CLI compiles share executables
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sliders_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC_PER_CHIP = 500 / 600 / 8  # north-star v5e-8 budget


def quant_mode() -> str:
    """BENCH_QUANT: '0' off, '1' int8 frozen base (weight-only), 'w8a8'
    weight + per-token dynamic int8 activations (inference benches only —
    the int8×int8 MXU path, adapters/quant.py), 'w8a8-dual' the dual-tree
    train route (bf16 base for teacher/student + a separate int8 copy with
    act-quant for the warm-up chain only — tpu.w8a8_warmup without
    quantize_base)."""
    v = os.environ.get("BENCH_QUANT", "0").lower()
    if v in ("0", "", "off"):
        return "off"
    if v == "w8a8":
        return "w8a8"
    if v == "w8a8-dual":
        if os.environ.get("BENCH_MODEL", "sdxl") not in (
            "sdxl", "sd15", "tiny", "sd3", "cascade"
        ) or os.environ.get("BENCH_MODE", "train") != "train":
            raise SystemExit(
                "BENCH_QUANT=w8a8-dual is an SD1/SDXL/SD3/Cascade TRAIN mode "
                "(int8 base wins outright on Flux and at inference — use BENCH_QUANT=w8a8)"
            )
        return "w8a8-dual"
    return "w8"


def device_peak_flops():
    """bf16 peak FLOP/s of device 0, or None off-TPU (MFU meaningless on CPU).

    Override with BENCH_PEAK_TFLOPS for new device kinds.
    """
    if os.environ.get("BENCH_PEAK_TFLOPS"):
        return float(os.environ["BENCH_PEAK_TFLOPS"]) * 1e12
    d = jax.devices()[0]
    if d.platform != "tpu":
        return None
    kind = d.device_kind.lower()
    for pat, peak in (
        ("v5 lite", 197e12),
        ("v5litepod", 197e12),
        ("v5e", 197e12),
        ("v6", 918e12),
        ("v5p", 459e12),
        ("v5", 197e12),
        ("v4", 275e12),
    ):
        if pat in kind:
            return peak
    return None


def fwd_flops(fn, *args, **kwargs):
    """Analytic FLOPs of one forward via XLA HLO cost analysis (client-side
    lowering only — no device compile). Dots count 2·M·N·K regardless of
    dtype, which is exactly the numerator MFU wants.

    The axon TPU client exposes no client-side HLO cost analysis
    (Lowered.cost_analysis() → None there), so fall back to lowering the same
    function for the host CPU backend with *abstract* inputs — the HLO (and
    its flop count) is identical and nothing touches the device."""

    def _extract(ca):
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0)) if ca else 0.0
        return f if f > 0 else None

    debug = os.environ.get("BENCH_DEBUG_FLOPS") == "1"
    # analytic lowering must take the XLA attention path: Pallas kernels are
    # opaque to HLO cost analysis (their flops vanish from the count) and the
    # flash kernel doesn't lower for CPU at all. Same math, same flop count.
    from sliders_conceptmod_tpu.ops import attention as _attn

    saved = _attn._FLASH_DISABLED
    _attn._FLASH_DISABLED = True
    try:
        try:
            f = _extract(jax.jit(fn).lower(*args, **kwargs).cost_analysis())
            if f:
                return f
        except Exception as e:
            if debug:
                import traceback

                print(f"# fwd_flops default-backend failed: {e!r}", file=sys.stderr)
                traceback.print_exc()
        try:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), (args, kwargs)
            )
            a_args, a_kwargs = abstract
            return _extract(
                jax.jit(fn, backend="cpu").lower(*a_args, **a_kwargs).cost_analysis()
            )
        except Exception as e:
            if debug:
                import traceback

                print(f"# fwd_flops cpu-backend fallback failed: {e!r}", file=sys.stderr)
                traceback.print_exc()
            return None
    finally:
        _attn._FLASH_DISABLED = saved


def esd_step_flops(f_row, warm_iters, use_cfg, b=1, samples=1, teacher_extra=0):
    """Analytic FLOPs of one ESD train step from the single-row forward cost.

    Structure (train/esd.py): warm_iters warm-up forwards (CFG-doubled rows
    when guidance≠1) + one teacher call (3 branch rows, +1 shared-uncond row
    under CFG) + one student forward whose backward costs ~2× the forward.
    ``warm_iters`` carries the trip-count expectation: T/2 for the uniform
    [1,T) draw (esd.py), T−1 fixed for cascade.
    """
    cfg_mul = 2 if use_cfg else 1
    rows = warm_iters * cfg_mul + (3 + (1 if use_cfg else 0) + teacher_extra) + 3 * cfg_mul
    return f_row * rows * b * samples


def emit(metric, value, unit, vs_baseline, flops_per_unit=None, rate=None, extra=None):
    """The driver-facing JSON line, plus MFU when analytic FLOPs are known."""
    line = {
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": vs_baseline,
    }
    peak = device_peak_flops()
    if flops_per_unit:
        line["analytic_tflops_per_step"] = round(flops_per_unit / 1e12, 3)
        if peak and rate:
            line["mfu"] = round(flops_per_unit * rate / peak, 4)
    if extra:
        line.update(extra)
    print(json.dumps(line))


def bench_sd3(n_steps, res, dtype):
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
    from sliders_conceptmod_tpu.train import esd, esd_sd3
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    cfg = MMDiTConfig.sd3_medium()
    model = SD3Transformer2DModel(cfg, dtype=dtype)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, res // 8, res // 8), dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, 154, cfg.joint_attention_dim), dtype),
            jnp.zeros((1, cfg.pooled_projection_dim), dtype),
        )
    )
    # BENCH_QUANT on SD3 mirrors the SDXL train A/B: int8 frozen MMDiT base
    # (tpu.quantize_base, student through the overlay) and BENCH_QUANT=w8a8
    # additionally runs the gradient-stopped 28-step flow warm-up chain with
    # int8 activations (tpu.w8a8_warmup → esd_sd3 warm_apply)
    qmode = quant_mode()
    warm_apply = None
    warm_params = None
    if qmode in ("w8", "w8a8"):
        from sliders_conceptmod_tpu.adapters import quant

        params, q_scales = quant.weightless_quantized(shapes["params"], dtype=dtype)

        def wrap(m, act=False):
            def apply(p, *a, **kw):
                with quant.quant_overlay(q_scales, compute_dtype=dtype, act_quant=act):
                    return m.apply({"params": p}, *a, **kw)

            return apply

        apply = wrap(model)
        if qmode == "w8a8":
            warm_apply = wrap(model, act=True)
    else:
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

        def wrap(m, act=False):
            def apply(p, *a, **kw):
                return m.apply({"params": p}, *a, **kw)

            return apply

        apply = wrap(model)

        if qmode == "w8a8-dual":
            # dual-tree: the bf16 base above keeps the exact teacher/student
            # paths; a one-time int8 copy (+act-quant) feeds ONLY the 28-step
            # flow warm-up (tpu.w8a8_warmup without quantize_base — the
            # numerics-preserving form of SD3's +23% w8a8 warm-up lever)
            from sliders_conceptmod_tpu.adapters import quant

            warm_params, wq_scales = quant.quantize_params(params)

            def warm_apply(p, *a, **kw):
                with quant.quant_overlay(wq_scales, compute_dtype=dtype, act_quant=True):
                    return model.apply({"params": p}, *a, **kw)

    # BENCH_PEFT=dora (VERDICT r3 task 7): DoRA on the MMDiT — must MERGE
    # (the magnitude decomposition needs the full-precision merged tree), so
    # it forces the merged-student path and refuses a quantized base
    peft = os.environ.get("BENCH_PEFT", "lora")
    merge_fn = None
    if peft == "dora":
        if qmode != "off":
            raise SystemExit("BENCH_PEFT=dora needs a full-precision base (BENCH_QUANT=0)")
        from sliders_conceptmod_tpu.adapters import dora as dora_mod

        sites = dora_mod.create_sites(params, rank=4, alpha=1.0, train_method="full", delimiter="-")
        lora_params = dora_mod.init_lora_params(
            jax.random.PRNGKey(1), sites, base_params=params, dtype=jnp.float32
        )
        merge_fn = dora_mod.merge_lora_params
    else:
        sites = lora_lib.create_sites(params, rank=4, train_method="full", delimiter="-")
        lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    schedule = FlowMatchScheduler(shift=3.0).set_timesteps(28)

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        return (
            jax.random.normal(k, (154, cfg.joint_attention_dim), dtype) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 1), (cfg.pooled_projection_dim,), dtype) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=res)], encode_fn)
    # BENCH_SAMPLES>1 (+BENCH_SHARE_WARMUP=1): DP samples per step, optionally
    # under the shared-prefix warm-up (tpu.share_warmup, r5) — SD3's 28-step
    # flow warm-up is the largest warm-up share of any family, so this is the
    # VERDICT r4 task-1 A/B
    samples = int(os.environ.get("BENCH_SAMPLES", "1"))
    share = os.environ.get("BENCH_SHARE_WARMUP", "0") == "1" and samples > 1
    scfg = esd_sd3.SD3ESDConfig(
        max_denoising_steps=28, height=res, width=res, remat=True,
        samples_per_step=samples, share_warmup=share,
    )
    opt = get_optimizer("adamw", get_lr_schedule("cosine", 1e-4, 50, 1e-6), weight_decay=1e-6, grad_clip_norm=0.2)
    remat_apply = wrap(model.clone(remat_blocks=True))

    # BENCH_OVERLAY on SD3 mirrors the SDXL train A/B. Default "2" (overlay
    # student + merged warm-up) — the measured winner (+4.3%, BASELINE.md r3
    # SD3 overlay A/B) and the trainer default; "0" forces the merged-student
    # control, "1" overlays the warm-up too. Implied over int8.
    sd3_overlay = os.environ.get("BENCH_OVERLAY", "2" if peft == "lora" else "0")
    step = esd_sd3.make_sd3_esd_train_step(
        apply, sites, schedule, opt, scfg, remat_apply=remat_apply, merge_fn=merge_fn,
        student_overlay=(qmode != "off") or sd3_overlay in ("1", "2"),
        overlay_warmup=(False if qmode == "off" and sd3_overlay == "2" else None),
        warm_apply=warm_apply,
    )
    opt_state = opt.init(lora_params)

    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank, warm_params)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank, warm_params)
    jax.block_until_ready(metrics["loss"])
    sps = n_steps / (time.time() - t0)
    f_row = fwd_flops(
        apply,
        params,
        jnp.zeros((1, 16, res // 8, res // 8), dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, 154, cfg.joint_attention_dim), dtype),
        jnp.zeros((1, cfg.pooled_projection_dim), dtype),
    )
    # suffix only the deviations from the bf16 default (overlay "2")
    metric = "sd3_esd_train_steps_per_sec"
    if samples > 1:
        metric += f"_x{samples}samples"
    if share:
        metric += "_sharedwarm"
    if qmode == "w8a8-dual":
        metric += "_dualtree_w8a8warm"
    elif qmode != "off":
        metric += "_int8base" if qmode == "w8" else "_int8base_w8a8warm"
    elif sd3_overlay == "0":
        metric += "_mergedstudent"
    elif sd3_overlay == "1":
        metric += "_overlay_student"
    if f_row and share:
        # one shared chain of E[max of S U{1..27} draws] ≈ 27·S/(S+1) flow
        # steps replaces the S per-sample chains; tails still run per sample
        flops = f_row * 27 * samples / (samples + 1) + esd_step_flops(
            f_row, warm_iters=0, use_cfg=False, samples=samples
        )
    else:
        flops = (
            esd_step_flops(f_row, warm_iters=28 / 2, use_cfg=False, samples=samples)
            if f_row
            else None
        )
    emit(
        metric,
        sps,
        "steps/s",
        round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
        flops_per_unit=flops,
        rate=sps,
    )


def bench_cascade(n_steps, res, dtype):
    """Stable Cascade Stage-C prior (3.6B) ESD step — reference budget
    (data/config-cascade.yaml: euler_a, 20 denoising steps; prompts at
    512px → 12×12 effnet latents)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet
    from sliders_conceptmod_tpu.train import esd, esd_cascade
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    cfg = CascadeConfig.prior()
    model = StableCascadeUNet(cfg, dtype=dtype)
    lat = max(1, round(res / cfg.resolution_multiple))
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.in_channels, lat, lat), dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.clip_text_in_channels), dtype),
            jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels), dtype),
            jnp.zeros((1, 1, cfg.clip_image_in_channels), dtype),
        )
    )
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

    def apply(p, *a, **kw):
        return model.apply({"params": p}, *a, **kw)

    # BENCH_QUANT=w8a8-dual (r5): the dual-tree W8A8 warm-up — the bf16 base
    # keeps teacher/student exact while the fixed 19-step warm-up chain (19
    # of ~21 model evals/step, the largest warm-up share of any family) runs
    # a one-time int8 copy with act-quant (tpu.w8a8_warmup)
    qmode = quant_mode()
    warm_apply = None
    warm_params = None
    if qmode == "w8a8-dual":
        from sliders_conceptmod_tpu.adapters import quant

        warm_params, wq_scales = quant.quantize_params(params)

        def warm_apply(p, *a, **kw):
            with quant.quant_overlay(wq_scales, compute_dtype=dtype, act_quant=True):
                return model.apply({"params": p}, *a, **kw)

    elif qmode != "off":
        raise SystemExit("cascade supports BENCH_QUANT=w8a8-dual only (no int8 base route)")

    sites = lora_lib.create_sites(params, rank=4, train_method="full")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    scheduler = create_noise_scheduler("euler_a")
    schedule = scheduler.set_timesteps(20)

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        return (
            jax.random.normal(k, (77, cfg.clip_text_in_channels), dtype) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 1), (1, cfg.clip_text_pooled_in_channels), dtype) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=res)], encode_fn)
    empty_text, empty_pooled = encode_fn("")
    # BENCH_SAMPLES>1 (+BENCH_SHARE_WARMUP=1): Cascade's warm-up trip count
    # is FIXED at T−1=19 per iteration, so sharing the chain across the DP
    # samples removes (S−1)/S of the dominant per-step cost (r5 A/B)
    samples = int(os.environ.get("BENCH_SAMPLES", "1"))
    share = os.environ.get("BENCH_SHARE_WARMUP", "0") == "1" and samples > 1
    ccfg = esd_cascade.CascadeESDConfig(
        max_denoising_steps=20, height=res, width=res,
        resolution_multiple=cfg.resolution_multiple,
        samples_per_step=samples, share_warmup=share,
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 2e-4, 2000, 2e-6))
    # BENCH_OVERLAY=2: overlay student + merged warm-up (the SD1/XL winner
    # split; cascade's only overlay shape — no quantized base exists here)
    cascade_overlay = os.environ.get("BENCH_OVERLAY", "0") == "2"
    step = esd_cascade.make_cascade_esd_train_step(
        apply, sites, scheduler, schedule, opt, ccfg,
        empty_text=empty_text, empty_pooled=empty_pooled,
        clip_image_dim=cfg.clip_image_in_channels,
        student_overlay=cascade_overlay,
        warm_apply=warm_apply,
        overlay_warmup=qmode == "w8a8-dual",
    )
    opt_state = opt.init(lora_params)

    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank, warm_params)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank, warm_params)
    jax.block_until_ready(metrics["loss"])
    sps = n_steps / (time.time() - t0)
    f_row = fwd_flops(
        apply,
        params,
        jnp.zeros((1, cfg.in_channels, lat, lat), dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.clip_text_in_channels), dtype),
        jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels), dtype),
        jnp.zeros((1, 1, cfg.clip_image_in_channels), dtype),
    )
    metric = "cascade_esd_train_steps_per_sec"
    if samples > 1:
        metric += f"_x{samples}samples"
    if share:
        metric += "_sharedwarm"
    if qmode == "w8a8-dual":
        metric += "_dualtree_w8a8warm"
    if cascade_overlay:
        metric += "_overlay_student_mergedwarm"
    if f_row and share:
        # ONE 19-step CFG-doubled chain shared by all samples; per-sample tails
        flops = f_row * 19 * 2 + esd_step_flops(
            f_row, warm_iters=0, use_cfg=True, samples=samples
        )
    else:
        # fixed T−1 warm-up (esd_cascade t_to), predict_guidance 4 → CFG rows
        flops = (
            esd_step_flops(f_row, warm_iters=19, use_cfg=True, samples=samples)
            if f_row
            else None
        )
    emit(
        metric,
        sps,
        "steps/s",
        round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
        flops_per_unit=flops,
        rate=sps,
    )


def bench_imageslider(n_steps, xl, dtype):
    """Image-pair (visual) slider step — reference budget
    (trainscripts/imagesliders/data/config.yaml:11-18: DDIM-50, 256px SD1 /
    512px XL, ±s double student pass at CFG guidance 1). Synthetic latent
    bank (the production path pre-encodes the VAE posteriors once, so the
    steady-state step never touches images). BENCH_OVERLAY=1|2 runs the
    fused 2-row overlay call (train/imageslider.py student_overlay);
    default "0" = the reference's two merged ±scale passes."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from sliders_conceptmod_tpu.train import imageslider
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    res = int(os.environ.get("BENCH_RES", "512" if xl else "256"))
    cfg = UNetConfig.sdxl() if xl else UNetConfig.sd15()
    seq, ctx_dim = 77, (2048 if xl else 768)
    model = UNet2DConditionModel(cfg, dtype=dtype)
    lat = res // 8
    added = (
        {
            "text_embeds": jnp.zeros((1, 1280), dtype),
            "time_ids": jnp.zeros((1, 6), jnp.float32),
        }
        if xl
        else None
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, lat, lat), dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, seq, ctx_dim), dtype),
            added_cond_kwargs=added,
        )
    )
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

    def unet_apply(p, sample, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    # reference target_replace: transformer attention modules (rank 4)
    sites = lora_lib.create_sites(params, rank=4, train_method="full")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(50)
    k = jax.random.PRNGKey(2)
    bank = imageslider.ImageBank(
        mean=jax.random.normal(k, (2, 4, 4, lat, lat)) * 0.1,
        logvar=jnp.full((2, 4, 4, lat, lat), -6.0),
        pair_table=jnp.asarray([[0, 1]], jnp.int32),
        pair_scales=jnp.asarray([1.0]),
    )
    emb = {
        n: jax.random.normal(jax.random.fold_in(k, i), (seq, ctx_dim), dtype) * 0.1
        for i, n in enumerate(("positive", "neutral", "uncond"))
    }
    pooled = (
        {n: jax.random.normal(jax.random.fold_in(k, 9 + i), (1280,), dtype) * 0.1
         for i, n in enumerate(("positive", "neutral", "uncond"))}
        if xl
        else None
    )
    overlay = os.environ.get("BENCH_OVERLAY", "0") in ("1", "2")
    opt = get_optimizer("adamw", get_lr_schedule("constant", 2e-4, 1000))
    step = imageslider.make_image_slider_step(
        unet_apply, sites, scheduler, schedule, opt,
        imageslider.ImageSliderConfig(max_denoising_steps=50),
        positive_emb=emb["positive"], neutral_emb=emb["neutral"], uncond_emb=emb["uncond"],
        pooled=pooled,
        add_time_ids=jnp.asarray(get_add_time_ids(res, res)) if xl else None,
        student_overlay=overlay,
    )
    opt_state = opt.init(lora_params)
    key = jax.random.PRNGKey(0)
    key, kk = jax.random.split(key)
    lora_params, opt_state, metrics = step(params, lora_params, opt_state, kk, bank)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        key, kk = jax.random.split(key)
        lora_params, opt_state, metrics = step(params, lora_params, opt_state, kk, bank)
    jax.block_until_ready(metrics["loss"])
    sps = n_steps / (time.time() - t0)
    f_row = fwd_flops(
        unet_apply,
        params,
        jnp.zeros((1, 4, lat, lat), dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, seq, ctx_dim), dtype),
        added_cond_kwargs=added,
    )
    emit(
        ("imageslider_xl" if xl else "imageslider_sd1")
        + "_train_steps_per_sec"
        + ("_overlay_student" if overlay else ""),
        sps,
        "steps/s",
        round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
        # two student rows, each fwd + ~2× bwd — no warm-up, no teacher
        flops_per_unit=6 * f_row if f_row else None,
        rate=sps,
    )


def bench_flux(n_steps, res, dtype):
    """Flux-schnell ESD step at REDUCED depth with the real block structure
    (VERDICT r1 item 7): full-scale schnell is 23.8 GB bf16 — beyond one v5e
    (16 GB HBM) — so the single-chip evidence is a depth-reduced model with
    identical dual/single-stream blocks (3072 inner, 24 heads, RoPE) plus an
    analytic projection to full depth via the HLO flop ratio. Full-depth runs
    take the TP path (BENCH_FLUX_LAYERS=19 BENCH_FLUX_SINGLE_LAYERS=38 on a
    mesh; __graft_entry__ validates the sharded step).
    """
    import dataclasses

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
    from sliders_conceptmod_tpu.models.flux import FluxConfig, FluxTransformer2DModel
    from sliders_conceptmod_tpu.train import esd, esd_flux
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    # BENCH_QUANT=1: int8-quantized frozen base (adapters/quant.py) — full
    # depth fits one v5e (11.9 GB int8 vs 23.8 GB bf16), so default to the
    # REAL schnell depth and measure it directly instead of projecting.
    # (Training path: always weight-only — activation rounding has zero
    # gradient, so 'w8a8' degrades to 'w8' here.)
    quantized = quant_mode() != "off"
    layers = int(os.environ.get("BENCH_FLUX_LAYERS", "19" if quantized else "5"))
    single = int(os.environ.get("BENCH_FLUX_SINGLE_LAYERS", "38" if quantized else "10"))
    full_cfg = FluxConfig.schnell()
    cfg = dataclasses.replace(full_cfg, num_layers=layers, num_single_layers=single)
    model = FluxTransformer2DModel(cfg, dtype=dtype)

    gh = gw = res // 8 // 2
    s_img, s_txt = gh * gw, 512
    sample_args = lambda c: (
        jnp.zeros((1, s_img, c.in_channels), dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, s_txt, c.joint_attention_dim), dtype),
        jnp.zeros((1, c.pooled_projection_dim), dtype),
        jnp.zeros((s_txt, 3)),
        jnp.zeros((s_img, 3)),
    )
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *sample_args(cfg)))
    if quantized:
        from sliders_conceptmod_tpu.adapters import quant

        params, scales = quant.weightless_quantized(shapes["params"], dtype=dtype)
        apply = quant.make_quant_apply(model, scales, compute_dtype=dtype)
    else:
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

        def apply(p, *a, **kw):
            return model.apply({"params": p}, *a, **kw)

    sites = lora_lib.create_sites(params, rank=4, train_method="full", delimiter="-")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    schedule = FlowMatchScheduler().set_timesteps(8, mu=calculate_shift(s_img))

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        return (
            jax.random.normal(k, (s_txt, cfg.joint_attention_dim), dtype) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 1), (cfg.pooled_projection_dim,), dtype) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=res)], encode_fn)
    fcfg = esd_flux.FluxESDConfig(height=res, width=res, latent_channels=cfg.in_channels // 4)
    opt = get_optimizer(
        "adamw", get_lr_schedule("cosine", 1e-4, 50, 1e-6), weight_decay=1e-6, grad_clip_value=1.0
    )
    # per-block remat on the student grad pass: caps fwd+bwd peak HBM at
    # block granularity (models/flux.py) — required for full-depth int8
    # schnell to fit one v5e; equal FLOPs at reduced depth
    model_remat = model.clone(remat_blocks=True)
    if quantized:
        remat_apply = quant.make_quant_apply(model_remat, scales, compute_dtype=dtype)
    else:

        def remat_apply(p, *a, **kw):
            return model_remat.apply({"params": p}, *a, **kw)

    step = esd_flux.make_flux_esd_train_step(
        apply, sites, schedule, opt, fcfg, student_overlay=quantized,
        remat_apply=remat_apply,
    )
    opt_state = opt.init(lora_params)

    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank)
    jax.block_until_ready(metrics["loss"])
    sps = n_steps / (time.time() - t0)

    f_red = fwd_flops(apply, params, *sample_args(cfg))
    full_model = FluxTransformer2DModel(full_cfg, dtype=dtype)
    full_abstract = jax.eval_shape(
        lambda: full_model.init(jax.random.PRNGKey(0), *sample_args(full_cfg))
    )["params"]

    def full_apply(p, *a):
        return full_model.apply({"params": p}, *a)

    f_full = fwd_flops(full_apply, full_abstract, *sample_args(full_cfg))
    extra = {"layers": layers, "single_layers": single, "int8_base": quantized}
    # flux step: no warm-up (timesteps_to=0), 3-row teacher, student fwd+bwd
    step_flops = f_red * 6 if f_red else None
    if f_red and f_full:
        extra["projected_full_depth_steps_per_sec"] = round(sps * f_red / f_full, 4)
        extra["flop_ratio_full_over_reduced"] = round(f_full / f_red, 3)
    emit(
        f"flux_esd_train_steps_per_sec_L{layers}S{single}",
        sps,
        "steps/s",
        round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
        flops_per_unit=step_flops,
        rate=sps,
        extra=extra,
    )


def bench_flux_infer(res, steps, dtype, n_rounds=4):
    """Flux-schnell slider sweep img/s, full depth on ONE chip via the int8
    base (BENCH_QUANT=1) — all 5 slider scales ride ONE batched trajectory
    with the scale as a per-row LoRA-overlay multiplier (the XL
    batched-scales design on the flow sampler). BENCH_QUANT=0 falls back to
    depth-reduced bf16 (full depth does not fit unquantized)."""
    import dataclasses

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
    from sliders_conceptmod_tpu.models.flux import (
        FluxConfig,
        FluxTransformer2DModel,
        pack_latents,
        prepare_latent_image_ids,
    )

    qmode = quant_mode()
    quantized = qmode != "off"
    layers = int(os.environ.get("BENCH_FLUX_LAYERS", "19" if quantized else "5"))
    single = int(os.environ.get("BENCH_FLUX_SINGLE_LAYERS", "38" if quantized else "10"))
    scales = [float(s) for s in os.environ.get("BENCH_SWEEP_SCALES", "-2,-1,0,1,2").split(",")]
    cfg = dataclasses.replace(FluxConfig.schnell(), num_layers=layers, num_single_layers=single)
    model = FluxTransformer2DModel(cfg, dtype=dtype)

    gh = gw = res // 8 // 2
    s_img, s_txt = gh * gw, 512
    b = len(scales)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, s_img, cfg.in_channels), dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, s_txt, cfg.joint_attention_dim), dtype),
            jnp.zeros((1, cfg.pooled_projection_dim), dtype),
            jnp.zeros((s_txt, 3)),
            jnp.zeros((s_img, 3)),
        )
    )
    if quantized:
        from sliders_conceptmod_tpu.adapters import quant

        params, q_scales = quant.weightless_quantized(shapes["params"], dtype=dtype)
        apply = quant.make_quant_apply(
            model, q_scales, compute_dtype=dtype, act_quant=(qmode == "w8a8")
        )
    else:
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

        def apply(p, *a, **kw):
            return model.apply({"params": p}, *a, **kw)

    sites = lora_lib.create_sites(params, rank=4, train_method="full", delimiter="-")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    lora_params = jax.tree.map(lambda a: a + 0.01, lora_params)
    schedule = FlowMatchScheduler().set_timesteps(steps, mu=calculate_shift(s_img))
    img_ids = jnp.asarray(prepare_latent_image_ids(gh, gw))
    row_scale = jnp.asarray(scales, jnp.float32)

    @jax.jit
    def sample(base, lp, tokens, text, pooled):
        txt_ids = jnp.zeros((s_txt, 3))

        def body(i, tok):
            t = jnp.broadcast_to(schedule.timesteps[i] / 1000.0, (b,))
            with lora_lib.lora_overlay(sites, lp, row_scale):
                v = apply(base, tok, t, text, pooled, txt_ids, img_ids)
            return FlowMatchScheduler.step(schedule, v, i, tok)

        return jax.lax.fori_loop(0, schedule.num_inference_steps, body, tokens)

    k = jax.random.PRNGKey(0)
    text = jax.random.normal(k, (b, s_txt, cfg.joint_attention_dim), dtype) * 0.1
    pooled = jax.random.normal(jax.random.fold_in(k, 1), (b, cfg.pooled_projection_dim), dtype) * 0.1
    latents = jax.random.normal(jax.random.fold_in(k, 2), (b, cfg.in_channels // 4, gh * 2, gw * 2))
    tokens = pack_latents(latents).astype(dtype)

    out = sample(params, lora_params, tokens, text, pooled)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_rounds):
        out = sample(params, lora_params, tokens, text, pooled)
    jax.block_until_ready(out)
    ips = n_rounds * b / (time.time() - t0)

    f_fwd = fwd_flops(
        lambda p, tok, t, te, po: apply(p, tok, t, te, po, jnp.zeros((s_txt, 3)), img_ids),
        params,
        tokens,
        jnp.zeros((b,)),
        text,
        pooled,
    )
    emit(
        f"flux_infer_sweep_images_per_sec_L{layers}S{single}",
        ips,
        "img/s",
        0.0,
        # per-IMAGE flops: the batched forward covers b images per call
        flops_per_unit=f_fwd * steps / b if f_fwd else None,
        rate=ips,
        extra={
            "layers": layers,
            "single_layers": single,
            "int8_base": quantized,
            "quant": qmode,
            "scales": len(scales),
            "flow_steps": steps,
        },
    )


def bench_infer(n_images, res, steps, dtype, guidance=7.5, batch=1, sweep_scales=None):
    """DDIM images/sec — the second north-star metric (BASELINE.md targets).

    Mirrors the reference inference sweep protocol
    (eval-scripts/generate_images_xl.py:429-445): 50 steps, CFG 7.5,
    start_noise-flip sampling on SDXL at native 1024px. VAE decode excluded
    (one decode per image amortizes over the 50 UNet steps and the reference
    measures no numbers at all).
    """
    from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise, sample_loop
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.sdxl()
    model = UNet2DConditionModel(cfg, dtype=dtype)
    added = {
        "text_embeds": jnp.zeros((2 * batch, 1280), dtype),
        "time_ids": jnp.tile(jnp.asarray(get_add_time_ids(res, res)), (2 * batch, 1)),
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2 * batch, 4, res // 8, res // 8), dtype),
            jnp.zeros(()),
            jnp.zeros((2 * batch, 77, 2048), dtype),
            added_cond_kwargs=added,
        )
    )
    qmode = quant_mode()
    if qmode != "off":
        # int8 UNet Dense kernels (adapters/quant.py): 2.1 GiB HBM headroom (87% of SDXL params are Dense) —
        # the lever that fits the 5-scale 1024px batched sweep on one v5e.
        # BENCH_QUANT=w8a8 also quantizes activations (int8×int8 MXU path).
        from sliders_conceptmod_tpu.adapters import quant

        params, q_scales = quant.weightless_quantized(shapes["params"], dtype=dtype)

        def unet_apply(p, sample, t, ctx, added_cond_kwargs=None):
            with quant.quant_overlay(q_scales, compute_dtype=dtype, act_quant=(qmode == "w8a8")):
                return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    else:
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

        def unet_apply(p, sample, t, ctx, added_cond_kwargs=None):
            return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(steps)
    flip = flip_step_for_start_noise(schedule, 750.0)

    if sweep_scales is not None:
        # BENCH_SWEEP_SCALES: the full eval scale grid in ONE batched
        # trajectory via the per-row LoRA overlay (sample_loop_scales) —
        # batch dim = S scales (× CFG doubling inside)
        from sliders_conceptmod_tpu.adapters import lora as lora_lib
        from sliders_conceptmod_tpu.infer.generate import sample_loop_scales

        scales_vec = jnp.asarray(sweep_scales, jnp.float32)
        batch = int(scales_vec.shape[0])
        sites = lora_lib.create_sites(
            params, rank=4, alpha=1.0, target_replace=["Attention"], train_method="full"
        )
        lp = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
        lp = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype), lp)
        added = {
            "text_embeds": jnp.zeros((2 * batch, 1280), dtype),
            "time_ids": jnp.tile(jnp.asarray(get_add_time_ids(res, res)), (2 * batch, 1)),
        }
        sweep_emb = jnp.full((2 * batch, 77, 2048), 0.01, dtype)

        @jax.jit
        def run_p(p_, latents, key):
            # params through the SIGNATURE (CLAUDE.md: closure capture bakes
            # 5.1GB of constants into the executable / remote compile)
            return sample_loop_scales(
                unet_apply, p_, sites, lp, scales_vec, flip, scheduler, schedule,
                latents, sweep_emb, key, guidance_scale=guidance, added_cond_kwargs=added,
            )

        def run(latents, key):
            return run_p(params, latents, key)

    else:
        text_emb = jnp.full((2 * batch, 77, 2048), 0.01, dtype)

        @jax.jit
        def run_p(p_, latents, key):
            return sample_loop(
                unet_apply, p_, p_, flip, scheduler, schedule, latents, text_emb,
                key, guidance_scale=guidance, added_cond_kwargs=added,
            )

        def run(latents, key):
            return run_p(params, latents, key)

    lat_shape = (batch, 4, res // 8, res // 8)
    out = run(jnp.zeros(lat_shape, dtype), jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    n_calls = max(n_images // batch, 1)
    t0 = time.time()
    for i in range(n_calls):
        out = run(
            jax.random.normal(jax.random.PRNGKey(i), lat_shape, dtype) * schedule.init_noise_sigma,
            jax.random.PRNGKey(i),
        )
    jax.block_until_ready(out)
    ips = n_calls * batch / (time.time() - t0)
    tag = "" if guidance > 1 else "_noCFG"
    if sweep_scales is not None:
        tag += f"_sweep{batch}scales"
    elif batch > 1:
        tag += f"_b{batch}"
    if qmode != "off":
        tag += "_int8" if qmode == "w8" else "_w8a8"
    f_row = fwd_flops(
        unet_apply,
        params,
        jnp.zeros((1, 4, res // 8, res // 8), dtype),
        jnp.zeros(()),
        jnp.zeros((1, 77, 2048), dtype),
        added_cond_kwargs={
            "text_embeds": jnp.zeros((1, 1280), dtype),
            "time_ids": jnp.zeros((1, 6), jnp.float32),
        },
    )
    rows_per_image = 2 if guidance > 1 else 1
    emit(
        f"sdxl_ddim{steps}_images_per_sec_{res}px{tag}",
        ips,
        "images/s",
        round(ips, 4),
        flops_per_unit=f_row * steps * rows_per_image if f_row else None,
        rate=ips,
    )


def main():
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from sliders_conceptmod_tpu.train import esd
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    model_kind = os.environ.get("BENCH_MODEL", "sdxl")
    # 32 default: at 8 steps the first-dispatch bubble after the warmup block
    # under-measures pipelined throughput (5.58 vs the trainer loop's 5.94)
    n_steps = int(os.environ.get("BENCH_STEPS", "32"))
    samples = int(os.environ.get("BENCH_SAMPLES", "1"))  # DP samples per step
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # per-pair batch size
    res = int(os.environ.get("BENCH_RES", "512"))
    max_denoise = int(os.environ.get("BENCH_DENOISE_STEPS", "12"))
    dtype = jnp.bfloat16

    if model_kind == "sd3":
        import jax.numpy as _jnp

        bench_sd3(n_steps, res, _jnp.bfloat16)
        return
    if model_kind == "cascade":
        bench_cascade(n_steps, res, jnp.bfloat16)
        return
    if model_kind in ("imgslider", "imgslider-xl"):
        bench_imageslider(n_steps, model_kind.endswith("xl"), jnp.bfloat16)
        return
    if model_kind == "flux":
        if os.environ.get("BENCH_MODE") == "infer":
            bench_flux_infer(
                res, int(os.environ.get("BENCH_DDIM_STEPS", "8")), jnp.bfloat16
            )
        else:
            bench_flux(n_steps, res, jnp.bfloat16)
        return
    if os.environ.get("BENCH_MODE") == "infer":
        bench_infer(
            n_images=int(os.environ.get("BENCH_IMAGES", "4")),
            res=int(os.environ.get("BENCH_RES", "1024")),
            steps=int(os.environ.get("BENCH_DDIM_STEPS", "50")),
            dtype=dtype,
            guidance=float(os.environ.get("BENCH_GUIDANCE", "7.5")),
            batch=int(os.environ.get("BENCH_IMG_BATCH", "1")),
            sweep_scales=(
                [float(s) for s in os.environ["BENCH_SWEEP_SCALES"].split(",")]
                if os.environ.get("BENCH_SWEEP_SCALES")
                else None
            ),
        )
        return
    if model_kind == "tiny":
        cfg = UNetConfig.tiny_xl()
        res, seq, ctx_dim, pooled_dim, max_denoise = 64, 7, 32, 32, 3
    elif model_kind == "sd15":
        # reference SD1.x budget: DDIM-50, 512px (data/config.yaml:11-19)
        cfg = UNetConfig.sd15()
        seq, ctx_dim, pooled_dim = 77, 768, None
        max_denoise = int(os.environ.get("BENCH_DENOISE_STEPS", "50"))
    else:
        cfg = UNetConfig.sdxl()
        seq, ctx_dim, pooled_dim = 77, 2048, 1280

    model = UNet2DConditionModel(cfg, dtype=dtype)
    added = (
        None
        if pooled_dim is None
        else {
            "text_embeds": jnp.zeros((1, pooled_dim), dtype),
            "time_ids": jnp.zeros((1, 6), jnp.float32),
        }
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, res // 8, res // 8), dtype),
            jnp.zeros((1,)),
            jnp.zeros((1, seq, ctx_dim), dtype),
            added_cond_kwargs=added,
        )
    )
    # random-ish deterministic params without per-leaf RNG compile cost.
    # Stored in bf16 (the reference casts the whole model to the train
    # precision, train_lora_xl.py:82) — fp32 storage alone overflows v5e HBM.
    # BENCH_QUANT=1: int8 UNet Dense kernels — the ESD step is weight-
    # streaming bound (BASELINE.md phase table), so halving the streamed
    # bytes on the Dense majority (87% of SDXL params) is a train-perf A/B.
    # Student through the overlay (ESDConfig.student_overlay), matching the
    # tpu.quantize_base trainer path. BENCH_QUANT=w8a8 additionally runs the
    # GRADIENT-STOPPED warm-up chain with int8 activations (int8×int8 MXU at
    # 2× bf16 — tpu.w8a8_warmup); teacher/student stay weight-only.
    qmode = quant_mode()
    warm_apply = None
    warm_tree = None
    if qmode in ("w8", "w8a8"):
        from sliders_conceptmod_tpu.adapters import quant

        params, q_scales = quant.weightless_quantized(shapes["params"], dtype=dtype)

        def unet_apply(p, sample, t, ctx, added_cond_kwargs=None):
            with quant.quant_overlay(q_scales, compute_dtype=dtype):
                return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

        if qmode == "w8a8":

            def warm_apply(p, sample, t, ctx, added_cond_kwargs=None):
                with quant.quant_overlay(q_scales, compute_dtype=dtype, act_quant=True):
                    return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    else:
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), shapes)["params"]

        def unet_apply(p, sample, t, ctx, added_cond_kwargs=None):
            return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

        if qmode == "w8a8-dual":
            # dual-tree: bf16 base above stays the teacher/student path; a
            # one-time int8 copy (+act-quant) serves only the warm-up chain
            # (tpu.w8a8_warmup without quantize_base, train/trainer.py)
            from sliders_conceptmod_tpu.adapters import quant

            warm_tree, q_scales = quant.quantize_params(params)

            def warm_apply(p, sample, t, ctx, added_cond_kwargs=None):
                with quant.quant_overlay(q_scales, compute_dtype=dtype, act_quant=True):
                    return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    peft = os.environ.get("BENCH_PEFT", "lora")
    if peft == "dora" and qmode != "off":
        raise SystemExit("BENCH_QUANT needs full-precision base magnitudes — BENCH_PEFT=lora only")
    if peft == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod

        sites = peft_mod.create_sites(params, rank=4, alpha=1.0, train_method="full")
        lora_params = peft_mod.init_lora_params(
            jax.random.PRNGKey(1), sites, base_params=params, dtype=jnp.float32
        )
        merge_fn = peft_mod.merge_lora_params
    else:
        sites = lora_lib.create_sites(params, rank=4, alpha=1.0, train_method="full")
        lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites, dtype=jnp.float32)
        merge_fn = None

    # reference budgets: SDXL euler_a/12 (config-xl.yaml), SD1.x DDIM-50 (config.yaml)
    scheduler = create_noise_scheduler("ddim" if model_kind == "sd15" else "euler_a")
    schedule = scheduler.set_timesteps(max_denoise)

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        pooled = (
            None
            if pooled_dim is None
            else jax.random.normal(jax.random.fold_in(k, 1), (pooled_dim,), dtype) * 0.1
        )
        return jax.random.normal(k, (seq, ctx_dim), dtype) * 0.1, pooled

    settings = [PromptSettings(target="person", positive="old person", resolution=res, batch_size=batch)]
    bank = esd.build_prompt_bank(settings, encode_fn)

    pipeline = os.environ.get("BENCH_PIPELINE", "0") == "1"
    # bf16 LoRA default = "2" (overlay student + merged warm-up, the measured
    # winner); DoRA must merge (norm decomposition), so its default is "0"
    overlay_mode = os.environ.get("BENCH_OVERLAY", "2" if peft == "lora" else "0")
    ecfg = esd.ESDConfig(
        max_denoising_steps=max_denoise,
        train_cfg_scale=float(os.environ.get("BENCH_CFG", "1.0")),
        batch_size=batch,
        height=res,
        width=res,
        samples_per_step=samples,
        remat_unet=os.environ.get("BENCH_REMAT", "1" if res > 512 else "0") == "1",
        pipeline_warmup=pipeline,
        fuse_teacher_student=os.environ.get("BENCH_FUSE_TS", "0") == "1",
        # BENCH_OVERLAY=1: overlay student on the bf16 base — skips the dense
        # dL/dW' weight-grad matmuls of the merged path (grads reach the
        # rank-4 factors through the overlay's own product), an A/B for the
        # student backward's 84 ms true latency (phase table: ~3x fwd FLOPs
        # merged vs ~2x overlaid). Implied whenever the base is quantized.
        # BENCH_OVERLAY=2: same, but the warm-up chain keeps the merged tree
        # (no per-site interceptors on the latency-bound chain) — the
        # measured winner (BASELINE.md r3 overlay A/B) and therefore the
        # DEFAULT for bf16 LoRA, matching the trainer default
        # (core/config.resolve_student_overlay). BENCH_OVERLAY=0 forces the
        # merged-student control.
        student_overlay=(qmode != "off") or overlay_mode in ("1", "2"),
        overlay_warmup=(False if qmode == "off" and overlay_mode == "2" else None),
        # BENCH_SHARE_WARMUP=1 (+BENCH_SAMPLES>1): shared-prefix warm-up A/B
        # (VERDICT r3 task 4) — one batch-1 chain to max(t_k), per-sample
        # trajectory snapshots; warm-up cost independent of samples_per_step
        share_warmup=os.environ.get("BENCH_SHARE_WARMUP", "0") == "1" and samples > 1,
    )
    opt = get_optimizer(
        "adamw", get_lr_schedule("cosine", 1e-4, 50, 1e-6), weight_decay=1e-6, grad_clip_norm=0.2
    )
    step = esd.make_esd_train_step(
        unet_apply,
        sites,
        scheduler,
        schedule,
        opt,
        ecfg,
        add_time_ids=None if pooled_dim is None else jnp.asarray(get_add_time_ids(res, res)),
        merge_fn=merge_fn,
        warm_apply=warm_apply,
    )
    opt_state = opt.init(lora_params)

    key = jax.random.PRNGKey(0)
    # compile + warmup step (the reference timesteps_to draw makes step cost
    # stochastic; warmup once, then time a fixed batch of steps)
    key, k = jax.random.split(key)
    if pipeline:
        carry = step.init_carry(params, lora_params, k, bank, warm_tree)
        key, k = jax.random.split(key)
        lora_params, opt_state, metrics, carry = step(
            params, lora_params, opt_state, k, bank, carry, warm_tree
        )
    else:
        lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank, warm_tree)
    jax.block_until_ready(metrics["loss"])

    t0 = time.time()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        if pipeline:
            lora_params, opt_state, metrics, carry = step(
                params, lora_params, opt_state, k, bank, carry, warm_tree
            )
        else:
            lora_params, opt_state, metrics = step(params, lora_params, opt_state, k, bank, warm_tree)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.time() - t0

    sps = n_steps / elapsed
    family = "sd15" if model_kind == "sd15" else "sdxl"
    metric = f"{family}_esd_train_steps_per_sec"
    if samples > 1:
        metric += f"_x{samples}samples"
    if ecfg.share_warmup:
        metric += "_sharedwarm"
    if batch > 1:
        metric += f"_b{batch}"
    if pipeline:
        metric += "_pipelined"
    if qmode == "w8":
        metric += "_int8base"
    elif qmode == "w8a8":
        metric += "_int8base_w8a8warm"
    elif qmode == "w8a8-dual":
        metric += "_dualtree_w8a8warm"
    if peft != "lora":
        metric += f"_{peft}"
    # suffix only the deviations from the bf16-LoRA default (overlay_mode 2)
    if qmode == "off" and peft == "lora" and overlay_mode == "0":
        metric += "_mergedstudent"
    elif qmode == "off" and overlay_mode == "1":
        metric += "_overlay_student"
    if os.environ.get("BENCH_FUSE_TS", "0") == "1":
        metric += "_fusedTS"
    f_row = fwd_flops(
        unet_apply,
        params,
        jnp.zeros((1, 4, res // 8, res // 8), dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, seq, ctx_dim), dtype),
        added_cond_kwargs=None
        if pooled_dim is None
        else {
            "text_embeds": jnp.zeros((1, pooled_dim), dtype),
            "time_ids": jnp.zeros((1, 6), jnp.float32),
        },
    )
    use_cfg = float(os.environ.get("BENCH_CFG", "1.0")) != 1.0
    if f_row and ecfg.share_warmup:
        # shared-prefix warm-up: ONE batch-1 chain of E[max of S U{1..T-1}
        # draws] ≈ (T-1)·S/(S+1) iterations replaces the S per-sample chains;
        # teacher/student still run per sample
        warm = f_row * (max_denoise - 1) * samples / (samples + 1) * (2 if use_cfg else 1) * batch
        flops = warm + esd_step_flops(f_row, warm_iters=0, use_cfg=use_cfg, b=batch, samples=samples)
    else:
        flops = (
            esd_step_flops(f_row, warm_iters=max_denoise / 2, use_cfg=use_cfg, b=batch, samples=samples)
            if f_row
            else None
        )
    emit(
        metric,
        sps,
        "steps/s",
        round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
        flops_per_unit=flops,
        rate=sps,
    )


if __name__ == "__main__":
    main()
