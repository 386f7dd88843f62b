"""Int8-quantized frozen base (adapters/quant.py) — the QLoRA-style path that
fits full-depth Flux-schnell (23.8 GB bf16 → 11.9 GB int8) on one v5e.

Covers: symmetric per-column quantization error bound, dequant-at-use
interceptor vs the plain Dense, composition with the LoRA overlay
(lora outermost, quant innermost), and the full Flux ESD train step over a
quantized base (student via lora_overlay, ``student_overlay=True``).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.adapters import quant


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 1024), jnp.float32) * 0.05
    q, scale = quant.quantize_leaf(w)
    assert q.dtype == jnp.int8 and scale.shape == (1024,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(w))
    # symmetric round-to-nearest: error ≤ scale/2 per element (per column)
    assert np.all(err <= np.asarray(scale)[None, :] * 0.5 + 1e-9)


def test_quantize_params_selects_large_dense_only():
    params = {
        "big": {"kernel": jnp.ones((64, 1024)), "bias": jnp.ones((1024,))},
        "small": {"kernel": jnp.ones((4, 4))},
        "norm": {"scale": jnp.ones((64,))},
    }
    qtree, scales = quant.quantize_params(params, min_elems=65536)
    assert qtree["big"]["kernel"].dtype == jnp.int8
    assert qtree["small"]["kernel"].dtype == jnp.float32  # below threshold
    assert qtree["norm"]["scale"].dtype == jnp.float32
    assert set(scales.keys()) == {("big",)}
    deq = quant.dequantize_params(qtree, scales, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(deq["big"]["kernel"]), 1.0, rtol=1e-2)


class _TwoDense(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(48, name="d1", dtype=jnp.float32)(x)
        return nn.Dense(8, name="d2", dtype=jnp.float32)(jax.nn.gelu(x))


def test_quant_overlay_matches_dense():
    model = _TwoDense()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    qtree, scales = quant.quantize_params(params, min_elems=1)
    assert set(scales.keys()) == {("d1",), ("d2",)}

    apply_q = quant.make_quant_apply(model, scales, compute_dtype=jnp.float32)
    got = apply_q(qtree, x)
    want = model.apply({"params": quant.dequantize_params(qtree, scales, jnp.float32)}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    # and close to the unquantized model (int8 rounding only)
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.02)


def test_lora_overlay_composes_with_quant_overlay():
    """lora outermost + quant innermost == dequant-base output + lora delta."""
    model = _TwoDense()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    params = model.init(jax.random.PRNGKey(4), x)["params"]
    qtree, scales = quant.quantize_params(params, min_elems=1)

    # bare Dense modules don't match the diffusers-class filters of
    # create_sites — construct the sites directly
    sites = [
        lora_lib.LoRASite(("d1",), "lora_test_d1", "dense", 2, 1.0, 32, 48),
        lora_lib.LoRASite(("d2",), "lora_test_d2", "dense", 2, 1.0, 48, 8),
    ]
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(5), sites)
    # non-zero up factors so the delta is visible
    lp = jax.tree.map(lambda a: a + 0.01, lp)

    with lora_lib.lora_overlay(sites, lp, jnp.ones((2,))), quant.quant_overlay(
        scales, compute_dtype=jnp.float32
    ):
        got = model.apply({"params": qtree}, x)

    deq = quant.dequantize_params(qtree, scales, jnp.float32)
    with lora_lib.lora_overlay(sites, lp, jnp.ones((2,))):
        want = model.apply({"params": deq}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    # the adapter actually contributed (differs from base-only quant path)
    base_only = quant.make_quant_apply(model, scales, jnp.float32)(qtree, x)
    assert float(np.max(np.abs(np.asarray(got) - np.asarray(base_only)))) > 1e-5


def _tiny_flux_setup(base_params, min_elems=None):
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
    from sliders_conceptmod_tpu.models.flux import FluxConfig, FluxTransformer2DModel
    from sliders_conceptmod_tpu.train import esd, esd_flux
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    cfg = FluxConfig.tiny()
    model = FluxTransformer2DModel(cfg, dtype=jnp.float32)
    res = 32
    gh = gw = res // 8 // 2
    s_img, s_txt = gh * gw, 8

    if base_params is None:
        base_params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, s_img, cfg.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, s_txt, cfg.joint_attention_dim)),
            jnp.zeros((1, cfg.pooled_projection_dim)),
            jnp.zeros((s_txt, 3)),
            jnp.zeros((s_img, 3)),
        )["params"]

    if min_elems is not None:
        qtree, scales = quant.quantize_params(base_params, min_elems=min_elems)
        apply_fn = quant.make_quant_apply(model, scales, compute_dtype=jnp.float32)
        base = qtree
    else:

        def apply_fn(p, *a, **kw):
            return model.apply({"params": p}, *a, **kw)

        base = base_params

    sites = lora_lib.create_sites(base_params, rank=2, train_method="full", delimiter="-")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    schedule = FlowMatchScheduler().set_timesteps(4, mu=calculate_shift(s_img))

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        return (
            jax.random.normal(k, (s_txt, cfg.joint_attention_dim)) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 1), (cfg.pooled_projection_dim,)) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=res)], encode_fn)
    fcfg = esd_flux.FluxESDConfig(
        height=res, width=res, latent_channels=cfg.in_channels // 4, remat=False
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    step = esd_flux.make_flux_esd_train_step(
        apply_fn, sites, schedule, opt, fcfg, student_overlay=min_elems is not None
    )
    return base, base_params, sites, lora_params, opt, step, bank


def test_flux_esd_step_over_quantized_base():
    base_q, raw, sites, lp, opt, step_q, bank = _tiny_flux_setup(None, min_elems=1)
    assert len(sites) > 0
    lp0 = jax.tree.map(jnp.copy, lp)  # the step donates lora_params/opt_state
    opt_state = opt.init(jax.tree.map(jnp.copy, lp))
    lp2, opt_state, metrics = step_q(
        base_q, jax.tree.map(jnp.copy, lp), opt_state, jax.random.PRNGKey(7), bank
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0  # grads flow through the overlay
    # LoRA moved; the int8 base is untouched by the step
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, lp2, lp0),
        0.0,
    )
    assert moved > 0

    # same seed over the dequantized base (still overlay student): losses match
    # up to float associativity of (x@q)·s vs x@(q·s)
    from sliders_conceptmod_tpu.models.flux import FluxConfig, FluxTransformer2DModel
    from sliders_conceptmod_tpu.train import esd_flux
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    qtree, scales = quant.quantize_params(raw, min_elems=1)
    deq = quant.dequantize_params(qtree, scales, jnp.float32)
    cfg = FluxConfig.tiny()
    model = FluxTransformer2DModel(cfg, dtype=jnp.float32)

    def plain_apply(p, *a, **kw):
        return model.apply({"params": p}, *a, **kw)

    schedule = FlowMatchScheduler().set_timesteps(4, mu=calculate_shift(4))
    fcfg = esd_flux.FluxESDConfig(height=32, width=32, latent_channels=cfg.in_channels // 4, remat=False)
    opt2 = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    step_plain = esd_flux.make_flux_esd_train_step(
        plain_apply, sites, schedule, opt2, fcfg, student_overlay=True
    )
    _, _, m_plain = step_plain(
        deq, jax.tree.map(jnp.copy, lp0), opt2.init(jax.tree.map(jnp.copy, lp0)),
        jax.random.PRNGKey(7), bank,
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(m_plain["loss"]), rtol=1e-3, atol=1e-6
    )


def test_quantize_host_tree_matches_device_quantize():
    """The host (numpy, pre-transfer) quantizer and the device quantizer
    produce identical int8 kernels + scales — the real-checkpoint load path
    is bit-equivalent to the tested device path."""
    rng = np.random.default_rng(0)
    host = {
        "blk": {"kernel": rng.normal(size=(64, 1024)).astype(np.float32) * 0.05,
                "bias": rng.normal(size=(1024,)).astype(np.float32)},
        "small": {"kernel": rng.normal(size=(4, 4)).astype(np.float32)},
    }
    q_host, s_host = quant.quantize_host_tree(host, dtype=jnp.float32, min_elems=65536)
    q_dev, s_dev = quant.quantize_params(
        jax.tree.map(jnp.asarray, host), min_elems=65536
    )
    assert set(s_host) == set(s_dev) == {("blk",)}
    np.testing.assert_array_equal(np.asarray(q_host["blk"]["kernel"]),
                                  np.asarray(q_dev["blk"]["kernel"]))
    np.testing.assert_allclose(np.asarray(s_host[("blk",)]),
                               np.asarray(s_dev[("blk",)]), rtol=1e-6)
    # non-quantized leaves transfer at the requested dtype
    assert q_host["small"]["kernel"].dtype == jnp.float32
    assert q_host["blk"]["bias"].dtype == jnp.float32


def test_sd3_esd_step_student_overlay_matches_merge():
    """make_sd3_esd_train_step(student_overlay=True) over the full-precision
    base reproduces the merged-student path (same seed → same loss up to
    overlay-vs-merge float associativity) — the SD3 tpu.quantize_base route."""
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.train import esd, esd_sd3
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    _, tes, tr, scheduler = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.float32)
    mm_cfg = tr.config
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    lp = jax.tree.map(lambda a: a + 0.02, lp)

    def encode_fn(prompt):
        text, pooled = factory.encode_prompts_sd3(
            tes, [prompt], joint_attention_dim=mm_cfg.joint_attention_dim, t5_seq_len=4
        )
        return text[0], pooled[0]

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=64)], encode_fn)
    schedule = scheduler.set_timesteps(4)
    scfg = esd_sd3.SD3ESDConfig(
        max_denoising_steps=4, batch_size=1, height=64, width=64,
        latent_channels=mm_cfg.in_channels, remat=False,
    )
    losses = []
    # variants: merged; full overlay; overlay student + merged warm-up
    # (overlay_warmup=False — the fusion-preserving bf16 split, tpu.overlay_warmup)
    for overlay, owarm in ((False, None), (True, None), (True, False)):
        opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
        step = esd_sd3.make_sd3_esd_train_step(
            tr.apply_fn(), sites, schedule, opt, scfg,
            student_overlay=overlay, overlay_warmup=owarm,
        )
        _, _, m = step(
            tr.params, jax.tree.map(jnp.copy, lp),
            opt.init(jax.tree.map(jnp.copy, lp)), jax.random.PRNGKey(7), bank,
        )
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(losses[0], losses[2], rtol=1e-3, atol=1e-7)


def test_sd3_w8a8_warmup_step():
    """tpu.w8a8_warmup on SD3: the gradient-stopped warm-up runs W8A8 over
    the int8 base while teacher/student stay weight-only — the step trains
    (finite loss) and stays near the weight-only quantized run (warm-up
    rounding shifts the partially-denoised context latents only). Mirrors
    tests/test_esd_train.py::test_w8a8_warmup_step for the SDXL path."""
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.train import esd, esd_sd3
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    _, tes, tr, scheduler = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.float32)
    mm_cfg = tr.config
    qtree, q_scales = quant.quantize_params(tr.params, min_elems=1)
    model = tr.model

    def q_apply(p, latents, t, ctx, pooled):
        with quant.quant_overlay(q_scales, compute_dtype=jnp.float32):
            return model.apply({"params": p}, latents, t, ctx, pooled)

    def w_apply(p, latents, t, ctx, pooled):
        with quant.quant_overlay(q_scales, compute_dtype=jnp.float32, act_quant=True):
            return model.apply({"params": p}, latents, t, ctx, pooled)

    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp0 = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    lp0 = jax.tree.map(lambda a: a + 0.02, lp0)

    def encode_fn(prompt):
        text, pooled = factory.encode_prompts_sd3(
            tes, [prompt], joint_attention_dim=mm_cfg.joint_attention_dim, t5_seq_len=4
        )
        return text[0], pooled[0]

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=64)], encode_fn)
    schedule = scheduler.set_timesteps(4)
    scfg = esd_sd3.SD3ESDConfig(
        max_denoising_steps=4, batch_size=1, height=64, width=64,
        latent_channels=mm_cfg.in_channels, remat=False,
    )
    losses = {}
    for warm in (None, w_apply):
        opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
        step = esd_sd3.make_sd3_esd_train_step(
            q_apply, sites, schedule, opt, scfg,
            student_overlay=True, warm_apply=warm,
        )
        lp = jax.tree.map(jnp.copy, lp0)
        opt_state = opt.init(jax.tree.map(jnp.copy, lp0))
        ls = []
        for i in range(3):
            lp, opt_state, m = step(qtree, lp, opt_state, jax.random.PRNGKey(60 + i), bank)
            ls.append(float(m["loss"]))
        losses["w8a8" if warm is not None else "w8"] = ls
    assert all(np.isfinite(l) for l in losses["w8a8"])
    a, b = np.asarray(losses["w8a8"]), np.asarray(losses["w8"])
    # warm-up rounding perturbs the denoised context, not the loss formula.
    # Empirical bound (ADVICE r2): measured per-step relative deviation on
    # this scenario is <=0.0034; 0.05 gives ~15x headroom while still
    # failing if the w8a8 path computed something structurally different
    # (the old 0.5 bound mostly checked finiteness)
    assert np.all(np.abs(a - b) / np.maximum(np.abs(b), 1e-8) < 0.05), (a, b)


def test_sd3_dual_tree_warm_params():
    """SD3 dual-tree w8a8 warm-up (tpu.w8a8_warmup WITHOUT quantize_base):
    the step's optional trailing ``warm_params`` tree feeds ONLY the flow
    warm-up chain while the bf16 base keeps teacher/student exact. Mirrors
    tests/test_esd_train.py::test_dual_tree_warm_params: (a) plumbing
    identity — warm_params = copy-of-base with a pass-through warm_apply
    reproduces the no-warm_params overlay step bit-for-bit; (b) the warm-up
    actually reads warm_params; (c) the real int8+act-quant warm copy trains
    finite with losses near the bf16 run."""
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.train import esd, esd_sd3
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    _, tes, tr, scheduler = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.float32)
    mm_cfg = tr.config
    apply = tr.apply_fn()
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp0 = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    lp0 = jax.tree.map(lambda a: a + 0.02, lp0)

    def encode_fn(prompt):
        text, pooled = factory.encode_prompts_sd3(
            tes, [prompt], joint_attention_dim=mm_cfg.joint_attention_dim, t5_seq_len=4
        )
        return text[0], pooled[0]

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=64)], encode_fn)
    schedule = scheduler.set_timesteps(4)
    scfg = esd_sd3.SD3ESDConfig(
        max_denoising_steps=4, batch_size=1, height=64, width=64,
        latent_channels=mm_cfg.in_channels, remat=False,
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)

    def run(step, warm_tree, n=3):
        lp = jax.tree.map(jnp.copy, lp0)
        opt_state = opt.init(jax.tree.map(jnp.copy, lp0))
        ls = []
        for i in range(n):
            lp, opt_state, m = step(
                tr.params, lp, opt_state, jax.random.PRNGKey(70 + i), bank, warm_tree
            )
            ls.append(float(m["loss"]))
        return ls

    # (a) pass-through warm_apply + copy-of-base warm tree == plain overlay step
    ref_step = esd_sd3.make_sd3_esd_train_step(
        apply, sites, schedule, opt, scfg, student_overlay=True
    )
    dual_step = esd_sd3.make_sd3_esd_train_step(
        apply, sites, schedule, opt, scfg, student_overlay=True, warm_apply=apply
    )
    ref_ls = run(ref_step, None)
    same_ls = run(dual_step, jax.tree.map(jnp.copy, tr.params))
    np.testing.assert_array_equal(ref_ls, same_ls)

    # (b) the warm-up reads warm_params, not base_params
    zero_ls = run(dual_step, jax.tree.map(jnp.zeros_like, tr.params))
    assert not np.allclose(ref_ls, zero_ls), (ref_ls, zero_ls)

    # (c) int8 + act-quant warm copy (the production dual-tree shape)
    warm_tree, wq_scales = quant.quantize_params(tr.params, min_elems=1)
    model = tr.model

    def w8a8_warm(p, latents, t, ctx, pooled):
        with quant.quant_overlay(wq_scales, compute_dtype=jnp.float32, act_quant=True):
            return model.apply({"params": p}, latents, t, ctx, pooled)

    q_step = esd_sd3.make_sd3_esd_train_step(
        apply, sites, schedule, opt, scfg, student_overlay=True, warm_apply=w8a8_warm
    )
    q_ls = run(q_step, warm_tree)
    assert all(np.isfinite(l) for l in q_ls)
    a, b = np.asarray(q_ls), np.asarray(ref_ls)
    assert np.all(np.abs(a - b) / np.maximum(np.abs(b), 1e-8) < 0.5), (a, b)


def test_sd3_warm_params_misuse_raises():
    """Trace-time guards on the SD3 step's dual-tree ``warm_params`` arg
    (ADVICE r3): (a) a warm tree fed to a merged warm-up (overlay_warmup=
    False) would be silently ignored → ValueError; (b) a warm tree without a
    dequantizing warm_apply would push int8 kernels through the exact apply
    → ValueError. None-vs-tree is static per trace, so both are plain
    Python raises inside the jitted step."""
    import pytest

    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.train import esd, esd_sd3
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    _, tes, tr, scheduler = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.float32)
    mm_cfg = tr.config
    apply = tr.apply_fn()
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)

    def encode_fn(prompt):
        text, pooled = factory.encode_prompts_sd3(
            tes, [prompt], joint_attention_dim=mm_cfg.joint_attention_dim, t5_seq_len=4
        )
        return text[0], pooled[0]

    bank = esd.build_prompt_bank([PromptSettings(target="person", resolution=64)], encode_fn)
    schedule = scheduler.set_timesteps(4)
    scfg = esd_sd3.SD3ESDConfig(
        max_denoising_steps=4, batch_size=1, height=64, width=64,
        latent_channels=mm_cfg.in_channels, remat=False,
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    opt_state = opt.init(lp)
    warm_tree = jax.tree.map(jnp.copy, tr.params)

    merged_warm = esd_sd3.make_sd3_esd_train_step(
        apply, sites, schedule, opt, scfg, student_overlay=True, overlay_warmup=False
    )
    with pytest.raises(ValueError, match="overlay_warmup"):
        merged_warm(tr.params, lp, opt_state, jax.random.PRNGKey(0), bank, warm_tree)

    no_warm_apply = esd_sd3.make_sd3_esd_train_step(
        apply, sites, schedule, opt, scfg, student_overlay=True
    )
    with pytest.raises(ValueError, match="warm_apply"):
        no_warm_apply(tr.params, lp, opt_state, jax.random.PRNGKey(0), bank, warm_tree)


def test_sd3_dual_tree_trainer_end_to_end(tmp_path):
    """tpu.w8a8_warmup WITHOUT quantize_base drives the SD3 trainer through
    the dual-tree route (int8 warm copy built at setup, warm_params through
    the step signature) — tiny CPU e2e, mirroring
    tests/test_esd_train.py::test_dual_tree_trainer_end_to_end for SD1."""
    import json

    from sliders_conceptmod_tpu.cli import train_lora_sd3
    from sliders_conceptmod_tpu.core import config as config_util
    from sliders_conceptmod_tpu.core.prompts import PromptSettings

    cfg = config_util.load_config_from_yaml("data/config-tiny-sd3.yaml")
    cfg.train.iterations = 3
    cfg.tpu.w8a8_warmup = True
    assert not cfg.tpu.quantize_base
    cfg.save.name = "dual_sd3"
    cfg.save.path = str(tmp_path)
    cfg.save.per_steps = 0
    cfg.logging.verbose = False
    prompts = [PromptSettings(target="person", resolution=64)]
    sd = train_lora_sd3.train(cfg, prompts, rank=2, save_file=False)
    assert sd  # state dict returned
    losses = [
        json.loads(line)["loss"]
        for line in (tmp_path / "dual_sd3_metrics.jsonl").read_text().splitlines()
        if "loss" in line
    ]
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)


def test_sd3_warm_apply_requires_student_overlay():
    import pytest

    from sliders_conceptmod_tpu.train import esd_sd3
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    apply = lambda *a: None
    with pytest.raises(ValueError, match="student_overlay"):
        esd_sd3.make_sd3_esd_train_step(
            apply, {}, None, opt, esd_sd3.SD3ESDConfig(), warm_apply=apply
        )


def test_factory_quantize_base_weightless():
    """load_models_flux(quantize_base=True) yields an int8 base whose
    apply_fn matches the full-precision bundle up to int8 rounding noise
    in the quantized layers (tiny config: most kernels sit below
    QUANT_MIN_ELEMS, so we drop the threshold via the bundle's scales)."""
    from sliders_conceptmod_tpu.models import factory

    _, _, bundle, _ = factory.load_models_flux("tiny", weight_dtype=jnp.float32,
                                               quantize_base=True)
    assert bundle.quant_scales is not None
    leaves = jax.tree.leaves(bundle.params)
    assert any(a.dtype == jnp.int8 for a in leaves) or len(bundle.quant_scales) == 0
    # the apply_fn runs end to end over the quantized tree
    cfg = bundle.config
    gh = gw = 4
    out = bundle.apply_fn()(
        bundle.params,
        jnp.zeros((1, gh * gw, cfg.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, 2, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)),
        jnp.zeros((2, 3)),
        jnp.zeros((gh * gw, 3)),
    )
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_unsupported_trainers_reject_quantize_base():
    """Families whose step merges into the base refuse tpu.quantize_base /
    tpu.w8a8_warmup loudly instead of silently ignoring the knobs. (The
    SD1/SDXL text-slider trainer ACCEPTS quantize_base since r2 — it is the
    weight-streaming perf lever there, covered by
    tests/test_esd_train.py::test_student_overlay_over_quantized_base.)"""
    import pytest

    from sliders_conceptmod_tpu.core import config as config_util
    from sliders_conceptmod_tpu.core.prompts import PromptSettings

    cfg = config_util.load_config_from_yaml("data/config-tiny.yaml")
    cfg.tpu.quantize_base = True
    prompts = [PromptSettings(target="person", resolution=64)]

    from sliders_conceptmod_tpu.train import trainer as sd_trainer

    # SD1/SDXL: DoRA still refuses (needs full-precision base magnitudes)
    with pytest.raises(NotImplementedError, match="DoRA"):
        sd_trainer.train(cfg, prompts, rank=2, save_file=False, peft_type="dora")
    # w8a8_warmup without quantize_base is the DUAL-TREE route on SD1/XL
    # since r3 (tests/test_esd_train.py::test_dual_tree_trainer_end_to_end) —
    # but DoRA cannot ride the warm-up overlay
    cfg_w = config_util.load_config_from_yaml("data/config-tiny.yaml")
    cfg_w.tpu.w8a8_warmup = True
    with pytest.raises(NotImplementedError, match="dual-tree"):
        sd_trainer.train(cfg_w, prompts, rank=2, save_file=False, peft_type="dora")

    from sliders_conceptmod_tpu.cli import train_lora_cascade

    with pytest.raises(NotImplementedError, match="quantize_base"):
        train_lora_cascade.train(cfg, prompts, rank=2, save_file=False)
    # w8a8_warmup is SUPPORTED on cascade since r5 (dual-tree warm-up —
    # test_cascade_dual_tree_w8a8_warmup_runs below); only
    # the non-LoRA route still refuses (the int8 overlay rides LoRA sites)
    with pytest.raises(NotImplementedError, match="LoRA"):
        train_lora_cascade.train(cfg_w, prompts, rank=2, save_file=False, peft_type="dora")

    # flux/sd3 trainers: w8a8_warmup has no step path — loud refusal
    from sliders_conceptmod_tpu.cli import train_lora_flux

    cfg_f = config_util.load_config_from_yaml("data/config-tiny-flux.yaml")
    cfg_f.tpu.quantize_base = True
    cfg_f.tpu.w8a8_warmup = True
    with pytest.raises(NotImplementedError, match="w8a8_warmup"):
        train_lora_flux.train(cfg_f, prompts, rank=2, save_file=False)


def test_quantize_checkpoint_artifact_roundtrip(tmp_path):
    """cli/quantize_checkpoint → io/quant_cache → factory reload: the int8
    artifact loads as a quantized bundle whose forward matches the
    directly-quantized weightless family bit-for-bit (same init seed)."""
    from sliders_conceptmod_tpu.cli.quantize_checkpoint import build_parser, run
    from sliders_conceptmod_tpu.io import quant_cache
    from sliders_conceptmod_tpu.models import factory

    out = tmp_path / "tiny-flux.int8.safetensors"
    run(build_parser().parse_args([
        "--base", "tiny", "--family", "flux", "--out", str(out),
        "--precision", "float32",
    ]))
    assert quant_cache.is_quantized_artifact(str(out))

    # "tiny" in the artifact filename keeps the tiny-config escape active
    _, _, got, _ = factory.load_models_flux(str(out), weight_dtype=jnp.float32)
    _, _, want, _ = factory.load_models_flux("tiny", weight_dtype=jnp.float32,
                                             quantize_base=True)
    assert got.quant_scales is not None

    cfg = got.config
    gh = gw = 4
    args = (
        jnp.ones((1, gh * gw, cfg.in_channels)) * 0.1,
        jnp.zeros((1,)),
        jnp.ones((1, 2, cfg.joint_attention_dim)) * 0.1,
        jnp.ones((1, cfg.pooled_projection_dim)) * 0.1,
        jnp.zeros((2, 3)),
        jnp.zeros((gh * gw, 3)),
    )
    a = np.asarray(got.apply_fn()(got.params, *args), np.float32)
    b = np.asarray(want.apply_fn()(want.params, *args), np.float32)
    np.testing.assert_array_equal(a, b)

    # a NON-artifact safetensors must be rejected loudly by the cache loader
    import pytest
    from safetensors.numpy import save_file

    plain = tmp_path / "plain.safetensors"
    save_file({"x": np.zeros((2, 2), np.float32)}, str(plain))
    with pytest.raises(ValueError, match="not a"):
        quant_cache.load_quantized(str(plain))


def test_quant_cache_int8_roundtrip(tmp_path):
    """save_quantized/load_quantized preserve int8 kernels, scales, and
    bf16 side leaves exactly (tiny models dodge the threshold, so pin the
    int8 path directly)."""
    from sliders_conceptmod_tpu.io import quant_cache

    tree = {
        "blk": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (64, 1024)) * 0.05,
                "bias": jnp.ones((1024,), jnp.bfloat16)},
        "norm": {"scale": jnp.ones((64,), jnp.bfloat16) * 2},
    }
    qtree, scales = quant.quantize_params(tree, min_elems=1)
    assert qtree["blk"]["kernel"].dtype == jnp.int8
    path = tmp_path / "q.int8.safetensors"
    quant_cache.save_quantized(str(path), qtree, scales)
    got_tree, got_scales = quant_cache.load_quantized(str(path), dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got_tree["blk"]["kernel"]),
                                  np.asarray(qtree["blk"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(got_scales[("blk",)], np.float32),
                                  np.asarray(scales[("blk",)], np.float32))
    assert got_tree["blk"]["bias"].dtype == jnp.bfloat16
    assert float(got_tree["norm"]["scale"][0]) == 2.0


def test_weightless_quantized_tree():
    shapes = {
        "blk": {"kernel": jax.ShapeDtypeStruct((256, 512), jnp.float32)},
        "norm": {"scale": jax.ShapeDtypeStruct((256,), jnp.float32)},
    }
    qtree, scales = quant.weightless_quantized(shapes, min_elems=1)
    assert qtree["blk"]["kernel"].dtype == jnp.int8
    assert qtree["norm"]["scale"].dtype == jnp.bfloat16
    assert scales[("blk",)].shape == (512,)


def test_packed_overlay_sampler_matches_merged_trajectory():
    """make_packed_overlay_sampler (shared by the Flux sweep CLI, serving,
    and bench) reproduces the merged-params two-phase trajectory at a
    uniform scale, and its scale-0 rows are exactly the slider-off model."""
    from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
    from sliders_conceptmod_tpu.infer.generate_flow import make_packed_overlay_sampler
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.models.flux import pack_latents, prepare_latent_image_ids

    _, _, tr, scheduler = factory.load_models_flux("tiny-flux", weight_dtype=jnp.float32)
    cfg = tr.config
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda a: a + 0.05, lp)

    gh = gw = 4
    s_txt = 8
    schedule = scheduler.set_timesteps(3, mu=calculate_shift(gh * gw))
    img_ids = jnp.asarray(prepare_latent_image_ids(gh, gw))
    apply_fn = tr.apply_fn()
    flip = 1
    sample = make_packed_overlay_sampler(apply_fn, sites, schedule, flip, img_ids,
                                         cfg.guidance_embeds)

    k = jax.random.PRNGKey(1)
    tokens = pack_latents(
        jax.random.normal(k, (1, cfg.in_channels // 4, gh * 2, gw * 2))
    ).astype(jnp.float32)
    text = jax.random.normal(jax.random.fold_in(k, 1), (1, s_txt, cfg.joint_attention_dim)) * 0.1
    pooled = jax.random.normal(jax.random.fold_in(k, 2), (1, cfg.pooled_projection_dim)) * 0.1
    g = jnp.float32(3.5)

    got = sample(tr.params, lp, jnp.full((1,), 1.5, jnp.float32), tokens, text, pooled, g)

    # merged reference: base until flip, merged-at-1.5 after
    merged = lora_lib.merge_lora_params(tr.params, sites, lp, 1.5)

    def body(params):
        def f(i, tok):
            t = jnp.broadcast_to(schedule.timesteps[i] / 1000.0, (1,))
            v = apply_fn(params, tok, t, text, pooled, jnp.zeros((s_txt, 3)), img_ids)
            return FlowMatchScheduler.step(schedule, v, i, tok)
        return f

    want = jax.lax.fori_loop(0, flip, body(tr.params), tokens)
    want = jax.lax.fori_loop(flip, 3, body(merged), want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    # scale 0 == slider off for the whole trajectory
    base_only = jax.lax.fori_loop(0, 3, body(tr.params), tokens)
    got0 = sample(tr.params, lp, jnp.zeros((1,), jnp.float32), tokens, text, pooled, g)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(base_only), rtol=1e-5, atol=1e-5)


def test_quantize_activations_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 7, 96), jnp.float32)
    xq, sx = quant.quantize_activations(x)
    assert xq.dtype == jnp.int8 and sx.shape == (4, 7, 1)
    err = np.abs(np.asarray(xq, np.float32) * np.asarray(sx) - np.asarray(x))
    # per-token round-to-nearest: error ≤ sx/2 per element
    assert np.all(err <= np.asarray(sx) * 0.5 + 1e-9)
    # zero rows must not divide by zero
    xq0, sx0 = quant.quantize_activations(jnp.zeros((2, 8)))
    assert np.all(np.asarray(xq0) == 0) and np.all(np.isfinite(np.asarray(sx0)))


def test_int8_matmul_exact_integer_accumulation():
    """int8×int8→int32 on the contraction is EXACT — the scaled result must
    equal the fp64 computation on the dequantized operands to fp32 rounding."""
    kx = jax.random.PRNGKey(12)
    xq = jax.random.randint(kx, (5, 256), -127, 128, jnp.int8)
    wq = jax.random.randint(jax.random.fold_in(kx, 1), (256, 64), -127, 128, jnp.int8)
    acc = quant.int8_matmul(xq, wq)
    assert acc.dtype == jnp.int32
    want = np.asarray(xq, np.int64) @ np.asarray(wq, np.int64)
    np.testing.assert_array_equal(np.asarray(acc, np.int64), want)


def test_w8a8_overlay_matches_dense():
    """act_quant=True output ≈ the full-precision model (weight + activation
    rounding only), and exactly equals the manual W8A8 computation."""
    model = _TwoDense()
    x = jax.random.normal(jax.random.PRNGKey(13), (3, 32))
    params = model.init(jax.random.PRNGKey(14), x)["params"]
    qtree, scales = quant.quantize_params(params, min_elems=1)

    apply_w8a8 = quant.make_quant_apply(
        model, scales, compute_dtype=jnp.float32, act_quant=True
    )
    got = np.asarray(apply_w8a8(qtree, x))

    # manual layer-by-layer W8A8 reference
    h = x
    for name in ("d1", "d2"):
        xq, sx = quant.quantize_activations(h)
        y = (
            quant.int8_matmul(xq, qtree[name]["kernel"]).astype(jnp.float32)
            * sx
            * qtree[name]["kernel_scale"]
            + params[name]["bias"]
        )
        h = jax.nn.gelu(y) if name == "d1" else y
    np.testing.assert_allclose(got, np.asarray(h), rtol=1e-5, atol=1e-6)

    # close to full precision: W8A8 adds per-token activation rounding on top
    # of the weight rounding — tolerance is looser than weight-only
    ref = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, rtol=0.15, atol=0.05)


def test_w8a8_tighter_than_random_baseline():
    """Sanity on usefulness: W8A8 relative error on a realistic-width matmul
    stays small (<2%) — the mode is a serving fast path, not a toy."""
    k = jax.random.PRNGKey(15)
    x = jax.random.normal(k, (16, 1024), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (1024, 1024), jnp.float32) * 0.02
    q, scale = quant.quantize_leaf(w)
    xq, sx = quant.quantize_activations(x)
    got = np.asarray(quant.int8_matmul(xq, q).astype(jnp.float32) * sx * scale)
    want = np.asarray(x) @ np.asarray(w)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_unquantized_bundle_act_quant_raises():
    """W8A8 requested on an UNQUANTIZED bundle (quant_scales=None) must raise
    — via the apply_fn(act_quant=True) argument AND via the bundle attribute
    (CLIs set bundle.act_quant then call apply_fn()); a silent bf16 fallback
    would make a W8A8 A/B measure nothing (VERDICT r3 weak #2)."""
    import pytest

    from sliders_conceptmod_tpu.models.factory import TransformerBundle, UNetBundle
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
    from sliders_conceptmod_tpu.models.unet import UNetConfig, UNet2DConditionModel

    ucfg = UNetConfig.tiny()
    ub = UNetBundle(UNet2DConditionModel(ucfg, dtype=jnp.float32), {}, ucfg)
    mcfg = MMDiTConfig.tiny()
    tb = TransformerBundle(SD3Transformer2DModel(mcfg, dtype=jnp.float32), {}, mcfg)
    for bundle in (ub, tb):
        with pytest.raises(ValueError, match="quantized base"):
            bundle.apply_fn(act_quant=True)
        bundle.act_quant = True  # the CLI/serve attribute path
        with pytest.raises(ValueError, match="quantized base"):
            bundle.apply_fn()


def test_bundle_act_quant_flag_routes_w8a8():
    """A TransformerBundle with act_quant=True produces the W8A8 forward
    (different from weight-only by the activation rounding), finite output.
    The tiny MMDiT's kernels sit below QUANT_MIN_ELEMS, so quantize at
    min_elems=1 and build the bundle directly."""
    from sliders_conceptmod_tpu.models.factory import TransformerBundle
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel

    cfg = MMDiTConfig.tiny()
    model = SD3Transformer2DModel(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(20), (1, cfg.in_channels, 8, 8)) * 0.3
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.PRNGKey(21), (1, 2, cfg.joint_attention_dim)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(22), (1, cfg.pooled_projection_dim)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)["params"]
    qtree, scales = quant.quantize_params(params, min_elems=1)
    assert scales  # something actually quantized

    bundle = TransformerBundle(model, qtree, cfg, quant_scales=scales)
    w_only = np.asarray(bundle.apply_fn()(bundle.params, x, t, ctx, pooled))
    bundle.act_quant = True
    w8a8 = np.asarray(bundle.apply_fn()(bundle.params, x, t, ctx, pooled))
    assert np.all(np.isfinite(w8a8))
    assert not np.allclose(w8a8, w_only)  # activation rounding is visible
    # but close: same model up to int8 activation rounding
    rel = np.linalg.norm(w8a8 - w_only) / max(np.linalg.norm(w_only), 1e-9)
    assert rel < 0.2, rel


def test_quantize_checkpoint_artifact_xl_sd1(tmp_path):
    """cli/quantize_checkpoint --family xl/sd1: the int8 UNet artifact
    reloads through load_models_xl / load_models as a quantized bundle whose
    kernels match the directly-quantized weightless family bit-for-bit
    (same init seed). Filenames carry 'tiny' for the factory escape."""
    from sliders_conceptmod_tpu.cli.quantize_checkpoint import build_parser, run
    from sliders_conceptmod_tpu.models import factory

    for family, base, loader in (
        ("xl", "tiny-xl", lambda p: factory.load_models_xl(p, weight_dtype=jnp.bfloat16)),
        ("sd1", "tiny", lambda p: factory.load_models(p, weight_dtype=jnp.bfloat16)),
    ):
        out = tmp_path / f"tiny-{family}.int8.safetensors"
        run(build_parser().parse_args([
            "--base", base, "--family", family, "--out", str(out)
        ]))
        assert out.exists()
        _, _, unet_art, _ = loader(str(out))
        assert unet_art.quant_scales is not None
        # direct weightless quantized load for comparison
        if family == "xl":
            _, _, unet_ref, _ = factory.load_models_xl(
                base, weight_dtype=jnp.bfloat16, quantize_base=True
            )
        else:
            _, _, unet_ref, _ = factory.load_models(
                base, weight_dtype=jnp.bfloat16, quantize_base=True
            )
        ref_flat = jax.tree.leaves(unet_ref.params)
        art_flat = jax.tree.leaves(unet_art.params)
        assert len(ref_flat) == len(art_flat)
        for a, b in zip(ref_flat, art_flat):
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_student_overlay_config_knob():
    """tpu.student_overlay plumbing: None follows quantize_base; explicit
    False with an int8 base refuses (nothing to merge into); DoRA refuses
    the overlay (its norm decomposition merges); explicit True on a bf16
    base trains (the dL/dW'-skipping perf route, math equivalence in
    tests/test_esd_train.py::test_student_overlay_matches_merged_path)."""
    import pytest

    from sliders_conceptmod_tpu.core import config as config_util
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.train import trainer as sd_trainer

    prompts = [PromptSettings(target="person", resolution=64)]

    cfg = config_util.load_config_from_yaml("data/config-tiny.yaml")
    cfg.tpu.quantize_base = True
    cfg.tpu.student_overlay = False
    with pytest.raises(ValueError, match="student_overlay"):
        sd_trainer.train(cfg, prompts, rank=2, save_file=False)

    cfg2 = config_util.load_config_from_yaml("data/config-tiny.yaml")
    cfg2.tpu.student_overlay = True
    with pytest.raises(NotImplementedError, match="LoRA only"):
        sd_trainer.train(cfg2, prompts, rank=2, save_file=False, peft_type="dora")

    cfg3 = config_util.load_config_from_yaml("data/config-tiny.yaml")
    cfg3.tpu.student_overlay = True
    cfg3.train.iterations = 2
    res = sd_trainer.train(cfg3, prompts, rank=2, save_file=False)
    assert all(np.isfinite(l) for l in res.losses)


def test_cascade_esd_step_student_overlay_matches_merge():
    """make_cascade_esd_train_step(student_overlay=True) — the overlay-student
    + merged-warm-up split (the only cascade overlay shape: no quantized base
    exists there) reproduces the merged-student loss up to float
    associativity; mirrors the SD3/SDXL overlay equivalence tests."""
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet
    from sliders_conceptmod_tpu.train import esd, esd_cascade
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    cfg = CascadeConfig.tiny()
    m = StableCascadeUNet(cfg)
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, 4, 4)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.clip_text_in_channels)),
        jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels)),
        jnp.zeros((1, 1, cfg.clip_image_in_channels)),
    )["params"]

    def apply(p, *a):
        return m.apply({"params": p}, *a)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lp0 = jax.tree.map(
        lambda x: x + 0.02, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    )

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return (
            jax.random.normal(k, (5, cfg.clip_text_in_channels)) * 0.1,
            jax.random.normal(k, (1, cfg.clip_text_pooled_in_channels)) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="sky", resolution=16)], encode_fn)
    empty_text, empty_pooled = encode_fn("")
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)
    ccfg = esd_cascade.CascadeESDConfig(
        max_denoising_steps=4, height=64, width=64,
        latent_channels=cfg.in_channels, resolution_multiple=16.0, remat=False,
    )
    losses = []
    for overlay in (False, True):
        opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
        step = esd_cascade.make_cascade_esd_train_step(
            apply, sites, scheduler, schedule, opt, ccfg,
            empty_text=empty_text, empty_pooled=empty_pooled,
            clip_image_dim=cfg.clip_image_in_channels,
            student_overlay=overlay,
        )
        lp = jax.tree.map(jnp.copy, lp0)
        _, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-3, atol=1e-7)


def _cascade_quant_setup():
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet
    from sliders_conceptmod_tpu.train import esd, esd_cascade
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    cfg = CascadeConfig.tiny()
    m = StableCascadeUNet(cfg)
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, 4, 4)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.clip_text_in_channels)),
        jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels)),
        jnp.zeros((1, 1, cfg.clip_image_in_channels)),
    )["params"]

    def apply(p, *a):
        return m.apply({"params": p}, *a)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lp0 = jax.tree.map(
        lambda x: x + 0.02, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    )

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return (
            jax.random.normal(k, (5, cfg.clip_text_in_channels)) * 0.1,
            jax.random.normal(k, (1, cfg.clip_text_pooled_in_channels)) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="sky", resolution=16)], encode_fn)
    empty_text, empty_pooled = encode_fn("")
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)
    ccfg = esd_cascade.CascadeESDConfig(
        max_denoising_steps=4, height=64, width=64,
        latent_channels=cfg.in_channels, resolution_multiple=16.0, remat=False,
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))

    def make(**kw):
        return esd_cascade.make_cascade_esd_train_step(
            kw.pop("apply_fn", apply), sites, scheduler, schedule, opt, ccfg,
            empty_text=empty_text, empty_pooled=empty_pooled,
            clip_image_dim=cfg.clip_image_in_channels, **kw,
        )

    return cfg, m, apply, params, sites, lp0, bank, opt, make


def test_cascade_dual_tree_w8a8_warmup_runs():
    """Cascade dual-tree w8a8 warm-up (r5, tpu.w8a8_warmup): a REAL int8
    warm-up copy (min_elems=1) with act-quant feeds only the 19-step chain;
    the step runs, yields a finite loss, and moves the adapter."""
    cfg, m, apply, params, sites, lp0, bank, opt, make = _cascade_quant_setup()
    wq_tree, wq_scales = quant.quantize_params(params, min_elems=1)

    def warm_apply(p, *a):
        with quant.quant_overlay(wq_scales, compute_dtype=jnp.float32, act_quant=True):
            return m.apply({"params": p}, *a)

    step = make(warm_apply=warm_apply, overlay_warmup=True)
    lp = jax.tree.map(jnp.copy, lp0)
    before = jax.tree.map(np.asarray, lp0)
    lp, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank, wq_tree)
    assert np.isfinite(float(metrics["loss"]))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(lp), jax.tree.leaves(before))
    )


def test_cascade_dual_tree_passthrough_matches_merged_warmup():
    """With every kernel below QUANT_MIN_ELEMS the dual warm-up tree is a
    bf16 pass-through copy, so the overlay warm-up must reproduce the merged
    warm-up's loss up to matmul re-association — exercises exactly the
    dual-tree plumbing (the int8 math is covered by the _runs test above)."""
    cfg, m, apply, params, sites, lp0, bank, opt, make = _cascade_quant_setup()
    wq_tree, wq_scales = quant.quantize_params(params)  # default threshold: no-op
    assert not wq_scales, "tiny kernels must stay unquantized for the pass-through"

    def warm_apply(p, *a):
        with quant.quant_overlay(wq_scales, compute_dtype=jnp.float32, act_quant=True):
            return m.apply({"params": p}, *a)

    merged = make()
    dual = make(warm_apply=warm_apply, overlay_warmup=True)
    lp_a = jax.tree.map(jnp.copy, lp0)
    lp_b = jax.tree.map(jnp.copy, lp0)
    _, _, m_a = merged(params, lp_a, opt.init(lp_a), jax.random.PRNGKey(7), bank)
    _, _, m_b = dual(params, lp_b, opt.init(lp_b), jax.random.PRNGKey(7), bank, wq_tree)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-3, atol=1e-7)


def test_cascade_dual_tree_composes_with_share_warmup():
    """share_warmup + w8a8 dual tree: one shared int8 warm-up chain, bf16
    per-sample tails — finite loss (the two r5 warm-up levers stack)."""
    from sliders_conceptmod_tpu.train import esd_cascade

    cfg, m, apply, params, sites, lp0, bank, opt, make = _cascade_quant_setup()
    wq_tree, wq_scales = quant.quantize_params(params, min_elems=1)

    def warm_apply(p, *a):
        with quant.quant_overlay(wq_scales, compute_dtype=jnp.float32, act_quant=True):
            return m.apply({"params": p}, *a)

    ccfg = esd_cascade.CascadeESDConfig(
        max_denoising_steps=4, height=64, width=64,
        latent_channels=cfg.in_channels, resolution_multiple=16.0, remat=False,
        samples_per_step=2, share_warmup=True,
    )
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler

    scheduler = create_noise_scheduler("ddim")
    step = esd_cascade.make_cascade_esd_train_step(
        apply, sites, scheduler, scheduler.set_timesteps(4), opt, ccfg,
        empty_text=bank.text[0, 3], empty_pooled=bank.pooled[0, 3],
        clip_image_dim=cfg.clip_image_in_channels,
        warm_apply=warm_apply, overlay_warmup=True,
    )
    lp = jax.tree.map(jnp.copy, lp0)
    _, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank, wq_tree)
    assert np.isfinite(float(metrics["loss"]))


def test_cascade_dual_tree_guards():
    import pytest

    cfg, m, apply, params, sites, lp0, bank, opt, make = _cascade_quant_setup()
    with pytest.raises(ValueError, match="overlay_warmup"):
        make(warm_apply=apply)  # warm_apply without overlay_warmup
    step = make()  # merged warm-up
    lp = jax.tree.map(jnp.copy, lp0)
    with pytest.raises(ValueError, match="warm_apply"):
        # dual tree without a dequantizing warm_apply — trace-time guard
        step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank, params)
