"""End-to-end ESD train-step smoke tests on a tiny UNet (CPU).

Mirrors the reference flagship loop shape (train_lora_xl.py:165-351) at toy
scale: loss is finite, LoRA params move, teacher/base params don't, and the
4-row batched teacher CFG equals three separate CFG calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.prompts import PromptSettings
from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
from sliders_conceptmod_tpu.train import esd
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

MAX_STEPS = 5
CTX_DIM = 32
SEQ = 7


def _setup(xl: bool):
    cfg = UNetConfig.tiny_xl() if xl else UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((1, 4, 8, 8))
    params = model.init(
        jax.random.PRNGKey(0),
        sample,
        jnp.zeros((1,)),
        jnp.zeros((1, SEQ, CTX_DIM)),
        added_cond_kwargs={"text_embeds": jnp.zeros((1, 32)), "time_ids": jnp.zeros((1, 6))}
        if xl
        else None,
    )["params"]

    def unet_apply(p, sample, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    sites = lora_lib.create_sites(params, rank=2, alpha=1.0, train_method="full")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)

    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(MAX_STEPS)

    # fake "encoder": deterministic pseudo-embeddings per prompt string
    def encode_fn(prompt):
        seed = abs(hash(prompt)) % (2**31)
        k = jax.random.PRNGKey(seed)
        text = jax.random.normal(k, (SEQ, CTX_DIM)) * 0.1
        pooled = jax.random.normal(jax.random.fold_in(k, 1), (32,)) * 0.1 if xl else None
        return text, pooled

    settings = [
        PromptSettings(target="sky", positive="blue sky", action="enhance", guidance_scale=2.0, resolution=64),
        PromptSettings(target="person", positive="old person", unconditional="person", action="erase", resolution=64),
    ]
    bank = esd.build_prompt_bank(settings, encode_fn)
    return unet_apply, params, sites, lora_params, scheduler, schedule, bank


@pytest.mark.parametrize("xl", [False, True], ids=["sd", "xl"])
def test_train_step_runs_and_learns(xl):
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(xl)

    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1, remat_unet=False
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    add_tids = jnp.asarray(get_add_time_ids(64, 64)) if xl else None

    step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, ecfg, add_time_ids=add_tids
    )
    opt_state = opt.init(lora_params)

    # snapshot before stepping: the jitted step donates lora_params/opt_state
    initial = jax.tree.map(lambda a: np.asarray(a).copy(), lora_params)
    lp = lora_params
    losses = []
    for i in range(3):
        lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(100 + i), bank)
        losses.append(float(metrics["loss"]))

    assert all(np.isfinite(l) for l in losses)
    # up-weights start at zero; after steps they must have moved
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), jax.tree.map(lambda a, b: np.asarray(a) - b, lp, initial), 0.0
    )
    assert moved > 0


def test_batched_teacher_cfg_equals_separate_calls():
    """u + g(c−u) computed from a 4-row batch == three 2-row CFG calls."""
    key = jax.random.PRNGKey(0)
    u, p, n, neg = jax.random.normal(key, (4, 2, 4, 8, 8))
    g = 1.7
    # separate CFG pairs (reference predict_noise_xl:478-482 per branch)
    sep = [u + g * (x - u) for x in (p, n, neg)]
    # batched form used in train/esd.py
    batch = jnp.concatenate([u, p, n, neg], axis=0)
    eu, ep, en, eneg = jnp.split(batch, 4, axis=0)
    bat = [eu + g * (x - eu) for x in (ep, en, eneg)]
    for a, b in zip(sep, bat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_samples_per_step_vmap():
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, samples_per_step=2, remat_unet=False
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    step = esd.make_esd_train_step(unet_apply, sites, scheduler, schedule, opt, ecfg)
    opt_state = opt.init(lora_params)
    lp, opt_state, metrics = step(params, lora_params, opt_state, jax.random.PRNGKey(0), bank)
    assert np.isfinite(float(metrics["loss"]))


def test_fused_samples_matches_vmap_path():
    """samples_per_step>1: the fused row-batched path computes the same
    per-sample draws and (with a deterministic scheduler) the same mean loss
    as the vmapped divergent-loop path."""
    import dataclasses

    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from sliders_conceptmod_tpu.train import esd
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    cfg_u = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg_u)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)), jnp.zeros((1, 5, 32))
    )["params"]

    def unet_apply(p, s, t, c, added_cond_kwargs=None):
        return model.apply({"params": p}, s, t, c)

    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    # non-zero up weights so the student actually differs from the teacher
    lora_params = jax.tree.map(lambda a: a + 0.01, lora_params)

    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        return jax.random.normal(k, (5, 32)) * 0.1, None

    bank = esd.build_prompt_bank(
        [PromptSettings(target="sky", positive="blue sky", resolution=64)], encode_fn
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))

    losses = {}
    for fuse in (True, False):
        ecfg = esd.ESDConfig(
            max_denoising_steps=4,
            height=64,
            width=64,
            samples_per_step=3,
            remat_unet=False,
            fuse_samples=fuse,
        )
        step = esd.make_esd_train_step(unet_apply, sites, scheduler, schedule, opt, ecfg)
        lp = jax.tree.map(np.asarray, lora_params)  # fresh (donation)
        _, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank)
        losses[fuse] = float(metrics["loss"])

    assert losses[True] > 0
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_fused_samples_matches_vmap_path_with_cfg():
    """Same equivalence under active CFG (train_cfg_scale != 1): exercises
    the fused path's doubled rows and per-row-timestep tiling."""
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from sliders_conceptmod_tpu.train import esd
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    cfg_u = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg_u)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)), jnp.zeros((1, 5, 32))
    )["params"]

    def unet_apply(p, s, t, c, added_cond_kwargs=None):
        return model.apply({"params": p}, s, t, c)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lora_params = jax.tree.map(
        lambda a: a + 0.01, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    )
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)

    def encode_fn(prompt):
        k = jax.random.PRNGKey(sum(ord(c) for c in prompt) % 997)
        return jax.random.normal(k, (5, 32)) * 0.1, None

    bank = esd.build_prompt_bank(
        [PromptSettings(target="sky", positive="blue sky", resolution=64)], encode_fn
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))

    losses = {}
    for fuse in (True, False):
        ecfg = esd.ESDConfig(
            max_denoising_steps=4,
            train_cfg_scale=3.0,
            height=64,
            width=64,
            samples_per_step=2,
            remat_unet=False,
            fuse_samples=fuse,
        )
        step = esd.make_esd_train_step(unet_apply, sites, scheduler, schedule, opt, ecfg)
        lp = jax.tree.map(np.asarray, lora_params)
        _, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(11), bank)
        losses[fuse] = float(metrics["loss"])

    assert losses[True] > 0
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_pipeline_warmup_equivalence():
    """pipeline_warmup with lr=0 reproduces the unpipelined loss sequence
    exactly (staleness is invisible when params never change)."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    opt = optax.sgd(0.0)

    base_cfg = dict(max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False)
    step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, esd.ESDConfig(**base_cfg)
    )
    pstep = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt,
        esd.ESDConfig(pipeline_warmup=True, **base_cfg),
    )

    snapshot = jax.tree.map(lambda a: np.asarray(a).copy(), lora_params)  # step donates
    lp, st = lora_params, opt.init(lora_params)
    ref_losses = []
    for k in keys[:-1]:
        lp, st, m = step(params, lp, st, k, bank)
        ref_losses.append(float(m["loss"]))

    lp = jax.tree.map(jnp.asarray, snapshot)
    st = opt.init(lp)
    carry = pstep.init_carry(params, lp, keys[0], bank)
    pipe_losses = []
    for k in keys[1:]:
        lp, st, m, carry = pstep(params, lp, st, k, bank, carry)
        pipe_losses.append(float(m["loss"]))

    np.testing.assert_allclose(pipe_losses, ref_losses, rtol=1e-5)


def test_pipeline_warmup_trains():
    """With a real lr the pipelined step still reduces finite losses and
    moves the adapters (one-step-stale warm-up deviation)."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    pstep = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt,
        esd.ESDConfig(
            max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False,
            pipeline_warmup=True,
        ),
    )
    lp = lora_params
    st = opt.init(lp)
    initial = jax.tree.map(lambda a: np.asarray(a).copy(), lp)
    carry = pstep.init_carry(params, lp, jax.random.PRNGKey(0), bank)
    losses = []
    for i in range(3):
        lp, st, m, carry = pstep(params, lp, st, jax.random.PRNGKey(1 + i), bank, carry)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: np.asarray(a) - b, lp, initial),
        0.0,
    )
    assert moved > 0


@pytest.mark.parametrize("xl", [False, True], ids=["sd", "xl"])
def test_fuse_teacher_student_equivalence(xl):
    """fuse_teacher_student (one 4-row overlay call) reproduces the separate
    teacher+student losses exactly at lr=0."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(xl)
    keys = [jax.random.PRNGKey(300 + i) for i in range(3)]
    opt = optax.sgd(0.0)
    base_cfg = dict(max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False)

    # randomize up factors (zero-init makes the fused/default paths trivially equal)
    lora_params = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(9), a.shape) * 0.05, lora_params
    )
    snapshot = jax.tree.map(lambda a: np.asarray(a).copy(), lora_params)

    add_tids = jnp.asarray(get_add_time_ids(64, 64)) if xl else None
    step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, esd.ESDConfig(**base_cfg),
        add_time_ids=add_tids,
    )
    lp, st = lora_params, opt.init(lora_params)
    ref = []
    for k in keys:
        lp, st, m = step(params, lp, st, k, bank)
        ref.append(float(m["loss"]))

    fstep = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt,
        esd.ESDConfig(fuse_teacher_student=True, **base_cfg),
        add_time_ids=add_tids,
    )
    lp = jax.tree.map(jnp.asarray, snapshot)
    st = opt.init(lp)
    fused = []
    for k in keys:
        lp, st, m = fstep(params, lp, st, k, bank)
        fused.append(float(m["loss"]))

    np.testing.assert_allclose(fused, ref, rtol=2e-4)


def test_fuse_teacher_student_trains():
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    fstep = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt,
        esd.ESDConfig(
            max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False,
            fuse_teacher_student=True,
        ),
    )
    lp, st = lora_params, opt.init(lora_params)
    initial = jax.tree.map(lambda a: np.asarray(a).copy(), lp)
    losses = []
    for i in range(3):
        lp, st, m = fstep(params, lp, st, jax.random.PRNGKey(i), bank)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: np.asarray(a) - b, lp, initial),
        0.0,
    )
    assert moved > 0


def test_fuse_teacher_student_guards():
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    opt = optax.sgd(0.0)
    with pytest.raises(ValueError, match="guidance"):
        esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt,
            esd.ESDConfig(max_denoising_steps=MAX_STEPS, train_cfg_scale=3.0,
                          fuse_teacher_student=True),
        )
    with pytest.raises(ValueError, match="samples_per_step"):
        esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt,
            esd.ESDConfig(max_denoising_steps=MAX_STEPS, samples_per_step=2,
                          fuse_teacher_student=True),
        )


def test_dynamic_crops_draws_per_iteration():
    """dynamic_crops: time_ids are drawn in-graph per step — different keys
    give different crops, same key gives the same crop (reproducible from
    seed); the XL step trains with the flag on."""
    tids_a = esd.draw_time_ids(jax.random.PRNGKey(0), 64, 64)
    tids_b = esd.draw_time_ids(jax.random.PRNGKey(1), 64, 64)
    tids_a2 = esd.draw_time_ids(jax.random.PRNGKey(0), 64, 64)
    assert tids_a.shape == (1, 6)
    np.testing.assert_array_equal(np.asarray(tids_a), np.asarray(tids_a2))
    assert not np.array_equal(np.asarray(tids_a), np.asarray(tids_b))
    # reference ranges: original in [target, 3*target), crop inside overhang
    oh, ow, top, left, th, tw = np.asarray(tids_a)[0]
    assert 64 <= oh < 192 and 64 <= ow < 192
    assert 0 <= top <= oh - 64 and 0 <= left <= ow - 64
    assert (th, tw) == (64, 64)

    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(True)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt,
        esd.ESDConfig(
            max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False,
            dynamic_crops=True,
        ),
        add_time_ids=jnp.asarray(get_add_time_ids(64, 64)),
    )
    lp, st = lora_params, opt.init(lora_params)
    for i in range(2):
        lp, st, m = step(params, lp, st, jax.random.PRNGKey(i), bank)
        assert np.isfinite(float(m["loss"]))


def test_dynamic_crops_dp_fused_matches_vmap():
    """dynamic_crops composes with samples_per_step > 1: the per-sample
    crops are drawn from each sample's key (fold_in(key, 7), identical on
    the vmapped and fused paths), so both DP paths give the same loss."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(True)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))

    losses = {}
    for fuse in (True, False):
        step = esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt,
            esd.ESDConfig(
                max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False,
                samples_per_step=3, fuse_samples=fuse, dynamic_crops=True,
            ),
            add_time_ids=jnp.asarray(get_add_time_ids(64, 64)),
        )
        lp = jax.tree.map(np.asarray, lora_params)  # fresh (donation)
        _, _, m = step(params, lp, opt.init(lp), jax.random.PRNGKey(11), bank)
        losses[fuse] = float(m["loss"])

    assert losses[True] > 0
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


@pytest.mark.parametrize("xl", [False, True], ids=["sd", "xl"])
@pytest.mark.parametrize("fused", [False, True], ids=["one_sample", "fused4"])
def test_student_overlay_matches_merged_path(xl, fused):
    """ESDConfig.student_overlay (the tpu.quantize_base UNet route): the
    apply-time overlay step reproduces the merged-path losses up to matmul
    re-association — on an UNQUANTIZED base both must track each other
    closely over several steps."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(xl)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    add_tids = jnp.asarray(get_add_time_ids(64, 64)) if xl else None
    kw = dict(samples_per_step=4, fuse_samples=True) if fused else {}

    losses = {}
    # variants: merged; full overlay; overlay student + merged warm-up
    # (ESDConfig.overlay_warmup=False — the fusion-preserving bf16 route)
    for overlay, owarm in ((False, None), (True, None), (True, False)):
        ecfg = esd.ESDConfig(
            max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1,
            remat_unet=False, student_overlay=overlay, overlay_warmup=owarm, **kw,
        )
        step = esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt, ecfg, add_time_ids=add_tids
        )
        lp = jax.tree.map(jnp.copy, lora_params)
        opt_state = opt.init(jax.tree.map(jnp.copy, lora_params))
        ls = []
        for i in range(3):
            lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(7 + i), bank)
            ls.append(float(metrics["loss"]))
        losses[(overlay, owarm)] = ls
    np.testing.assert_allclose(losses[(True, None)], losses[(False, None)], rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(losses[(True, False)], losses[(False, None)], rtol=2e-3, atol=1e-6)


def test_student_overlay_over_quantized_base():
    """The full tpu.quantize_base composition on the UNet family: int8 base
    (dequant overlay innermost) + student LoRA (overlay outermost) trains —
    finite losses, moving LoRA params, and losses near the dequantized-base
    merged run."""
    from sliders_conceptmod_tpu.adapters import quant
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    qtree, q_scales = quant.quantize_params(params, min_elems=1)
    assert q_scales
    model = UNet2DConditionModel(UNetConfig.tiny())

    def q_apply(p, sample, t, ctx, added_cond_kwargs=None):
        with quant.quant_overlay(q_scales, compute_dtype=jnp.float32):
            return model.apply({"params": p}, sample, t, ctx)

    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1,
        remat_unet=False, student_overlay=True,
    )
    step = esd.make_esd_train_step(q_apply, sites, scheduler, schedule, opt, ecfg)
    lp = jax.tree.map(jnp.copy, lora_params)
    opt_state = opt.init(jax.tree.map(jnp.copy, lora_params))
    initial = jax.tree.map(lambda a: np.asarray(a).copy(), lora_params)
    q_losses = []
    for i in range(3):
        lp, opt_state, metrics = step(qtree, lp, opt_state, jax.random.PRNGKey(40 + i), bank)
        q_losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in q_losses)
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: np.asarray(a) - b, lp, initial), 0.0,
    )
    assert moved > 0

    # reference: merged path over the dequantized base — int8 rounding only
    deq = quant.dequantize_params(qtree, q_scales, jnp.float32)
    ref_ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1, remat_unet=False
    )
    ref_step = esd.make_esd_train_step(unet_apply, sites, scheduler, schedule, opt, ref_ecfg)
    rlp = jax.tree.map(jnp.copy, lora_params)
    r_opt = opt.init(jax.tree.map(jnp.copy, lora_params))
    r_losses = []
    for i in range(3):
        rlp, r_opt, metrics = ref_step(deq, rlp, r_opt, jax.random.PRNGKey(40 + i), bank)
        r_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(q_losses, r_losses, rtol=0.05, atol=1e-6)


def test_w8a8_warmup_step():
    """tpu.w8a8_warmup: the gradient-stopped warm-up runs W8A8 (int8
    activations over the int8 base) while teacher/student stay weight-only —
    the step trains (finite, moving params) and losses stay near the
    weight-only quantized run (warm-up rounding shifts the context latents
    only)."""
    from sliders_conceptmod_tpu.adapters import quant
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    qtree, q_scales = quant.quantize_params(params, min_elems=1)
    model = UNet2DConditionModel(UNetConfig.tiny())

    def q_apply(p, sample, t, ctx, added_cond_kwargs=None):
        with quant.quant_overlay(q_scales, compute_dtype=jnp.float32):
            return model.apply({"params": p}, sample, t, ctx)

    def w_apply(p, sample, t, ctx, added_cond_kwargs=None):
        with quant.quant_overlay(q_scales, compute_dtype=jnp.float32, act_quant=True):
            return model.apply({"params": p}, sample, t, ctx)

    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1,
        remat_unet=False, student_overlay=True,
    )
    losses = {}
    for warm in (None, w_apply):
        step = esd.make_esd_train_step(
            q_apply, sites, scheduler, schedule, opt, ecfg, warm_apply=warm
        )
        lp = jax.tree.map(jnp.copy, lora_params)
        opt_state = opt.init(jax.tree.map(jnp.copy, lora_params))
        ls = []
        for i in range(3):
            lp, opt_state, metrics = step(qtree, lp, opt_state, jax.random.PRNGKey(60 + i), bank)
            ls.append(float(metrics["loss"]))
        losses["w8a8" if warm is not None else "w8"] = ls
    assert all(np.isfinite(l) for l in losses["w8a8"])
    # warm-up rounding perturbs the denoised context, not the loss formula —
    # per-step losses must stay the same order of magnitude
    a, b = np.asarray(losses["w8a8"]), np.asarray(losses["w8"])
    assert np.all(np.abs(a - b) / np.maximum(np.abs(b), 1e-8) < 0.5), (a, b)


def test_warm_apply_requires_student_overlay():
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    ecfg = esd.ESDConfig(max_denoising_steps=MAX_STEPS, height=64, width=64, remat_unet=False)
    with pytest.raises(ValueError, match="student_overlay"):
        esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt, ecfg, warm_apply=unet_apply
        )


def test_student_overlay_grads_under_remat():
    """The production SDXL>512px quantize_base configuration: grads flow
    through lora_overlay's closed-over lp INSIDE jax.checkpoint (remat_unet
    with the dots-saveable policy). Equivalent losses to the no-remat overlay
    step and non-zero movement (remat must not silence the closure grads)."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(True)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    add_tids = jnp.asarray(get_add_time_ids(64, 64))

    losses = {}
    moved = {}
    for remat in (False, True):
        ecfg = esd.ESDConfig(
            max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1,
            remat_unet=remat, student_overlay=True,
        )
        step = esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt, ecfg, add_time_ids=add_tids
        )
        lp = jax.tree.map(jnp.copy, lora_params)
        opt_state = opt.init(jax.tree.map(jnp.copy, lora_params))
        initial = jax.tree.map(lambda a: np.asarray(a).copy(), lora_params)
        ls = []
        for i in range(2):
            lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(80 + i), bank)
            ls.append(float(metrics["loss"]))
        losses[remat] = ls
        moved[remat] = jax.tree.reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))),
            jax.tree.map(lambda a, b: np.asarray(a) - b, lp, initial), 0.0,
        )
    assert moved[True] > 0  # remat did not zero the closure grads
    # remat recomputes, never changes math
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4, atol=1e-7)


def test_dual_tree_warm_params():
    """Dual-tree w8a8 warm-up (tpu.w8a8_warmup WITHOUT quantize_base,
    train/trainer.py): the step's optional trailing ``warm_params`` tree is
    consumed by the warm-up chain only. Three properties: (a) plumbing
    identity — warm_params = a copy of base_params with a pass-through
    warm_apply reproduces the no-warm_params overlay step bit-for-bit;
    (b) the warm-up actually reads warm_params (a zeroed warm tree changes
    the loss); (c) the real int8+act-quant warm copy trains finite with
    losses near the bf16 run (rounding shifts only the context latents)."""
    from sliders_conceptmod_tpu.adapters import quant

    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, batch_size=1,
        remat_unet=False, student_overlay=True, overlay_warmup=True,
    )

    def run(step, warm_tree, seed0=90, n=3):
        lp = jax.tree.map(jnp.copy, lora_params)
        opt_state = opt.init(jax.tree.map(jnp.copy, lora_params))
        ls = []
        for i in range(n):
            lp, opt_state, metrics = step(
                params, lp, opt_state, jax.random.PRNGKey(seed0 + i), bank, warm_tree
            )
            ls.append(float(metrics["loss"]))
        return ls

    # (a) pass-through warm_apply + copy-of-base warm tree == plain overlay step
    ref_step = esd.make_esd_train_step(unet_apply, sites, scheduler, schedule, opt, ecfg)
    dual_step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, ecfg, warm_apply=unet_apply
    )
    ref_ls = run(ref_step, None)
    same_ls = run(dual_step, jax.tree.map(jnp.copy, params))
    np.testing.assert_array_equal(ref_ls, same_ls)

    # (b) the warm-up reads warm_params, not base_params
    zero_ls = run(dual_step, jax.tree.map(jnp.zeros_like, params))
    assert not np.allclose(ref_ls, zero_ls), (ref_ls, zero_ls)

    # (c) int8 + act-quant warm copy (the production dual-tree shape)
    warm_tree, q_scales = quant.quantize_params(params, min_elems=1)

    def w8a8_warm(p, sample, t, ctx, added_cond_kwargs=None):
        with quant.quant_overlay(q_scales, compute_dtype=jnp.float32, act_quant=True):
            return unet_apply(p, sample, t, ctx, added_cond_kwargs=added_cond_kwargs)

    q_step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, ecfg, warm_apply=w8a8_warm
    )
    q_ls = run(q_step, warm_tree)
    assert all(np.isfinite(l) for l in q_ls)
    a, b = np.asarray(q_ls), np.asarray(ref_ls)
    assert np.all(np.abs(a - b) / np.maximum(np.abs(b), 1e-8) < 0.5), (a, b)


def test_dual_tree_trainer_end_to_end(tmp_path):
    """tpu.w8a8_warmup without quantize_base drives the SD1 trainer through
    the dual-tree route (int8 warm copy built at setup, warm_params through
    the step signature) — tiny CPU e2e; the tiny kernels sit below
    QUANT_MIN_ELEMS so the copy is a pass-through, which exactly exercises
    the plumbing (test_dual_tree_warm_params covers the int8 math)."""
    from sliders_conceptmod_tpu.core import config as config_util
    from sliders_conceptmod_tpu.train import trainer as sd_trainer

    cfg = config_util.load_config_from_yaml("data/config-tiny.yaml")
    cfg.train.iterations = 3
    cfg.tpu.w8a8_warmup = True
    assert not cfg.tpu.quantize_base
    cfg.save.path = str(tmp_path)
    prompts = [PromptSettings(target="person", resolution=64)]
    result = sd_trainer.train(cfg, prompts, rank=2, save_file=False)
    assert all(np.isfinite(l) for l in result.losses)


def test_shared_snapshots_match_partial_chain():
    """denoise_shared_snapshots row b == denoise_partial run t_b steps with
    the SAME key (the snapshot rows are literally states of one chain)."""
    from sliders_conceptmod_tpu.diffusion.sampling import (
        denoise_partial,
        denoise_shared_snapshots,
    )

    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    lat0 = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 8, 8)) * schedule.init_noise_sigma
    rows = bank.text[0, esd.ROLE_TARGET][None]
    key = jax.random.PRNGKey(3)
    steps = jnp.asarray([2, 4])
    snaps = denoise_shared_snapshots(
        unet_apply, params, scheduler, schedule, lat0, rows, key,
        total_steps=steps, guidance_scale=1.0,
    )
    for i, t in enumerate([2, 4]):
        ref = denoise_partial(
            unet_apply, params, scheduler, schedule, lat0, rows, key,
            total_steps=t, guidance_scale=1.0,
        )
        np.testing.assert_allclose(np.asarray(snaps[i : i + 1]), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("xl", [False, True], ids=["sd", "xl"])
def test_share_warmup_step_trains(xl):
    """The fused step with share_warmup runs, yields finite loss, and moves
    the adapter; the per-step samples all read one shared-pair chain."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(xl)
    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, samples_per_step=2,
        remat_unet=False, share_warmup=True,
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, ecfg,
        add_time_ids=jnp.asarray(get_add_time_ids(64, 64)) if xl else None,
    )
    opt_state = opt.init(lora_params)
    before = jax.tree.map(np.asarray, lora_params)
    lp, opt_state, metrics = step(params, lora_params, opt_state, jax.random.PRNGKey(0), bank)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(lp), jax.tree.leaves(before))
    )
    assert moved


def test_share_warmup_guards():
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(False)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    with pytest.raises(ValueError, match="share_warmup"):
        esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt,
            esd.ESDConfig(max_denoising_steps=MAX_STEPS, height=64, width=64,
                          samples_per_step=1, share_warmup=True),
        )
    with pytest.raises(ValueError, match="share_warmup"):
        esd.make_esd_train_step(
            unet_apply, sites, scheduler, schedule, opt,
            esd.ESDConfig(max_denoising_steps=MAX_STEPS, height=64, width=64,
                          samples_per_step=2, fuse_samples=False, share_warmup=True),
        )


def test_share_warmup_with_dynamic_crops():
    """share_warmup + dynamic_crops: the shared chain rides sample 0's crop
    while teacher/student keep per-sample time_ids — step runs, finite loss."""
    unet_apply, params, sites, lora_params, scheduler, schedule, bank = _setup(True)
    ecfg = esd.ESDConfig(
        max_denoising_steps=MAX_STEPS, height=64, width=64, samples_per_step=2,
        remat_unet=False, share_warmup=True, dynamic_crops=True,
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    step = esd.make_esd_train_step(
        unet_apply, sites, scheduler, schedule, opt, ecfg,
        add_time_ids=jnp.asarray(get_add_time_ids(64, 64)),
    )
    _, _, metrics = step(params, lora_params, opt.init(lora_params), jax.random.PRNGKey(0), bank)
    assert np.isfinite(float(metrics["loss"]))
