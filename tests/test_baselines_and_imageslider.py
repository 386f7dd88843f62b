"""Baseline generators (UCE / TI) + visual-slider step unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.eval import baselines
from sliders_conceptmod_tpu.train import imageslider
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def test_uce_sample_switches_params():
    """The edited params must be the ones used below start_noise."""
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)

    calls = []

    def unet_apply(params, latents, t, emb, added_cond_kwargs=None):
        calls.append(params["tag"])
        return jnp.zeros_like(latents)

    lat = jnp.zeros((1, 4, 4, 4))
    emb = jnp.zeros((2, 3, 8))
    baselines.uce_sample(
        unet_apply,
        {"tag": "orig"},
        {"tag": "edited"},
        scheduler,
        schedule,
        lat,
        emb,
        jax.random.PRNGKey(0),
        start_noise=500,
    )
    # 4 DDIM steps at timesteps [750, 500, 250, 0]: phase A (original) traces
    # first, phase B (edited) second — each fori_loop body traces once
    assert calls == ["orig", "edited"]


def test_textual_inversion_injection():
    params = {"token_embedding": {"embedding": jnp.zeros((16, 4))}}
    vec = np.arange(4, dtype=np.float32)
    new = baselines.inject_textual_inversion_token(params, vec, token_id=7)
    emb = np.asarray(new["token_embedding"]["embedding"])
    np.testing.assert_array_equal(emb[7], vec)
    assert emb[6].sum() == 0
    # original untouched
    assert np.asarray(params["token_embedding"]["embedding"])[7].sum() == 0


def test_image_slider_step_runs_and_moves():
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)), jnp.zeros((1, 5, 32))
    )["params"]

    def unet_apply(p, s, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, s, t, ctx)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)

    bank = imageslider.ImageBank(
        mean=jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 8, 8)) * 0.1,
        logvar=jnp.full((2, 3, 4, 8, 8), -6.0),
        pair_table=jnp.asarray([[0, 1]], jnp.int32),
        pair_scales=jnp.asarray([1.0]),
    )
    emb = jax.random.normal(jax.random.PRNGKey(3), (5, 32)) * 0.1
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    step = imageslider.make_image_slider_step(
        unet_apply,
        sites,
        scheduler,
        schedule,
        opt,
        imageslider.ImageSliderConfig(max_denoising_steps=4),
        positive_emb=emb,
        neutral_emb=emb * 0.5,
        uncond_emb=emb * 0.1,
    )
    opt_state = opt.init(lp)
    initial = jax.tree.map(lambda a: np.asarray(a).copy(), lp)
    for i in range(2):
        lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(i), bank)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: np.asarray(a) - b, lp, initial),
        0.0,
    )
    assert moved > 0


@pytest.mark.parametrize("xl", [False, True], ids=["sd", "xl"])
def test_image_slider_overlay_matches_merged(xl):
    """make_image_slider_step(student_overlay=True) — the fused 2-row
    ±scale overlay call (tpu.student_overlay) reproduces the reference's
    two merged ±scale passes up to matmul re-association, over several
    steps, on both the SD1 and XL (text_time conditioning) paths."""
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.tiny_xl() if xl else UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 8, 8)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, 32)),
        added_cond_kwargs={"text_embeds": jnp.zeros((1, 32)), "time_ids": jnp.zeros((1, 6))}
        if xl
        else None,
    )["params"]

    def unet_apply(p, s, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, s, t, ctx, added_cond_kwargs=added_cond_kwargs)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lp0 = jax.tree.map(
        lambda a: a + 0.02, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    )
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)

    bank = imageslider.ImageBank(
        mean=jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 8, 8)) * 0.1,
        logvar=jnp.full((2, 3, 4, 8, 8), -6.0),
        pair_table=jnp.asarray([[0, 1]], jnp.int32),
        pair_scales=jnp.asarray([1.5]),
    )
    emb = jax.random.normal(jax.random.PRNGKey(3), (5, 32)) * 0.1
    pooled = (
        {
            "positive": jax.random.normal(jax.random.PRNGKey(4), (32,)) * 0.1,
            "neutral": jax.random.normal(jax.random.PRNGKey(5), (32,)) * 0.1,
            "uncond": jnp.zeros((32,)),
        }
        if xl
        else None
    )
    add_tids = jnp.asarray([[8.0, 8.0, 0.0, 0.0, 8.0, 8.0]]) if xl else None

    losses = {}
    for overlay in (False, True):
        opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
        step = imageslider.make_image_slider_step(
            unet_apply, sites, scheduler, schedule, opt,
            imageslider.ImageSliderConfig(max_denoising_steps=4),
            positive_emb=emb, neutral_emb=emb * 0.5, uncond_emb=emb * 0.1,
            pooled=pooled, add_time_ids=add_tids,
            student_overlay=overlay,
        )
        lp = jax.tree.map(jnp.copy, lp0)
        opt_state = opt.init(jax.tree.map(jnp.copy, lp0))
        ls = []
        for i in range(3):
            lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(9 + i), bank)
            ls.append(float(metrics["loss"]))
        losses[overlay] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-3, atol=1e-7)
