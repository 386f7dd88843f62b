"""Sample-DP on the SD3/Flux/Cascade families (r2): samples_per_step > 1
vmaps independent ESD samples through esd.sampled_loss_and_grad, and under a
mesh the sample axis shards over the data axis WITHOUT an ambient mesh
context (cfg.mesh binds the constraints as NamedShardings — the trainer-CLI
path). Equivalence: sharded == unsharded to float tolerance (psum order).

Reference: these trainers are single-GPU scripts (SURVEY §2.2 absence
inventory); for Flux, samples_per_step folds the reference's sequential
grad-accumulation chain (train_lora_flux.py:222-226) into per-step DP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.prompts import PromptSettings
from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
from sliders_conceptmod_tpu.parallel import mesh as mesh_lib
from sliders_conceptmod_tpu.train import esd
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _assert_match(run):
    loss_u, lp_u = run(False)
    loss_s, lp_s = run(True)
    assert loss_s == pytest.approx(loss_u, rel=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4),
        lp_u,
        lp_s,
    )


@needs_mesh
def test_sd3_sharded_samples_match_unsharded():
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
    from sliders_conceptmod_tpu.train import esd_sd3

    cfg = MMDiTConfig.tiny()
    m = SD3Transformer2DModel(cfg)
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 8, 8)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)),
    )["params"]

    def apply(p, *a):
        return m.apply({"params": p}, *a)

    sites = lora_lib.create_sites(params, rank=2, delimiter="-", train_method="full")
    lora_params = jax.tree.map(lambda x: x + 0.01, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites))

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return (
            jax.random.normal(k, (5, cfg.joint_attention_dim)) * 0.1,
            jax.random.normal(k, (cfg.pooled_projection_dim,)) * 0.1,
        )

    bank = esd.build_prompt_bank([PromptSettings(target="sky", resolution=16)], encode_fn)
    schedule = FlowMatchScheduler(shift=3.0).set_timesteps(4)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)

    def run(shard: bool):
        scfg = esd_sd3.SD3ESDConfig(
            max_denoising_steps=4, height=16, width=16, vae_scale=2, remat=False,
            samples_per_step=8, shard_samples=shard,
            mesh=mesh_lib.make_mesh() if shard else None,
        )
        step = esd_sd3.make_sd3_esd_train_step(apply, sites, schedule, opt, scfg)
        lp = jax.tree.map(jnp.copy, lora_params)
        lp, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank)
        return float(metrics["loss"]), jax.device_get(lp)

    _assert_match(run)


@needs_mesh
def test_flux_sharded_samples_match_unsharded():
    from sliders_conceptmod_tpu.models import flux
    from sliders_conceptmod_tpu.train import esd_flux

    cfg = flux.FluxConfig.tiny()
    m = flux.FluxTransformer2DModel(cfg)
    gh = gw = 4
    txt_seq = 3
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, gh * gw, cfg.in_channels)),
        jnp.asarray([0.5]),
        jnp.zeros((1, txt_seq, 32)),
        jnp.zeros((1, 32)),
        jnp.zeros((txt_seq, 3)),
        jnp.asarray(flux.prepare_latent_image_ids(gh, gw)),
    )["params"]

    def apply(p, *a, **kw):
        return m.apply({"params": p}, *a, **kw)

    sites = lora_lib.create_sites(params, rank=2, delimiter="-", train_method="full")
    lora_params = jax.tree.map(lambda x: x + 0.01, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites))

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return jax.random.normal(k, (txt_seq, 32)) * 0.1, jax.random.normal(k, (32,)) * 0.1

    bank = esd.build_prompt_bank([PromptSettings(target="sky", resolution=16)], encode_fn)
    schedule = FlowMatchScheduler(use_dynamic_shifting=True).set_timesteps(
        8, mu=calculate_shift(gh * gw)
    )
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_value=1.0)

    def run(shard: bool):
        fcfg = esd_flux.FluxESDConfig(
            batch_size=1, height=16, width=16, latent_channels=cfg.in_channels // 4,
            vae_scale=2, remat=False,
            samples_per_step=8, shard_samples=shard,
            mesh=mesh_lib.make_mesh() if shard else None,
        )
        step = esd_flux.make_flux_esd_train_step(apply, sites, schedule, opt, fcfg)
        lp = jax.tree.map(jnp.copy, lora_params)
        lp, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank)
        return float(metrics["loss"]), jax.device_get(lp)

    _assert_match(run)


@needs_mesh
def test_cascade_sharded_samples_match_unsharded():
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet
    from sliders_conceptmod_tpu.train import esd_cascade

    cfg = CascadeConfig.tiny()
    m = StableCascadeUNet(cfg)
    lh = lw = 4
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, lh, lw)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.clip_text_in_channels)),
        jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels)),
        jnp.zeros((1, 1, cfg.clip_image_in_channels)),
    )["params"]

    def apply(p, *a):
        return m.apply({"params": p}, *a)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lora_params = jax.tree.map(lambda x: x + 0.01, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites))

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
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))

    def run(shard: bool):
        ccfg = esd_cascade.CascadeESDConfig(
            max_denoising_steps=4, height=64, width=64,
            latent_channels=cfg.in_channels, resolution_multiple=16.0, remat=False,
            samples_per_step=8, shard_samples=shard,
            mesh=mesh_lib.make_mesh() if shard else None,
        )
        step = esd_cascade.make_cascade_esd_train_step(
            apply, sites, scheduler, schedule, opt, ccfg,
            empty_text=empty_text, empty_pooled=empty_pooled,
            clip_image_dim=cfg.clip_image_in_channels,
        )
        lp = jax.tree.map(jnp.copy, lora_params)
        lp, _, metrics = step(params, lp, opt.init(lp), jax.random.PRNGKey(7), bank)
        return float(metrics["loss"]), jax.device_get(lp)

    _assert_match(run)
