"""Mesh data parallelism: sharded sample axis computes the same step as
unsharded (same keys → same loss/params), on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.prompts import PromptSettings
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
from sliders_conceptmod_tpu.parallel import mesh as mesh_lib
from sliders_conceptmod_tpu.train import esd
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_unsharded():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)), jnp.zeros((1, 5, 32))
    )["params"]

    def unet_apply(p, s, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, s, t, ctx)

    sites = lora_lib.create_sites(params, rank=2, train_method="full")
    lora_params = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    lora_params = jax.tree.map(lambda x: x + 0.01, lora_params)

    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(3)

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return jax.random.normal(k, (5, 32)) * 0.1, None

    bank = esd.build_prompt_bank([PromptSettings(target="sky", resolution=64)], encode_fn)
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))

    def run(shard: bool):
        ecfg = esd.ESDConfig(
            max_denoising_steps=3,
            height=64,
            width=64,
            samples_per_step=8,
            shard_samples=shard,
            remat_unet=False,
        )
        step = esd.make_esd_train_step(unet_apply, sites, scheduler, schedule, opt, ecfg)
        lp = jax.tree.map(jnp.copy, lora_params)
        opt_state = opt.init(lp)
        if shard:
            m = mesh_lib.make_mesh()
            with m:
                lp = jax.device_put(lp, mesh_lib.replicated(m))
                opt_state = jax.device_put(opt_state, mesh_lib.replicated(m))
                b = jax.device_put(bank, mesh_lib.replicated(m))
                lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(7), b)
        else:
            lp, opt_state, metrics = step(params, lp, opt_state, jax.random.PRNGKey(7), bank)
        return float(metrics["loss"]), jax.device_get(lp)

    loss_u, lp_u = run(False)
    loss_s, lp_s = run(True)
    # cross-device psum reduction order differs from the single-device sum —
    # agreement is to float tolerance, not bitwise
    assert loss_s == pytest.approx(loss_u, rel=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4),
        lp_u,
        lp_s,
    )


def test_ptp_helpers():
    from sliders_conceptmod_tpu.infer import ptp
    from sliders_conceptmod_tpu.models.tokenizer import HashTokenizer

    tok = HashTokenizer(max_length=16)
    inds = ptp.get_word_inds("a happy person", "happy", tok)
    assert list(inds) == [2]  # bos at 0, 'a' at 1, 'happy' at 2
    w = ptp.token_weights(16, inds, 4.0)
    assert w[2] == 4.0 and w[1] == 1.0
    alpha = ptp.time_words_attention_alpha(
        ["a person", "a happy person"], 10, {"default_": 0.8, "happy": 0.4}, tok, max_num_words=16
    )
    assert alpha.shape == (11, 1, 16)
    assert alpha[:, 0, 2].sum() == 4  # happy active 40% of 10 steps
    assert alpha[:, 0, 0].sum() == 8  # default 80%


def test_training_mesh_from_config_validates_data_axis():
    """tpu.samples_per_step must divide the data axis cleanly: explicit
    mismatches raise a readable error at config time (not a cryptic sharding
    failure inside the first train step); the -1 default auto-shrinks to a
    divisor instead of silently building an unusable mesh."""
    from types import SimpleNamespace

    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

    def cfg(**kw):
        base = dict(coordinator_address=None, num_processes=None, process_id=None,
                    mesh_data=-1, mesh_model=1)
        base.update(kw)
        return SimpleNamespace(**base)

    # explicit mesh_data that does not divide samples_per_step: loud error
    with pytest.raises(ValueError, match="divisible"):
        mesh_lib.training_mesh_from_config(cfg(mesh_data=8), samples_per_step=4)

    # default -1 on the 8-device CPU runtime with 4 samples: shrink to 4
    m = mesh_lib.training_mesh_from_config(cfg(), samples_per_step=4)
    assert m.shape["data"] == 4

    # 6 samples on 8 devices: gcd -> 2
    m = mesh_lib.training_mesh_from_config(cfg(), samples_per_step=6)
    assert m.shape["data"] == 2

    # pure TP (samples_per_step=1): data axis degrades to 1
    m = mesh_lib.training_mesh_from_config(cfg(mesh_model=2), samples_per_step=1)
    assert m.shape["data"] == 1 and m.shape["model"] == 2

    # divisible request honored exactly
    m = mesh_lib.training_mesh_from_config(cfg(mesh_data=2), samples_per_step=8)
    assert m.shape["data"] == 2
