"""SD3 trainer share_warmup (r5, VERDICT r4 task 1): the shared-prefix
warm-up — one batch-1 flow chain to max(t_k), per-sample trajectory
snapshots — extended from train/esd.py to the family where warm-up is the
largest step share (SD3's 28-step flow chain, BASELINE.md).

Equivalence strategy: the flow step is deterministic, so the snapshot rows
ARE the per-chain states; when every sample's t_k coincides the share path
reduces EXACTLY to the vmap path's sample-0 computation — asserted to
numerical identity below (losses and the post-step adapter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core.prompts import PromptSettings
from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler
from sliders_conceptmod_tpu.train import esd, esd_sd3
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def _setup(n_pairs=2):
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel

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
    lora_params = jax.tree.map(
        lambda x: x + 0.01, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    )

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return (
            jax.random.normal(k, (5, cfg.joint_attention_dim)) * 0.1,
            jax.random.normal(k, (cfg.pooled_projection_dim,)) * 0.1,
        )

    prompts = [PromptSettings(target=t, resolution=16) for t in ["sky", "tree"][:n_pairs]]
    bank = esd.build_prompt_bank(prompts, encode_fn)
    schedule = FlowMatchScheduler(shift=3.0).set_timesteps(4)
    return apply, params, sites, lora_params, schedule, bank


def _make_step(apply, sites, schedule, scfg, **kw):
    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10), grad_clip_norm=0.2)
    return opt, esd_sd3.make_sd3_esd_train_step(apply, sites, schedule, opt, scfg, **kw)


@pytest.mark.parametrize("student_overlay", [False, True], ids=["merged", "overlay"])
def test_sd3_share_warmup_step_trains(student_overlay):
    """share_warmup step runs, yields finite loss, and moves the adapter —
    on both the merged-student and overlay-student paths."""
    apply, params, sites, lora_params, schedule, bank = _setup()
    scfg = esd_sd3.SD3ESDConfig(
        max_denoising_steps=4, height=16, width=16, vae_scale=2, remat=False,
        samples_per_step=3, share_warmup=True,
    )
    opt, step = _make_step(apply, sites, schedule, scfg, student_overlay=student_overlay)
    before = jax.tree.map(np.asarray, lora_params)
    lp, _, metrics = step(params, lora_params, opt.init(lora_params), jax.random.PRNGKey(0), bank)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(lp), jax.tree.leaves(before))
    )
    assert moved


def test_sd3_share_warmup_guards():
    apply, params, sites, lora_params, schedule, bank = _setup()
    for bad in (
        dict(samples_per_step=1),
        dict(samples_per_step=2, batch_size=2),
    ):
        with pytest.raises(ValueError, match="share_warmup"):
            _make_step(
                apply, sites, schedule,
                esd_sd3.SD3ESDConfig(
                    max_denoising_steps=4, height=16, width=16, vae_scale=2,
                    remat=False, share_warmup=True, **bad,
                ),
            )


@pytest.mark.parametrize("student_overlay", [False, True], ids=["merged", "overlay"])
def test_sd3_share_warmup_matches_vmap_when_tk_coincides(student_overlay):
    """max_denoising_steps=2 pins every sample's t_k to 1, so the share path
    (shared pair + latent from sample 0's key, snapshots of one chain) must
    compute EXACTLY the vmap path's sample-0 loss/grads — the share step with
    S=2 equals the S=1 step driven with keys[0]."""
    apply, params, sites, lora_params, schedule, bank = _setup()
    common = dict(max_denoising_steps=2, height=16, width=16, vae_scale=2, remat=False)
    opt, share_step = _make_step(
        apply, sites, schedule,
        esd_sd3.SD3ESDConfig(samples_per_step=2, share_warmup=True, **common),
        student_overlay=student_overlay,
    )
    _, one_step = _make_step(
        apply, sites, schedule,
        esd_sd3.SD3ESDConfig(samples_per_step=1, **common),
        student_overlay=student_overlay,
    )
    key = jax.random.PRNGKey(7)
    lp_a = jax.tree.map(jnp.copy, lora_params)
    lp_b = jax.tree.map(jnp.copy, lora_params)
    lp_a, _, m_a = share_step(params, lp_a, opt.init(lp_a), key, bank)
    lp_b, _, m_b = one_step(params, lp_b, opt.init(lp_b), jax.random.split(key, 2)[0], bank)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-6)
    # atol 5e-6: the share path averages two bit-identical per-sample losses
    # (vmap reduction) where the S=1 path has none — one fp32 rounding step
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6),
        jax.device_get(lp_a),
        jax.device_get(lp_b),
    )


def test_sd3_share_warmup_snapshots_vary_with_tk():
    """With max_denoising_steps large enough for distinct t_k, per-sample
    losses must actually read DIFFERENT snapshot depths — guard that the
    share path isn't silently returning one shared context for all rows
    (grads from S=2 with distinct t_k differ from any single-t step)."""
    apply, params, sites, lora_params, schedule, bank = _setup(n_pairs=1)
    common = dict(max_denoising_steps=4, height=16, width=16, vae_scale=2, remat=False)
    opt, share_step = _make_step(
        apply, sites, schedule,
        esd_sd3.SD3ESDConfig(samples_per_step=2, share_warmup=True, **common),
    )
    _, one_step = _make_step(
        apply, sites, schedule, esd_sd3.SD3ESDConfig(samples_per_step=1, **common)
    )
    # find a key whose two sampled t_k differ
    key = None
    for seed in range(20):
        cand = jax.random.PRNGKey(seed)
        ks = jax.random.split(cand, 2)
        ts = [int(jax.random.randint(jax.random.split(k, 3)[1], (), 1, 4)) for k in ks]
        if ts[0] != ts[1]:
            key = cand
            break
    assert key is not None
    lp_a = jax.tree.map(jnp.copy, lora_params)
    lp_b = jax.tree.map(jnp.copy, lora_params)
    lp_a, _, m_a = share_step(params, lp_a, opt.init(lp_a), key, bank)
    lp_b, _, m_b = one_step(params, lp_b, opt.init(lp_b), jax.random.split(key, 2)[0], bank)
    assert float(m_a["loss"]) != pytest.approx(float(m_b["loss"]), rel=1e-9)
