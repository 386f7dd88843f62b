"""Stable Cascade path: Würstchen scheduler math, Stage-C model shape/sites,
tiny end-to-end trainer (reference train_lora_cascade.py semantics)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.diffusion.wuerstchen import (
    WuerstchenScheduler,
    get_t_conditioning,
)


def _torch_get_t_conditioning(t, alphas_cumprod):
    # reference conceptmod/textsliders/train_util.py:710-718, verbatim math
    s = torch.tensor([0.003])
    min_var = torch.cos(s / (1 + s) * torch.pi * 0.5) ** 2
    var = alphas_cumprod[t].clamp(0, 1)
    return (((var * min_var) ** 0.5).acos() / (torch.pi * 0.5)) * (1 + s) - s


class TestWuerstchenScheduler:
    def test_alpha_cumprod_endpoints(self):
        s = WuerstchenScheduler()
        # ratio 0 = clean (ᾱ→0.9999 clip), ratio 1 = pure noise (ᾱ→1e-4 clip)
        assert float(s.alpha_cumprod(jnp.float32(0.0))) == pytest.approx(0.9999)
        assert float(s.alpha_cumprod(jnp.float32(1.0))) == pytest.approx(1e-4)

    def test_alpha_cumprod_matches_torch_formula(self):
        s = WuerstchenScheduler()
        t = np.linspace(0.0, 1.0, 17)
        ours = np.asarray(s.alpha_cumprod(jnp.asarray(t, jnp.float32)))
        st = torch.tensor([0.008])
        init = torch.cos(st / (1 + st) * torch.pi * 0.5) ** 2
        theirs = (torch.cos((torch.tensor(t) + st) / (1 + st) * torch.pi * 0.5) ** 2 / init).clamp(
            1e-4, 0.9999
        )
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-5)

    def test_schedule_ratios(self):
        sched = WuerstchenScheduler().set_timesteps(20)
        ts = np.asarray(sched.timesteps)
        assert ts.shape == (21,)
        assert ts[0] == 1.0 and ts[-1] == 0.0

    def test_step_formula(self):
        s = WuerstchenScheduler()
        sched = s.set_timesteps(4)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 2))
        eps = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 2))
        out = np.asarray(s.step(sched, eps, 0, x, key))
        # hand-derive mu + std·noise with the diffusers formula
        t, t_prev = 1.0, 0.75
        a = float(s.alpha_cumprod(jnp.float32(t)))
        a_prev = float(s.alpha_cumprod(jnp.float32(t_prev)))
        alpha = a / a_prev
        mu = (1 / alpha) ** 0.5 * (np.asarray(x) - (1 - alpha) * np.asarray(eps) / (1 - a) ** 0.5)
        noise = np.asarray(jax.random.normal(key, x.shape, jnp.float32))
        std = ((1 - alpha) * (1 - a_prev) / (1 - a)) ** 0.5 * noise
        np.testing.assert_allclose(out, mu + std, rtol=1e-4, atol=1e-5)

    def test_final_step_deterministic(self):
        """prev ratio 0 ⇒ no ancestral noise (diffusers (prev_t != 0) mask)."""
        s = WuerstchenScheduler()
        sched = s.set_timesteps(4)
        x = jnp.ones((1, 4, 2, 2))
        eps = jnp.zeros_like(x)
        a = s.step(sched, eps, 3, x, jax.random.PRNGKey(0))
        b = s.step(sched, eps, 3, x, jax.random.PRNGKey(99))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_add_noise_roundtrip(self):
        s = WuerstchenScheduler()
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 3))
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3, 3))
        xt = s.add_noise(None, x0, noise, jnp.float32(0.5))
        a = float(s.alpha_cumprod(jnp.float32(0.5)))
        expected = a**0.5 * np.asarray(x0) + (1 - a) ** 0.5 * np.asarray(noise)
        np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5)


class TestTConditioning:
    def test_matches_reference_torch_formula(self):
        from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler

        sched = NoiseScheduler("euler_a").set_timesteps(20)
        acp = np.asarray(sched.alphas_cumprod)
        for t in [0, 49, 499, 950, 999]:
            ours = float(get_t_conditioning(jnp.int32(t), jnp.asarray(acp)))
            theirs = float(_torch_get_t_conditioning(torch.tensor([t]), torch.tensor(acp)))
            assert ours == pytest.approx(theirs, rel=1e-4), t

    def test_monotone_in_noise(self):
        from sliders_conceptmod_tpu.diffusion.schedulers import NoiseScheduler

        acp = jnp.asarray(np.asarray(NoiseScheduler("ddim").set_timesteps(10).alphas_cumprod))
        ratios = [float(get_t_conditioning(jnp.int32(t), acp)) for t in [0, 250, 500, 750, 999]]
        assert all(b > a for a, b in zip(ratios, ratios[1:]))


class TestCascadeModel:
    @pytest.fixture(scope="class")
    def tiny(self):
        from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet

        cfg = CascadeConfig.tiny()
        model = StableCascadeUNet(cfg)
        x = jnp.zeros((2, cfg.in_channels, 4, 4))
        params = model.init(
            jax.random.PRNGKey(0),
            x,
            jnp.zeros((2,)),
            jnp.zeros((2, 3, cfg.clip_text_in_channels)),
            jnp.zeros((2, 1, cfg.clip_text_pooled_in_channels)),
            jnp.zeros((2, 1, cfg.clip_image_in_channels)),
        )["params"]
        return cfg, model, params

    def test_forward_shape(self, tiny):
        cfg, model, params = tiny
        x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.in_channels, 4, 4))
        out = model.apply(
            {"params": params},
            x,
            jnp.full((2,), 0.7),
            jax.random.normal(jax.random.PRNGKey(2), (2, 3, cfg.clip_text_in_channels)),
            jax.random.normal(jax.random.PRNGKey(3), (2, 1, cfg.clip_text_pooled_in_channels)),
            jnp.zeros((2, 1, cfg.clip_image_in_channels)),
        )
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_param_paths_mirror_diffusers(self, tiny):
        cfg, model, params = tiny
        # diffusers StableCascadeUNet state-dict structure
        assert "embedding_1" in params and "clf_1" in params
        assert "clip_txt_mapper" in params and "clip_txt_pooled_mapper" in params
        assert "down_downscalers_1_1" in params and "up_upscalers_0_1" in params
        res = params["down_blocks_0_0"]
        assert set(res) >= {"depthwise", "channelwise_0", "channelwise_2", "channelwise_4"}
        ts = params["down_blocks_0_1"]
        assert set(ts) == {"mapper", "mapper_sca", "mapper_crp"}
        attn = params["down_blocks_0_2"]
        assert set(attn["attention"]) == {"to_q", "to_k", "to_v", "to_out_0"}
        assert "kv_mapper_1" in attn

    def test_lora_sites_target_attention(self, tiny):
        from sliders_conceptmod_tpu.adapters import lora as lora_lib

        cfg, model, params = tiny
        sites = lora_lib.create_sites(params, rank=2, target_replace=["Attention"])
        # tiny: 2 down + 2 up attention blocks × 4 linears
        assert len(sites) == 16
        names = {s.lora_name for s in sites}
        assert "lora_unet_down_blocks_0_2_attention_to_q" in names
        assert "lora_unet_up_blocks_1_2_attention_to_out_0" in names

    def test_skip_concat_on_shallow_up_level(self, tiny):
        """The first ResBlock of the shallow up group consumes a 2·c-wide
        channelwise input (level-transition skip concat)."""
        cfg, model, params = tiny
        c = cfg.block_out_channels[0]
        assert params["up_blocks_1_0"]["channelwise_0"]["kernel"].shape[0] == 2 * c
        assert params["up_blocks_0_0"]["channelwise_0"]["kernel"].shape[0] == c


class TestCascadeTrainer:
    @pytest.mark.parametrize("scheduler_name", ["euler_a", "wuerstchen"])
    def test_tiny_end_to_end(self, tmp_path, scheduler_name):
        from sliders_conceptmod_tpu.cli import train_lora_cascade
        from sliders_conceptmod_tpu.core import config as config_util
        from sliders_conceptmod_tpu.core import prompts as prompt_util

        config = config_util.load_config_from_yaml("data/config-tiny-cascade.yaml")
        config.train.noise_scheduler = scheduler_name
        config.train.iterations = 3
        config.save.path = str(tmp_path)
        config.logging.verbose = False
        prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, [])
        sd = train_lora_cascade.train(config, prompts, rank=2, save_file=False)
        assert sd, "empty state dict"
        assert all(np.isfinite(v).all() for v in sd.values())
        # reference key schema
        assert any(k.endswith("_attention_to_q.lora_down.weight") for k in sd)

    def test_programmatic_api(self, tmp_path, monkeypatch):
        import shutil

        from sliders_conceptmod_tpu.cli import train_lora_cascade

        cfgdir = tmp_path / "data"
        cfgdir.mkdir()
        shutil.copy("data/config-tiny-cascade.yaml", cfgdir / "config-tiny-cascade.yaml")
        shutil.copy("data/prompts-tiny.yaml", cfgdir / "prompts-tiny.yaml")
        monkeypatch.chdir(tmp_path)
        (tmp_path / "data" / "config-tiny-cascade.yaml").write_text(
            open(cfgdir / "config-tiny-cascade.yaml").read().replace('path: "/tmp/slider_smoke"', f'path: "{tmp_path}"')
        )
        sd = train_lora_cascade.train_lora(
            target="",
            positive="pixel art",
            negative="sketch",
            unconditional="",
            rank=2,
            steps=2,
            resolution=64,
            config_file="data/config-tiny-cascade.yaml",
        )
        assert sd and any(k.startswith("lora_unet_") for k in sd)


def test_cascade_odd_latent_size():
    """Odd effnet grids (e.g. 448px → 11×11): the up path bilinear-resizes to
    the skip like the original, instead of shape-erroring."""
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet

    cfg = CascadeConfig.tiny()
    model = StableCascadeUNet(cfg)
    x = jnp.zeros((1, cfg.in_channels, 5, 5))
    args = (
        jnp.zeros((1,)),
        jnp.zeros((1, 3, cfg.clip_text_in_channels)),
        jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels)),
        jnp.zeros((1, 1, cfg.clip_image_in_channels)),
    )
    params = model.init(jax.random.PRNGKey(0), x, *args)["params"]
    out = model.apply({"params": params}, x, *args)
    assert out.shape == x.shape


def test_wuerstchen_scheduler_name_loads_from_yaml(tmp_path):
    """'noise_scheduler: wuerstchen' must survive pydantic validation — the
    documented way to select the ratio-space scheduler."""
    from sliders_conceptmod_tpu.core import config as config_util

    text = open("data/config-tiny-cascade.yaml").read().replace(
        'noise_scheduler: "euler_a"', 'noise_scheduler: "wuerstchen"'
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    cfg = config_util.load_config_from_yaml(str(p))
    assert cfg.train.noise_scheduler == "wuerstchen"


def test_conv_transpose_conversion_matches_torch():
    """The up_upscalers kernel convention ((2,3,0,1)-transpose + spatial
    flip) reproduces torch.nn.functional.conv_transpose2d exactly."""
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 4, 4).astype(np.float32)
    w = rng.randn(3, 5, 2, 2).astype(np.float32)  # torch ConvT (in,out,kh,kw)
    b = rng.randn(5).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2
    ).numpy()

    kernel = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2), padding="VALID")
    out = mod.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}},
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-5)


def test_convert_cascade_state_dict_structure():
    """A torch-layout Stage-C state dict converts into exactly the flax param
    tree the model initializes: synthesize the torch dict by inverting the
    converter's mapping, convert back, and compare forward passes."""
    from sliders_conceptmod_tpu.models.cascade import (
        CascadeConfig,
        StableCascadeUNet,
        convert_cascade_state_dict,
    )

    cfg = CascadeConfig.tiny()
    model = StableCascadeUNet(cfg)
    args = (
        jnp.zeros((1, cfg.in_channels, 4, 4)),
        jnp.zeros((1,)),
        jnp.zeros((1, 3, cfg.clip_text_in_channels)),
        jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels)),
        jnp.zeros((1, 1, cfg.clip_image_in_channels)),
    )
    ref_params = model.init(jax.random.PRNGKey(0), *args)["params"]

    import re

    def dotted(seg):
        # inverse of torch_convert._merge_numeric: trailing _<int> -> .<int>
        while (m := re.match(r"^(.*)_(\d+)$", seg)):
            seg = f"{m.group(1)}.{m.group(2)}"
        return seg

    sd = {}
    for keypath, leaf_arr in jax.tree_util.tree_flatten_with_path(ref_params)[0]:
        segs = [k.key for k in keypath]
        arr = np.asarray(leaf_arr)
        prefix = ".".join(dotted(s) for s in segs[:-1])
        leaf = segs[-1]
        if leaf == "kernel":
            if segs[0].startswith("up_upscalers"):
                # torch ConvTranspose (in,out,kh,kw): undo transpose + flip,
                # but diffusers keeps up_upscalers.<i>.1 (Sequential index)
                key = f"up_upscalers.{segs[0].split('_')[-2]}.1.weight"
                sd[key] = np.transpose(arr[::-1, ::-1], (2, 3, 0, 1)).copy()
            elif arr.ndim == 4:
                sd[prefix + ".weight"] = np.transpose(arr, (3, 2, 0, 1)).copy()
            else:
                sd[prefix + ".weight"] = np.transpose(arr, (1, 0)).copy()
        elif leaf in ("gamma", "beta"):
            sd[f"{prefix}.{leaf}"] = arr
        else:  # bias
            sd[prefix + ".bias"] = arr

    got = convert_cascade_state_dict(sd)
    ref_out = model.apply({"params": ref_params}, *args)
    got_out = model.apply({"params": got}, *args)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=1e-5)


# ---------------------------------------------------------------------------
# share_warmup (r5, VERDICT r4 task 1): one shared (T−1)-step warm-up chain
# per step; tails keep per-sample pairs (t_to is fixed — pair diversity is
# the only per-sample variation; see CascadeESDConfig.share_warmup).
# ---------------------------------------------------------------------------


def _share_setup(scheduler_name="euler_a", n_pairs=2):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet
    from sliders_conceptmod_tpu.train import esd

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
    lora_params = jax.tree.map(
        lambda x: x + 0.01, lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)
    )

    def encode_fn(prompt):
        k = jax.random.PRNGKey(len(prompt))
        return (
            jax.random.normal(k, (5, cfg.clip_text_in_channels)) * 0.1,
            jax.random.normal(k, (1, cfg.clip_text_pooled_in_channels)) * 0.1,
        )

    prompts = [
        PromptSettings(target=t, resolution=16) for t in ["sky", "tree"][:n_pairs]
    ]
    bank = esd.build_prompt_bank(prompts, encode_fn)
    empty_text, empty_pooled = encode_fn("")
    if scheduler_name == "wuerstchen":
        scheduler = WuerstchenScheduler()
    else:
        scheduler = create_noise_scheduler(scheduler_name)
    schedule = scheduler.set_timesteps(4)
    return cfg, apply, params, sites, lora_params, scheduler, schedule, bank, empty_text, empty_pooled


def _share_step(cfg, apply, sites, scheduler, schedule, **ckw):
    from sliders_conceptmod_tpu.train import esd_cascade
    from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

    opt = get_optimizer("adamw", get_lr_schedule("constant", 1e-3, 10))
    ccfg = esd_cascade.CascadeESDConfig(
        max_denoising_steps=4, height=64, width=64,
        latent_channels=cfg.in_channels, resolution_multiple=16.0, remat=False,
        **ckw,
    )
    return opt, esd_cascade.make_cascade_esd_train_step(
        apply, sites, scheduler, schedule, opt, ccfg,
        empty_text=_share_step.empty_text,
        empty_pooled=_share_step.empty_pooled,
        clip_image_dim=cfg.clip_image_in_channels,
    )


@pytest.mark.parametrize("scheduler_name", ["euler_a", "wuerstchen"])
def test_cascade_share_warmup_step_trains(scheduler_name):
    """share_warmup step runs on both scheduler kinds (σ-space euler_a with
    branch-input scaling, and ratio-space wuerstchen), yields a finite loss,
    and moves the adapter."""
    cfg, apply, params, sites, lora_params, scheduler, schedule, bank, et, ep = _share_setup(
        scheduler_name
    )
    _share_step.empty_text, _share_step.empty_pooled = et, ep
    opt, step = _share_step(
        cfg, apply, sites, scheduler, schedule, samples_per_step=3, share_warmup=True
    )
    before = jax.tree.map(np.asarray, lora_params)
    lp, _, metrics = step(params, lora_params, opt.init(lora_params), jax.random.PRNGKey(0), bank)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(lp), jax.tree.leaves(before))
    )
    assert moved


def test_cascade_share_warmup_guards():
    cfg, apply, params, sites, lora_params, scheduler, schedule, bank, et, ep = _share_setup()
    _share_step.empty_text, _share_step.empty_pooled = et, ep
    for bad in (dict(samples_per_step=1), dict(samples_per_step=2, batch_size=2)):
        with pytest.raises(ValueError, match="share_warmup"):
            _share_step(cfg, apply, sites, scheduler, schedule, share_warmup=True, **bad)


@pytest.mark.parametrize("scheduler_name", ["euler_a", "wuerstchen"])
def test_cascade_share_warmup_matches_vmap_single_pair(scheduler_name):
    """With a 1-pair bank every tail reads pair 0, so the share step (chain
    from sample 0's draws) must compute EXACTLY the vmap path's sample-0
    loss/grads — share(S=2) equals the S=1 step driven with keys[0]."""
    cfg, apply, params, sites, lora_params, scheduler, schedule, bank, et, ep = _share_setup(
        scheduler_name, n_pairs=1
    )
    _share_step.empty_text, _share_step.empty_pooled = et, ep
    opt, share = _share_step(
        cfg, apply, sites, scheduler, schedule, samples_per_step=2, share_warmup=True
    )
    _, single = _share_step(cfg, apply, sites, scheduler, schedule, samples_per_step=1)
    key = jax.random.PRNGKey(7)
    lp_a = jax.tree.map(jnp.copy, lora_params)
    lp_b = jax.tree.map(jnp.copy, lora_params)
    lp_a, _, m_a = share(params, lp_a, opt.init(lp_a), key, bank)
    lp_b, _, m_b = single(params, lp_b, opt.init(lp_b), jax.random.split(key, 2)[0], bank)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-6)
    assert float(m_a["grad_norm"]) == pytest.approx(float(m_b["grad_norm"]), rel=1e-4)
    # params at atol 2e-4 only (loss/grad_norm above carry the equivalence):
    # the vmapped grads differ from the single-lane graph by fp32 fusion
    # rounding, and Adam's first step (g/√(g²+ε) ≈ sign(g)) amplifies that
    # near zero-gradient coordinates; a genuinely different warm-up chain
    # diverges at O(1e-2) here
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4),
        jax.device_get(lp_a),
        jax.device_get(lp_b),
    )
