"""Batched-scales sweep sampler (infer/generate.sample_loop_scales).

Equivalence target: one batched trajectory carrying every slider scale via
the per-row LoRA overlay must reproduce the per-scale sequential
sample_loop trajectories (merged params) — the reference eval protocol
(generate_images_xl.py:494-507) run S× faster on a latency-bound chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.infer.generate import sample_loop, sample_loop_scales
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)), jnp.zeros((1, 7, 32))
    )["params"]
    sites = lora.create_sites(params, rank=2, alpha=1.0, target_replace=["Attention"], train_method="full")
    lp = lora.init_lora_params(jax.random.PRNGKey(1), sites)
    lp = jax.tree.map(lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape) * 0.05, lp)

    def apply(p, sample, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, sample, t, ctx)

    return apply, params, sites, lp


@pytest.mark.parametrize("guidance", [7.5, 0.0])
def test_batched_scales_match_sequential(setup, guidance):
    apply, params, sites, lp = setup
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(4)
    flip = 2  # slider off for the first 2 steps, on after
    scales = jnp.asarray([-2.0, 0.0, 1.5])
    lat0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16)) * schedule.init_noise_sigma
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 32)) * 0.1
    uncond = jnp.zeros((1, 7, 32))
    key = jax.random.PRNGKey(5)

    # sequential reference: one merged-params sample_loop per scale
    want = []
    for s in np.asarray(scales):
        merged = lora.merge_lora_params(params, sites, lp, float(s))
        emb = jnp.concatenate([uncond, cond], axis=0)
        want.append(
            np.asarray(
                sample_loop(
                    apply, params, merged, flip, scheduler, schedule, lat0, emb, key,
                    guidance_scale=guidance,
                )
            )
        )
    want = np.concatenate(want, axis=0)

    S = scales.shape[0]
    lat_b = jnp.tile(lat0, (S, 1, 1, 1))
    emb_b = jnp.concatenate([jnp.tile(uncond, (S, 1, 1)), jnp.tile(cond, (S, 1, 1))], axis=0)
    got = np.asarray(
        sample_loop_scales(
            apply, params, sites, lp, scales, flip, scheduler, schedule, lat_b, emb_b, key,
            guidance_scale=guidance,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    # scale rows genuinely differ from each other post-flip
    assert np.abs(got[0] - got[1]).max() > 1e-4


def test_batched_scales_scale0_row_equals_base(setup):
    """The scale-0 row must be EXACTLY the slider-off model (overlay row
    semantics), matching a plain sample_loop on base params."""
    apply, params, sites, lp = setup
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(3)
    lat0 = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, 16)) * schedule.init_noise_sigma
    emb = jnp.concatenate([jnp.zeros((1, 7, 32)), jnp.ones((1, 7, 32)) * 0.1], axis=0)
    key = jax.random.PRNGKey(7)
    base = np.asarray(
        sample_loop(apply, params, params, 0, scheduler, schedule, lat0, emb, key)
    )
    scales = jnp.asarray([0.0, 2.0])
    got = np.asarray(
        sample_loop_scales(
            apply, params, sites, lp, scales, 0, scheduler, schedule,
            jnp.tile(lat0, (2, 1, 1, 1)),
            jnp.concatenate([jnp.tile(emb[:1], (2, 1, 1)), jnp.tile(emb[1:], (2, 1, 1))], axis=0),
            key,
        )
    )
    # batch-2 vs batch-1 matmul reduction order gives ~3e-5 drift; the
    # scale-0 row is semantically the slider-off model
    np.testing.assert_allclose(got[0], base[0], atol=1e-4, rtol=1e-4)


def test_batched_scales_over_quantized_base(setup):
    """sample_loop_scales over a make_quant_apply-wrapped UNet (int8 Dense
    kernels) matches the dequantized-base batched run — the XL
    --quantize_base --batch_scales sweep path."""
    from sliders_conceptmod_tpu.adapters import quant

    apply, params, sites, lp = setup
    qtree, scales_d = quant.quantize_params(params, min_elems=1)
    assert scales_d  # tiny UNet has Dense kernels to quantize at min_elems=1
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    model = UNet2DConditionModel(UNetConfig.tiny())

    def q_apply(p, sample, t, ctx, added_cond_kwargs=None):
        with quant.quant_overlay(scales_d, compute_dtype=jnp.float32):
            return model.apply({"params": p}, sample, t, ctx)

    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(3)
    flip = 1
    scales = jnp.asarray([-1.0, 1.0])
    lat0 = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 16, 16)) * schedule.init_noise_sigma
    lat_b = jnp.tile(lat0, (2, 1, 1, 1))
    cond = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 32)) * 0.1
    emb_b = jnp.concatenate([jnp.zeros((2, 7, 32)), jnp.tile(cond, (2, 1, 1))], axis=0)
    key = jax.random.PRNGKey(10)

    got = np.asarray(
        sample_loop_scales(q_apply, qtree, sites, lp, scales, flip, scheduler,
                           schedule, lat_b, emb_b, key)
    )
    deq = quant.dequantize_params(qtree, scales_d, jnp.float32)
    want = np.asarray(
        sample_loop_scales(apply, deq, sites, lp, scales, flip, scheduler,
                           schedule, lat_b, emb_b, key)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.abs(got[0] - got[1]).max() > 1e-4  # slider still bites

    # W8A8 (--w8a8): the same sweep with per-token int8 activations on the
    # quantized Dense sites — int8×int8→int32 matmuls. Activation rounding
    # accumulates over the 3-step trajectory, so the tolerance is loose; the
    # result must stay finite, close to weight-only, and scale-sensitive.
    def w8a8_apply(p, sample, t, ctx, added_cond_kwargs=None):
        with quant.quant_overlay(scales_d, compute_dtype=jnp.float32, act_quant=True):
            return model.apply({"params": p}, sample, t, ctx)

    got_w = np.asarray(
        sample_loop_scales(w8a8_apply, qtree, sites, lp, scales, flip, scheduler,
                           schedule, lat_b, emb_b, key)
    )
    assert np.isfinite(got_w).all()
    rel = np.linalg.norm(got_w - got) / max(np.linalg.norm(got), 1e-9)
    assert rel < 0.25, rel
    assert np.abs(got_w[0] - got_w[1]).max() > 1e-4  # slider still bites


def test_batched_scales_sharded_matches_unsharded(setup):
    """DP-sharded sweep (rows over the mesh data axis, SURVEY §7.1 L7):
    placing the batched inputs with a data-axis sharding reproduces the
    unsharded trajectories — sharding is pure placement, no math change."""
    from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    apply, params, sites, lp = setup
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(3)
    scales = jnp.asarray([-2.0, -1.0, 0.0, 0.5, 1.0, 1.5, 2.0, 3.0])  # 8 rows
    S = scales.shape[0]
    lat0 = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 16, 16)) * schedule.init_noise_sigma
    lat_b = jnp.tile(lat0, (S, 1, 1, 1))
    cond = jax.random.normal(jax.random.PRNGKey(12), (1, 7, 32)) * 0.1
    emb_b = jnp.concatenate([jnp.zeros((S, 7, 32)), jnp.tile(cond, (S, 1, 1))], axis=0)
    key = jax.random.PRNGKey(13)

    fn = jax.jit(
        lambda p, l, lat, emb: sample_loop_scales(
            apply, p, sites, l, scales, 1, scheduler, schedule, lat, emb, key
        )
    )
    want = np.asarray(fn(params, lp, lat_b, emb_b))

    m = mesh_lib.make_mesh(data=8)
    shard = mesh_lib.data_sharded(m)
    got = np.asarray(fn(
        mesh_lib.replicate_tree(params, m),
        mesh_lib.replicate_tree(lp, m),
        jax.device_put(lat_b, shard),
        jax.device_put(emb_b, shard),
    ))
    # partitioned matmul reduction order drifts ~4e-5 on a handful of
    # elements; the trajectories are semantically identical
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_per_row_keys_make_rows_batch_independent(setup):
    """Micro-batched-serving seed-reproducibility contract (serve.py): with a
    stacked [B]-batch of PRNG keys, a row's stochastic-scheduler (euler_a)
    trajectory depends only on ITS OWN key — not on its position in the batch
    or on which other rows it got batched with. Also: identical row keys ⇒
    identical per-row noise, the reference sweep's same-seed-per-scale
    semantics (generate_images_xl.py:494-507 re-seeds per scale)."""
    apply, params, sites, lp = setup
    scheduler = create_noise_scheduler("euler_a")
    schedule = scheduler.set_timesteps(4)
    flip = 1
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 32)) * 0.1
    uncond = jnp.zeros((1, 7, 32))

    def run(seeds, scales):
        B = len(seeds)
        lat = jnp.concatenate(
            [
                jax.random.normal(jax.random.PRNGKey(s), (1, 4, 16, 16))
                * schedule.init_noise_sigma
                for s in seeds
            ],
            axis=0,
        )
        emb = jnp.concatenate([jnp.tile(uncond, (B, 1, 1)), jnp.tile(cond, (B, 1, 1))], axis=0)
        keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        return np.asarray(
            sample_loop_scales(
                apply, params, sites, lp, jnp.asarray(scales, jnp.float32), flip,
                scheduler, schedule, lat, emb, keys, guidance_scale=7.5,
            )
        )

    duo = run([7, 9], [1.0, -2.0])
    solo7 = run([7], [1.0])
    solo9 = run([9], [-2.0])
    swapped = run([9, 7], [-2.0, 1.0])
    # cross-batch-shape runs go through different XLA executables, so exact
    # bitwise equality is not available — but the per-row NOISE STREAM is
    # identical (fold_in of the row's own key), so rows agree to compiler
    # float jitter (~1e-6 rel). Without per-row keys the trajectories diverge
    # at O(sigma_up) ≈ 5-7 absolute — orders of magnitude above the bound.
    np.testing.assert_allclose(duo[0], solo7[0], atol=5e-3)  # batch-composition independent
    np.testing.assert_allclose(duo[1], solo9[0], atol=5e-3)
    np.testing.assert_allclose(swapped[1], duo[0], atol=5e-3)  # row-position independent
    # identical keys, identical scale, SAME executable -> bitwise equal rows
    # (the reference sweep's same-seed-per-scale semantics)
    twin = run([7, 7], [1.0, 1.0])
    np.testing.assert_array_equal(twin[0], twin[1])
    # and the trajectories are genuinely stochastic (keys matter)
    assert np.abs(duo[0] - run([8], [1.0])[0]).max() > 1e-2
