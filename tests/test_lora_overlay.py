"""Apply-time LoRA overlay (adapters/lora.lora_overlay) — per-row slider
multipliers. Uniform-scale equivalence vs merge_lora_params, per-row
mixing (teacher rows scale 0 ≡ base model), and gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)), jnp.zeros((1, 7, 32))
    )["params"]
    # conv targets included — exercises the conv overlay path too
    targets = lora.UNET_TARGET_REPLACE_MODULE_TRANSFORMER + lora.UNET_TARGET_REPLACE_MODULE_CONV
    sites = lora.create_sites(params, rank=2, alpha=1.0, target_replace=targets, train_method="full")
    assert any(s.kind == "conv" for s in sites) and any(s.kind == "dense" for s in sites)
    lp = lora.init_lora_params(jax.random.PRNGKey(1), sites)
    # zero-init up factors make the overlay a no-op — randomize for real tests
    lp = jax.tree.map(lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape) * 0.05, lp)

    def apply(p, x, t, ctx):
        return model.apply({"params": p}, x, t, ctx)

    B = 3
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 16, 16))
    t = jnp.asarray([100.0, 200.0, 300.0])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (B, 7, 32)) * 0.1
    return apply, params, sites, lp, (x, t, ctx)


def test_uniform_scale_matches_merge(setup):
    apply, params, sites, lp, (x, t, ctx) = setup
    merged = lora.merge_lora_params(params, sites, lp, 0.7)
    want = apply(merged, x, t, ctx)
    with lora.lora_overlay(sites, lp, jnp.full((x.shape[0],), 0.7)):
        got = apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_per_row_scales_mix_base_and_slider(setup):
    apply, params, sites, lp, (x, t, ctx) = setup
    base_out = apply(params, x, t, ctx)
    merged_out = apply(lora.merge_lora_params(params, sites, lp, 1.0), x, t, ctx)
    with lora.lora_overlay(sites, lp, jnp.asarray([0.0, 1.0, 0.0])):
        mixed = apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(base_out[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(merged_out[1]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mixed[2]), np.asarray(base_out[2]), atol=2e-5)


def test_gradients_flow_only_through_on_rows(setup):
    apply, params, sites, lp, (x, t, ctx) = setup

    def loss(lp_, scale_rows):
        with lora.lora_overlay(sites, lp_, scale_rows):
            out = apply(params, x, t, ctx)
        return jnp.sum(out**2)

    g_on = jax.grad(loss)(lp, jnp.asarray([0.0, 1.0, 0.0]))
    g_off = jax.grad(loss)(lp, jnp.asarray([0.0, 0.0, 0.0]))
    on_norm = sum(float(jnp.sum(jnp.abs(v))) for leaf in g_on.values() for v in leaf.values())
    off_norm = sum(float(jnp.sum(jnp.abs(v))) for leaf in g_off.values() for v in leaf.values())
    assert on_norm > 0
    assert off_norm == 0
