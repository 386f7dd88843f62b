"""Heterogeneous (cross-slider) adapter batching — S-LoRA/punica-style
stacked factors + per-row adapter routing.

Layers under test:
* adapters/lora.stack_adapters + lora_overlay(adapter_idx=...): per-row
  routing equals the plain per-adapter overlay (ranks/alphas may differ —
  padding and gain folding are exact); zero-pad adapters are exact no-ops.
* infer/generate.sample_loop_scales(adapter_idx=...): mixed-adapter rows in
  one trajectory match per-adapter runs.
* serve._SliderRegistry: requests for DIFFERENT sliders ride ONE stacked
  call when compatible, fall back to per-slider groups when not, and the
  stack cache invalidates on registry mutation.
"""

import numpy as np

import jax
import jax.numpy as jnp
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
    # conv targets included — the indexed overlay's vmapped-conv path too
    targets = lora.UNET_TARGET_REPLACE_MODULE_TRANSFORMER + lora.UNET_TARGET_REPLACE_MODULE_CONV

    def mk(rank, alpha, key, shift):
        sites = lora.create_sites(
            params, rank=rank, alpha=alpha, target_replace=targets, train_method="full"
        )
        lp = lora.init_lora_params(key, sites)
        lp = jax.tree.map(lambda a: a + shift, lp)  # nonzero up factors
        return sites, lp

    # deliberately DIFFERENT ranks and alphas: stacking must pad ranks with
    # zeros and fold each adapter's own α/r into its up factor
    a_sites, a_lp = mk(2, 1.0, jax.random.PRNGKey(1), 0.07)
    b_sites, b_lp = mk(3, 2.0, jax.random.PRNGKey(2), -0.05)

    def apply(p, x, t, ctx, added_cond_kwargs=None):
        return model.apply({"params": p}, x, t, ctx)

    B = 3
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 16, 16))
    t = jnp.asarray([100.0, 200.0, 300.0])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (B, 7, 32)) * 0.1
    return apply, params, (a_sites, a_lp), (b_sites, b_lp), (x, t, ctx)


def test_stacked_overlay_matches_per_adapter(setup):
    """Rows routed to adapter 0/1/0 equal the plain single-adapter overlay
    row-for-row — across different ranks (2 vs 3) and alphas (1 vs 2)."""
    apply, params, (a_sites, a_lp), (b_sites, b_lp), (x, t, ctx) = setup
    assert lora.sites_stack_compatible(a_sites, b_sites)
    ref_sites, stacked = lora.stack_adapters([(a_sites, a_lp), (b_sites, b_lp)])

    scales = jnp.asarray([0.8, -1.3, 2.0])
    with lora.lora_overlay(ref_sites, stacked, scales, adapter_idx=jnp.asarray([0, 1, 0])):
        mixed = apply(params, x, t, ctx)
    with lora.lora_overlay(a_sites, a_lp, scales):
        want_a = apply(params, x, t, ctx)
    with lora.lora_overlay(b_sites, b_lp, scales):
        want_b = apply(params, x, t, ctx)

    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(want_a[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(want_b[1]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(mixed[2]), np.asarray(want_a[2]), atol=3e-5)


def test_stack_pad_adapters_are_noops(setup):
    """pad_to appends all-zero adapters: rows routed to them are exactly the
    base model at any scale."""
    apply, params, (a_sites, a_lp), (b_sites, b_lp), (x, t, ctx) = setup
    ref_sites, stacked = lora.stack_adapters([(a_sites, a_lp), (b_sites, b_lp)], pad_to=4)
    for leaf in stacked.values():
        assert leaf["down"].shape[0] == 4 and leaf["up"].shape[0] == 4
    base = apply(params, x, t, ctx)
    with lora.lora_overlay(
        ref_sites, stacked, jnp.asarray([5.0, 5.0, 5.0]), adapter_idx=jnp.asarray([2, 3, 2])
    ):
        padded_rows = apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(padded_rows), np.asarray(base), atol=1e-6)


def test_stack_adapters_rejects_incompatible(setup):
    """Different site sets (e.g. different train_methods) refuse to stack."""
    apply, params, (a_sites, a_lp), _, _ = setup
    x_sites = lora.create_sites(
        params, rank=2, alpha=1.0,
        target_replace=lora.UNET_TARGET_REPLACE_MODULE_TRANSFORMER, train_method="xattn",
    )
    assert not lora.sites_stack_compatible(a_sites, x_sites)
    x_lp = lora.init_lora_params(jax.random.PRNGKey(9), x_sites)
    with pytest.raises(ValueError, match="different module sets"):
        lora.stack_adapters([(a_sites, a_lp), (x_sites, x_lp)])


def test_sample_loop_scales_adapter_idx(setup):
    """Full batched trajectory (CFG path) with mixed-adapter rows equals the
    per-adapter trajectories row-for-row."""
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.infer.generate import sample_loop_scales

    apply, params, (a_sites, a_lp), (b_sites, b_lp), _ = setup
    ref_sites, stacked = lora.stack_adapters([(a_sites, a_lp), (b_sites, b_lp)])
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(3)
    B = 2
    lat = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 4, 16, 16)) * schedule.init_noise_sigma
    )
    cond = jax.random.normal(jax.random.PRNGKey(6), (1, 7, 32)) * 0.1
    emb = jnp.concatenate([jnp.zeros((B, 7, 32)), jnp.tile(cond, (B, 1, 1))], axis=0)
    scales = jnp.asarray([1.5, -0.5], jnp.float32)
    key = jax.random.PRNGKey(0)

    mixed = np.asarray(
        sample_loop_scales(
            apply, params, ref_sites, stacked, scales, 0, scheduler, schedule,
            lat, emb, key, guidance_scale=7.5, adapter_idx=jnp.asarray([0, 1]),
        )
    )
    solo_a = np.asarray(
        sample_loop_scales(
            apply, params, a_sites, a_lp, scales, 0, scheduler, schedule,
            lat, emb, key, guidance_scale=7.5,
        )
    )
    solo_b = np.asarray(
        sample_loop_scales(
            apply, params, b_sites, b_lp, scales, 0, scheduler, schedule,
            lat, emb, key, guidance_scale=7.5,
        )
    )
    np.testing.assert_allclose(mixed[0], solo_a[0], atol=1e-4)
    np.testing.assert_allclose(mixed[1], solo_b[1], atol=1e-4)


# ---------------------------------------------------------------------------
# serving integration
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def xl_service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SliderService

    tmp = tmp_path_factory.mktemp("stacked_serve")
    _, _, unet, _ = factory.load_models_xl("tiny-xl")

    def mk(path, rank, key, shift):
        sites = lora_lib.create_sites(unet.params, rank=rank, alpha=1.0, train_method="full")
        lp = lora_lib.init_lora_params(key, sites)
        lp = jax.tree.map(lambda a: a + shift, lp)
        lora_lib.save_weights(path, sites, lp)

    mk(tmp / "one.safetensors", 2, jax.random.PRNGKey(0), 0.1)
    mk(tmp / "two.safetensors", 3, jax.random.PRNGKey(7), -0.08)
    svc = SliderService(
        "tiny-xl", str(tmp / "one.safetensors"), image_size=64, steps=2,
        start_noise=1100, microbatch=False,
    )
    svc.add_slider("two", str(tmp / "two.safetensors"))
    return svc


def _png_to_array(png: bytes) -> np.ndarray:
    import io as _io

    from PIL import Image

    return np.asarray(Image.open(_io.BytesIO(png)), np.int16)


def test_xl_cross_slider_batch_matches_solo(xl_service):
    """Requests for two DIFFERENT sliders ride one stacked call and each row
    reproduces its solo-request image (graph changes cost ≤ a few uint8 LSB)."""
    svc = xl_service
    reqs = [
        ("a cat", 1.0, 3, 7.5, "default"),
        ("a cat", 1.0, 3, 7.5, "two"),
    ]
    mixed = svc._generate_batch(reqs)
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in mixed)
    assert mixed[0] != mixed[1]  # different adapters -> different images
    # the stacked path actually ran (cache holds a real entry, not a fallback)
    assert any(v is not None for v in svc._stack_cache.values())

    # per-row routing is the contract: each mixed row reproduces ITS OWN
    # slider's solo image up to cross-executable bf16 jitter (a few LSB),
    # and is decisively closer to it than to the OTHER slider's image
    solo_default = _png_to_array(svc._generate_batch([reqs[0]])[0])
    solo_two = _png_to_array(svc._generate_batch([reqs[1]])[0])
    m0, m1 = _png_to_array(mixed[0]), _png_to_array(mixed[1])
    d0, d1 = np.abs(m0 - solo_default), np.abs(m1 - solo_two)
    assert d0.max() <= 8 and d0.mean() < 0.5
    assert d1.max() <= 8 and d1.mean() < 0.5
    assert d0.mean() < np.abs(m0 - solo_two).mean()
    assert d1.mean() < np.abs(m1 - solo_default).mean()


def test_xl_incompatible_sliders_fall_back(xl_service, tmp_path_factory):
    """A slider with a different site set cannot stack — mixed batches split
    per slider and still serve every caller. ('full' in the filename routes
    the sniffing to the full 32-dense-site set vs the registry's default
    noxattn subset — reference filename inference, generate_images_xl.py.)"""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    svc = xl_service
    path = tmp_path_factory.mktemp("stacked_incompat") / "full_other.safetensors"
    sites = lora_lib.create_sites(
        svc.unet.params, rank=2, alpha=1.0, train_method="full"
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(5), sites)
    lp = jax.tree.map(lambda a: a + 0.05, lp)
    lora_lib.save_weights(path, sites, lp)
    svc.add_slider("fullset", str(path))
    assert len(svc._resolve("fullset")[0]) != len(svc.sites)  # different site sets

    reqs = [
        ("a cat", 1.0, 3, 7.5, "default"),
        ("a cat", 1.0, 3, 7.5, "fullset"),
    ]
    outs = svc._generate_batch(reqs)
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in outs)
    assert outs[0] != outs[1]
    assert svc._stack_cache.get(("default", "fullset")) is None  # fallback recorded


def test_stack_cache_invalidates_on_mutation(xl_service, tmp_path_factory):
    """Any registry mutation clears the stack cache — a stale stack must
    never outlive a replaced or removed adapter."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    svc = xl_service
    svc._generate_batch(
        [("a cat", 1.0, 3, 7.5, "default"), ("a cat", 1.0, 3, 7.5, "two")]
    )
    assert svc._stack_cache
    path = tmp_path_factory.mktemp("stacked_mut") / "three.safetensors"
    sites = lora_lib.create_sites(svc.unet.params, rank=2, alpha=1.0, train_method="full")
    lora_lib.save_weights(path, sites, lora_lib.init_lora_params(jax.random.PRNGKey(8), sites))
    svc.add_slider("three", str(path))
    assert not svc._stack_cache
    svc._generate_batch(
        [("a cat", 1.0, 3, 7.5, "default"), ("a cat", 1.0, 3, 7.5, "two")]
    )
    assert svc._stack_cache
    svc.remove_slider("three")
    assert not svc._stack_cache


def test_stack_cache_lru_bounded(xl_service, tmp_path_factory):
    """The stack cache is LRU-bounded — name combos must not accumulate fp32
    device copies forever on a long-lived server (each entry holds its
    members' stacked factors)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    svc = xl_service
    path = tmp_path_factory.mktemp("stacked_lru") / "third.safetensors"
    sites = lora_lib.create_sites(svc.unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(21), sites)
    lp = jax.tree.map(lambda a: a + 0.02, lp)
    lora_lib.save_weights(path, sites, lp)
    svc.add_slider("third", str(path))  # mutation: cache now empty

    old_max = svc._stack_cache_max
    svc._stack_cache_max = 2
    try:
        for combo in (("default", "two"), ("default", "third"), ("third", "two")):
            svc._generate_batch(
                [("a cat", 1.0, 3, 7.5, combo[0]), ("a cat", 1.0, 3, 7.5, combo[1])]
            )
        assert len(svc._stack_cache) == 2  # oldest combo evicted
        assert ("default", "two") not in svc._stack_cache
    finally:
        svc._stack_cache_max = old_max
        svc.remove_slider("third")


def test_xl_dp_stacked_serving(xl_service, tmp_path_factory):
    """Cross-slider batching on a DP serving mesh: stacked factors replicate,
    rows AND their adapter_idx shard over the data axis — each mixed row
    still reproduces its own slider's unsharded solo image."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.serve import SliderService

    svc = xl_service
    tmp = tmp_path_factory.mktemp("stacked_dp")
    lora_lib.save_weights(tmp / "one.safetensors", svc.sites, svc.lora_params)
    two_sites, two_lp, _ = svc._resolve("two")
    lora_lib.save_weights(tmp / "two.safetensors", two_sites, two_lp)
    dp = SliderService(
        "tiny-xl", str(tmp / "one.safetensors"), image_size=64, steps=2,
        start_noise=1100, microbatch=False, mesh_data=2,
    )
    dp.add_slider("two", str(tmp / "two.safetensors"))
    reqs = [
        ("a cat", 1.0, 3, 7.5, "default"),
        ("a cat", 1.0, 3, 7.5, "two"),
    ]
    mixed = dp._generate_batch(reqs)
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in mixed)
    assert any(v is not None for v in dp._stack_cache.values())  # stacked ran
    # vs the UNSHARDED service's solo images (different partitioning + batch
    # shape: tiny bf16 drift only; routing errors would be image-sized)
    solo_default = _png_to_array(svc._generate_batch([reqs[0]])[0])
    solo_two = _png_to_array(svc._generate_batch([reqs[1]])[0])
    m0, m1 = _png_to_array(mixed[0]), _png_to_array(mixed[1])
    assert np.abs(m0 - solo_default).mean() < 0.5
    assert np.abs(m1 - solo_two).mean() < 0.5
    assert np.abs(m0 - solo_default).mean() < np.abs(m0 - solo_two).mean()
    assert np.abs(m1 - solo_two).mean() < np.abs(m1 - solo_default).mean()


@pytest.fixture(scope="module")
def flux_stacked_service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import FluxSliderService

    tmp = tmp_path_factory.mktemp("stacked_flux")
    _, _, tr, _ = factory.load_models_flux("tiny-flux")

    def mk(path, key, shift):
        sites = lora_lib.create_sites(
            tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
            train_method="full", delimiter="-",
        )
        lp = lora_lib.init_lora_params(key, sites)
        lp = jax.tree.map(lambda a: a + shift, lp)
        lora_lib.save_weights(path, sites, lp)

    mk(tmp / "one.safetensors", jax.random.PRNGKey(0), 0.1)
    mk(tmp / "two.safetensors", jax.random.PRNGKey(3), -0.12)
    svc = FluxSliderService(
        "tiny-flux", str(tmp / "one.safetensors"), image_size=16, steps=2,
        start_noise=1100, microbatch=False,
    )
    svc.add_slider("two", str(tmp / "two.safetensors"))
    return svc


def test_flux_cross_slider_batch_matches_solo(flux_stacked_service):
    svc = flux_stacked_service
    reqs = [
        ("a cat", 3.0, 3, 3.5, "default"),
        ("a cat", 3.0, 3, 3.5, "two"),
    ]
    mixed = svc._generate_batch(reqs)
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in mixed)
    assert mixed[0] != mixed[1]
    assert any(v is not None for v in svc._stack_cache.values())
    solo_default = _png_to_array(svc._generate_batch([reqs[0]])[0])
    solo_two = _png_to_array(svc._generate_batch([reqs[1]])[0])
    m0, m1 = _png_to_array(mixed[0]), _png_to_array(mixed[1])
    d0, d1 = np.abs(m0 - solo_default), np.abs(m1 - solo_two)
    assert d0.max() <= 8 and d0.mean() < 0.5
    assert d1.max() <= 8 and d1.mean() < 0.5
    assert d0.mean() < np.abs(m0 - solo_two).mean()
    assert d1.mean() < np.abs(m1 - solo_default).mean()
