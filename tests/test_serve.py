"""SliderService — load-once serving with the merged-params LRU (serve.py).

Tiny weightless family end-to-end: PNG bytes out, scale-0 fast path aliases
the base tree, LRU insert/evict order, and cache hits skip the merge.
"""

import jax
import pytest


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SliderService

    path = tmp_path_factory.mktemp("serve") / "slider.safetensors"
    _, _, unet, _ = factory.load_models_xl("tiny-xl")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lora_lib.save_weights(path, sites, lp)
    return SliderService("tiny-xl", str(path), image_size=64, steps=2)


def test_generate_returns_png(service):
    png = service.generate("a cat", scale=1.0, seed=3, guidance=7.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_scale_zero_fast_path(service):
    assert service._merged_for_scale(0.0) is service.unet.params
    assert 0.0 not in service._merged_cache


def test_lru_insert_and_evict(service):
    service._merged_cache.clear()
    for s in (1.0, -1.0, 2.0):
        service._merged_for_scale(s)
    # capacity 2: 1.0 evicted, order oldest->newest
    assert list(service._merged_cache) == [-1.0, 2.0]
    # hit refreshes recency
    cached = service._merged_cache[-1.0]
    assert service._merged_for_scale(-1.0) is cached
    assert list(service._merged_cache) == [2.0, -1.0]


@pytest.fixture(scope="module")
def flux_service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import FluxSliderService

    path = tmp_path_factory.mktemp("serve_flux") / "flux_slider.safetensors"
    _, _, tr, _ = factory.load_models_flux("tiny-flux")
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda a: a + 0.1, lp)
    lora_lib.save_weights(path, sites, lp)
    # start_noise above t0 => the slider rides the WHOLE trajectory, so the
    # scale visibly moves the 8-bit rendered output
    return FluxSliderService(
        "tiny-flux", str(path), image_size=16, steps=2, start_noise=1100,
        quantize_base=True,
    )


def test_flux_generate_returns_png(flux_service):
    png = flux_service.generate("a cat", scale=1.0, seed=3, guidance=3.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_flux_scale_changes_output(flux_service):
    a = flux_service.generate("a cat", scale=-4.0, seed=3, guidance=3.5)
    b = flux_service.generate("a cat", scale=4.0, seed=3, guidance=3.5)
    assert a != b  # same seed, different slider scale -> different image
