"""SliderService — load-once serving via the traced-scale overlay (serve.py).

Tiny weightless family end-to-end: PNG bytes out, every float scale reuses
ONE executable (no merged trees), scale actually changes the image, and the
W8A8 flag plumbs through.
"""

import numpy as np

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
    # fresh init has zero up-factors (delta ≡ 0 at any scale) — shift them so
    # the slider visibly bites; start_noise above t0 keeps it on all steps
    lp = jax.tree.map(lambda a: a + 0.1, lp)
    lora_lib.save_weights(path, sites, lp)
    return SliderService("tiny-xl", str(path), image_size=64, steps=2, start_noise=1100)


def test_generate_returns_png(service):
    png = service.generate("a cat", scale=1.0, seed=3, guidance=7.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_xl_scale_changes_output_one_executable(service):
    """The traced-scale overlay: arbitrary float scales hit the SAME compiled
    sampler (no merged trees, no per-scale recompiles) and still change the
    image."""
    n0 = service._sample._cache_size()
    a = service.generate("a cat", scale=-3.0, seed=3, guidance=7.5)
    b = service.generate("a cat", scale=3.0, seed=3, guidance=7.5)
    c = service.generate("a cat", scale=0.7321, seed=3, guidance=7.5)
    assert a != b  # same seed, different slider scale -> different image
    assert c[:8] == b"\x89PNG\r\n\x1a\n"
    assert service._sample._cache_size() == max(n0, 1)  # one executable for all scales


def test_xl_w8a8_service_smoke(tmp_path_factory):
    """--w8a8 on the XL service: flag plumbs to the bundle; tiny kernels sit
    below QUANT_MIN_ELEMS so this smokes the wiring end-to-end."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SliderService

    path = tmp_path_factory.mktemp("serve_w8a8") / "slider.safetensors"
    _, _, unet, _ = factory.load_models_xl("tiny-xl")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lora_lib.save_weights(path, sites, lp)
    svc = SliderService("tiny-xl", str(path), image_size=64, steps=2, w8a8=True)
    assert svc.unet.act_quant
    png = svc.generate("a cat", scale=1.0, seed=3, guidance=7.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


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
