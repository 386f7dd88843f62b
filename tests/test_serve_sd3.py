"""SD3SliderService — MMDiT slider serving through the CFG flow sampler
(serve.py). Tiny weightless family end-to-end: PNG bytes out, one executable
for all float scales, micro-batch routing, multi-slider registry, and
cross-slider stacking — the same registry surface the XL/Flux services have.
"""

import numpy as np

import jax
import pytest


@pytest.fixture(scope="module")
def sd3_service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SD3SliderService

    tmp = tmp_path_factory.mktemp("serve_sd3")
    _, _, tr, _ = factory.load_models_sd3("tiny-sd3")

    def mk(path, key, shift):
        sites = lora_lib.create_sites(
            tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
            train_method="full", delimiter="-",
        )
        lp = lora_lib.init_lora_params(key, sites)
        lp = jax.tree.map(lambda a: a + shift, lp)
        lora_lib.save_weights(path, sites, lp)

    mk(tmp / "one.safetensors", jax.random.PRNGKey(0), 0.1)
    mk(tmp / "two.safetensors", jax.random.PRNGKey(5), -0.12)
    # start_noise above t0 => the slider rides the WHOLE trajectory, so the
    # scale visibly moves the rendered output
    svc = SD3SliderService(
        "tiny-sd3", str(tmp / "one.safetensors"), image_size=16, steps=2,
        start_noise=1100, microbatch=False,
    )
    svc.add_slider("two", str(tmp / "two.safetensors"))
    return svc


def test_sd3_generate_returns_png(sd3_service):
    png = sd3_service.generate("a cat", scale=1.0, seed=3, guidance=7.0)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_sd3_scale_changes_output_one_executable(sd3_service):
    n0 = sd3_service._sample._cache_size()
    a = sd3_service.generate("a cat", scale=-3.0, seed=3, guidance=7.0)
    b = sd3_service.generate("a cat", scale=3.0, seed=3, guidance=7.0)
    c = sd3_service.generate("a cat", scale=0.7321, seed=3, guidance=7.0)
    assert a != b  # same seed, different slider scale -> different image
    assert c[:8] == b"\x89PNG\r\n\x1a\n"
    assert sd3_service._sample._cache_size() == max(n0, 1)  # one executable


def test_sd3_multi_slider_routing(sd3_service):
    a = sd3_service.generate("a cat", scale=2.0, seed=3, guidance=7.0)
    b = sd3_service.generate("a cat", scale=2.0, seed=3, guidance=7.0, slider="two")
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert a != b  # different adapter weights -> different image
    with pytest.raises(KeyError):
        sd3_service.generate("a cat", scale=1.0, seed=3, guidance=7.0, slider="nope")


def test_sd3_mixed_guidance_and_batch(sd3_service):
    reqs = [
        ("a cat", 1.0, 3, 7.0, "default"),
        ("a dog", 1.0, 4, 5.0, "default"),
        ("a cow", -1.0, 5, 7.0, "default"),
    ]
    outs = sd3_service._generate_batch(reqs)
    assert len(outs) == 3
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in outs)


def _png_to_array(png: bytes) -> np.ndarray:
    import io as _io

    from PIL import Image

    return np.asarray(Image.open(_io.BytesIO(png)), np.int16)


def test_sd3_cross_slider_batch_matches_solo(sd3_service):
    """Mixed-slider rows ride one stacked CFG flow call and each reproduces
    its solo image (executable-level jitter only)."""
    svc = sd3_service
    reqs = [
        ("a cat", 2.0, 3, 7.0, "default"),
        ("a cat", 2.0, 3, 7.0, "two"),
    ]
    mixed = svc._generate_batch(reqs)
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in mixed)
    assert any(v is not None for v in svc._stack_cache.values())  # stacked ran
    solo_default = _png_to_array(svc._generate_batch([reqs[0]])[0])
    solo_two = _png_to_array(svc._generate_batch([reqs[1]])[0])
    m0, m1 = _png_to_array(mixed[0]), _png_to_array(mixed[1])
    d0, d1 = np.abs(m0 - solo_default), np.abs(m1 - solo_two)
    assert d0.max() <= 8 and d0.mean() < 0.5
    assert d1.max() <= 8 and d1.mean() < 0.5
    assert d0.mean() < np.abs(m0 - solo_two).mean()
    assert d1.mean() < np.abs(m1 - solo_default).mean()


def test_sd3_encode_matches_factory(sd3_service):
    """The service's jitted prompt encoder must reproduce
    factory.encode_prompts_sd3 exactly (same math, jitted with params as
    args to dodge eager per-op dispatch on TPU)."""
    from sliders_conceptmod_tpu.models import factory

    text_j, pooled_j = sd3_service._encode("a painting of a fox")
    text_f, pooled_f = factory.encode_prompts_sd3(
        sd3_service.text_encoders, ["a painting of a fox"],
        joint_attention_dim=sd3_service.transformer.config.joint_attention_dim,
        t5_seq_len=sd3_service._t5_seq_len,
    )
    # bf16 towers: jitted vs eager fusion differences round at bf16 ulp scale
    np.testing.assert_allclose(
        np.asarray(text_j, np.float32), np.asarray(text_f, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(pooled_j, np.float32), np.asarray(pooled_f, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sd3_static_guidance(tmp_path_factory):
    """static_guidance <= 1 compiles the cond-only fast path on SD3 too:
    per-request guidance is ignored, the slider still bites, and requests
    with DIFFERENT guidance values ride ONE micro-batch group."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SD3SliderService

    tmp = tmp_path_factory.mktemp("serve_sd3_turbo")
    _, _, tr, _ = factory.load_models_sd3("tiny-sd3")
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda a: a + 0.1, lp)
    lora_lib.save_weights(tmp / "s.safetensors", sites, lp)
    svc = SD3SliderService(
        "tiny-sd3", str(tmp / "s.safetensors"), image_size=16, steps=2,
        start_noise=1100, microbatch=False, static_guidance=1.0,
    )
    a = svc.generate("a cat", scale=-3.0, seed=3, guidance=7.0)
    b = svc.generate("a cat", scale=3.0, seed=3, guidance=7.0)
    c = svc.generate("a cat", scale=3.0, seed=3, guidance=2.0)
    assert a[:8] == b"\x89PNG\r\n\x1a\n"
    assert a != b  # slider bites without CFG
    assert b == c  # guidance compiled in: per-request value ignored
    # mixed per-request guidance must NOT split the batch when static:
    # one group -> one _sample_group call -> results in request order
    reqs = [("a cat", 1.0, 3, 7.0, "default"), ("a dog", 1.0, 4, 2.5, "default")]
    calls = []
    orig = svc._sample_group

    def spy(padded, guidance, entry, adapter_idx=None):
        calls.append(len(padded))
        return orig(padded, guidance, entry, adapter_idx=adapter_idx)

    svc._sample_group = spy
    outs = svc._generate_batch(reqs)
    svc._sample_group = orig
    assert len(calls) == 1 and calls[0] == 2  # one 2-row group, no split
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in outs)


def test_sd3_te_slider_serving(sd3_service, tmp_path_factory):
    """te parts over the SD3 clip_l/clip_g towers change served output with
    scale (reference train_notrigger.py:148-176 trains these towers)."""
    import jax
    from safetensors.numpy import save_file

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.adapters import slider_file as sfile
    from sliders_conceptmod_tpu.models import factory

    d = tmp_path_factory.mktemp("sd3_te")
    _, text_encoders, _, _ = factory.load_models_sd3("tiny-sd3")
    sds = {}
    for idx, te in enumerate(text_encoders):
        sites = lora_lib.create_sites(
            te.params, rank=2, alpha=1.0,
            target_replace=["CLIPAttention", "CLIPSdpaAttention"],
            prefix=f"lora_te{idx + 1}", train_method="full",
            name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
        )
        lp = jax.tree.map(
            lambda a: a + 0.15, lora_lib.init_lora_params(jax.random.PRNGKey(idx), sites)
        )
        sds.update(lora_lib.state_dict_numpy(sites, lp))
    path = d / "sd3_te.safetensors"
    save_file(sds, str(path))
    sd3_service.add_slider("te", str(path))
    try:
        a = sd3_service.generate("a cat", scale=-2.0, seed=3, guidance=7.0, slider="te")
        b = sd3_service.generate("a cat", scale=2.0, seed=3, guidance=7.0, slider="te")
        assert a[:8] == b"\x89PNG\r\n\x1a\n" or isinstance(a, bytes)
        assert a != b
    finally:
        sd3_service.remove_slider("te")
