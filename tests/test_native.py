"""Native C++ components: mmap safetensors reader, threaded image loader."""

import os
import subprocess

import numpy as np
import pytest

from sliders_conceptmod_tpu.io import native

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def _have_toolchain():
    try:
        subprocess.run(["g++", "--version"], capture_output=True, check=True)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_toolchain(), reason="no g++")


def test_native_safetensors_matches_python(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "b.bias": rng.standard_normal((16,)).astype(np.float16),
        "c": np.arange(24, dtype=np.int32).reshape(2, 3, 4),
    }
    path = str(tmp_path / "t.safetensors")
    save_file(tensors, path, metadata={"hello": "world"})

    loaded = native.load_safetensors_native(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])

    # zero-copy mode returns views and keeps the reader alive
    views = native.load_safetensors_native(path, copy=False)
    np.testing.assert_array_equal(views["a.weight"], tensors["a.weight"])
    views["__reader__"].close()


def test_native_safetensors_on_real_slider_export(tmp_path):
    """Round-trip through our own adapter export format."""
    import jax

    from sliders_conceptmod_tpu.adapters import lora

    site = lora.LoRASite(("m",), "lora_unet_m", "dense", 4, 1.0, 32, 16)
    lp = lora.init_lora_params(jax.random.PRNGKey(0), [site])
    path = str(tmp_path / "slider.safetensors")
    lora.save_weights(path, [site], lp, metadata={"config": "{}"})

    loaded = native.load_safetensors_native(path)
    assert "lora_unet_m.lora_down.weight" in loaded
    assert loaded["lora_unet_m.lora_down.weight"].shape == (4, 32)
    np.testing.assert_allclose(
        loaded["lora_unet_m.lora_down.weight"],
        np.asarray(lp["lora_unet_m"]["down"]).T,
        atol=1e-7,
    )


def test_native_image_loader(tmp_path):
    from PIL import Image

    # smooth gradients: resampling filters (bilinear here vs PIL bicubic)
    # agree closely on smooth content, unlike white noise
    yy, xx = np.mgrid[0:40, 0:60]
    base = np.stack([xx * 4, yy * 6, (xx + yy) * 2], axis=-1).astype(np.uint8)
    paths = []
    for i, ext in enumerate(["png", "jpg"]):
        p = str(tmp_path / f"img{i}.{ext}")
        Image.fromarray(base).save(p)
        paths.append(p)

    out = native.load_images_native(paths, resolution=32)
    if out is None:
        pytest.skip("native image loader unavailable")
    assert out.shape == (2, 3, 32, 32)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # compare against the PIL reference path loosely (PNG is lossless; allow
    # resample differences)
    from sliders_conceptmod_tpu.train.imageslider import load_image_array

    ref = load_image_array(paths[0], 32)[0]
    corr = np.corrcoef(out[0].ravel(), ref.ravel())[0, 1]
    assert corr > 0.95


def test_native_reader_bf16_bit_reinterpretation(tmp_path):
    """BF16 tensors must come back as true bfloat16 values, not value-cast
    uint16 bit patterns (1.0 stored as 0x3F80 must NOT read as 16256.0)."""
    import ml_dtypes
    import numpy as np
    from safetensors.numpy import save_file

    from sliders_conceptmod_tpu.io.native import load_safetensors_native

    vals = np.asarray([1.0, -2.5, 0.375], dtype=ml_dtypes.bfloat16)
    save_file({"w": vals}, str(tmp_path / "bf16.safetensors"))
    got = load_safetensors_native(str(tmp_path / "bf16.safetensors"))["w"]
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(got.astype(np.float32), [1.0, -2.5, 0.375])
