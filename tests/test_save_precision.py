"""save.precision honoring — reference lora.py:274-283 + config_util.py:46-50.

The exported adapter must carry the configured dtype (fp32/fp16/bf16) in both
checkpoint formats, and bf16 alphas must still be readable for rank/alpha
inference (generate_images_xl.py:459-484 path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora
from sliders_conceptmod_tpu.core.config import parse_save_precision
from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig


@pytest.fixture(scope="module")
def tiny_sites_params():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)), jnp.zeros((1, 7, 32))
    )["params"]
    sites = lora.create_sites(params, rank=2, alpha=1.0, train_method="full")
    lp = lora.init_lora_params(jax.random.PRNGKey(1), sites)
    return sites, lp


def test_parse_save_precision_mapping():
    assert parse_save_precision("fp32") == np.float32
    assert parse_save_precision("float32") == np.float32
    assert parse_save_precision("fp16") == np.float16
    assert parse_save_precision("bf16") == jnp.bfloat16
    with pytest.raises(ValueError):
        parse_save_precision("int8")


@pytest.mark.parametrize("precision", ["fp32", "fp16", "bf16"])
def test_safetensors_export_dtype(tiny_sites_params, tmp_path, precision):
    sites, lp = tiny_sites_params
    dt = parse_save_precision(precision)
    path = tmp_path / f"s_{precision}.safetensors"
    lora.save_weights(path, sites, lp, dtype=dt)

    from safetensors.numpy import load_file

    sd = load_file(str(path))
    assert all(v.dtype == dt for v in sd.values()), {k: v.dtype for k, v in sd.items()}
    # and it loads back into the overlay tree
    restored = lora.load_weights(path, sites)
    ref = lp[sites[0].lora_name]["down"]
    got = restored[sites[0].lora_name]["down"]
    tol = 1e-6 if precision == "fp32" else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=tol)


@pytest.mark.parametrize("precision", ["fp16", "bf16"])
def test_torch_pickle_export_dtype(tiny_sites_params, tmp_path, precision):
    torch = pytest.importorskip("torch")
    sites, lp = tiny_sites_params
    dt = parse_save_precision(precision)
    path = tmp_path / f"s_{precision}.pt"
    lora.save_weights(path, sites, lp, dtype=dt)

    want = {"fp16": torch.float16, "bf16": torch.bfloat16}[precision]
    sd = torch.load(str(path), weights_only=True)
    assert all(v.dtype == want for v in sd.values())
    # bit-identical roundtrip of the raw factors (the uint16-view path)
    name = sites[0].lora_name
    got = sd[f"{name}.lora_down.weight"].float().numpy()
    ref = np.asarray(np.asarray(jax.device_get(lp[name]["down"]), dtype=dt).T, np.float32)
    np.testing.assert_array_equal(got, np.ascontiguousarray(ref))
    # alpha inference still works on half-precision torch checkpoints
    alphas = lora.sites_alpha_from_checkpoint(path)
    assert alphas[name] == 1.0


def test_trainer_honors_save_precision(tmp_path, monkeypatch):
    """End-to-end: a YAML with save.precision fp16 exports fp16 safetensors."""
    from sliders_conceptmod_tpu.core.config import RootConfig
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.train import trainer

    cfg = RootConfig(
        prompts_file="unused",
        pretrained_model={"name_or_path": "tiny"},
        network={"rank": 2, "alpha": 1.0},
        train={"iterations": 2, "max_denoising_steps": 2, "precision": "float32"},
        save={"name": "prec", "path": str(tmp_path), "precision": "fp16", "per_steps": 0},
        logging={},
        tpu={"seed": 0},
    )
    prompts = [PromptSettings(target="sky", positive="blue sky", action="enhance", resolution=64)]
    trainer.train(cfg, prompts, rank=2)

    from safetensors.numpy import load_file

    sd = load_file(str(tmp_path / "prec_last.safetensors"))
    assert all(v.dtype == np.float16 for v in sd.values())
