"""dynamic_resolution — XLA-safe bucket design (SURVEY §7.4).

Reference behavior: per-iteration random (h, w) from [r/2, r) in 64px steps
(train_util.py:1085-1097, consulted at train_lora_xl.py:186-200). The rebuild
quantizes to a fixed ≤4-bucket set with one compiled step per bucket.
"""

import json

import pytest

from sliders_conceptmod_tpu.diffusion.sampling import dynamic_resolution_buckets


def test_bucket_set_512():
    buckets = dynamic_resolution_buckets(512)
    assert buckets == [(256, 256), (448, 320), (320, 448), (448, 448)]
    # all inside the reference range [r/2, r) and 64-aligned
    for h, w in buckets:
        assert 256 <= h < 512 and 256 <= w < 512
        assert h % 64 == 0 and w % 64 == 0


def test_bucket_set_collapses_small():
    # tiny resolutions collapse to fewer (deduped) shapes, never zero
    assert dynamic_resolution_buckets(64) == [(64, 64)]
    assert dynamic_resolution_buckets(128) == [(64, 64)]
    assert len(dynamic_resolution_buckets(192)) == 4


def test_trainer_uses_multiple_resolutions(tmp_path):
    """A YAML with dynamic_resolution: true trains with ≥2 distinct
    resolutions, observable in the metrics jsonl (VERDICT r1 item 3)."""
    from sliders_conceptmod_tpu.core.config import RootConfig
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.train import trainer

    cfg = RootConfig(
        prompts_file="unused",
        pretrained_model={"name_or_path": "tiny"},
        network={"rank": 2, "alpha": 1.0},
        train={"iterations": 8, "max_denoising_steps": 2, "precision": "float32"},
        save={"name": "dyn", "path": str(tmp_path), "precision": "float32", "per_steps": 0},
        logging={},
        tpu={"seed": 0},
    )
    prompts = [
        PromptSettings(
            target="sky",
            positive="blue sky",
            action="enhance",
            resolution=192,
            dynamic_resolution=True,
        )
    ]
    trainer.train(cfg, prompts, rank=2, save_file=False)

    rows = [
        json.loads(line)
        for line in (tmp_path / "dyn_metrics.jsonl").read_text().splitlines()
        if "loss" in line
    ]
    shapes = {(r["height"], r["width"]) for r in rows if "height" in r}
    assert len(shapes) >= 2, shapes
    allowed = set(dynamic_resolution_buckets(192))
    assert shapes <= allowed


def _flow_family_cfg(yaml_path, tmp_path, name, iterations):
    from sliders_conceptmod_tpu.core import config as config_util

    cfg = config_util.load_config_from_yaml(yaml_path)
    cfg.train.iterations = iterations
    cfg.save.name = name
    cfg.save.path = str(tmp_path)
    cfg.save.per_steps = 0
    cfg.logging.verbose = False
    return cfg


def _dyn_shapes(tmp_path, name):
    rows = [
        json.loads(line)
        for line in (tmp_path / f"{name}_metrics.jsonl").read_text().splitlines()
        if "loss" in line
    ]
    return {(r["height"], r["width"]) for r in rows if "height" in r}


@pytest.mark.parametrize(
    "yaml_path,mod_name,iterations",
    [
        ("data/config-tiny-sd3.yaml", "train_lora_sd3", 8),
        ("data/config-tiny-flux.yaml", "train_lora_flux", 1),  # ×8 micro-steps
        ("data/config-tiny-cascade.yaml", "train_lora_cascade", 8),
    ],
)
def test_flow_family_dynamic_resolution(tmp_path, yaml_path, mod_name, iterations):
    """SD3/Flux/Cascade train over the bucket set too — the reference draws a
    bucketed (h, w) per iteration in ALL textslider trainers
    (train_lora_{sd3,flux,cascade}.py ~:196/:243/:182), so a reference YAML
    with dynamic_resolution: true must train, with ≥2 distinct resolutions
    observable in the metrics jsonl."""
    import importlib

    from sliders_conceptmod_tpu.core.prompts import PromptSettings

    mod = importlib.import_module(f"sliders_conceptmod_tpu.cli.{mod_name}")
    name = f"dyn_{mod_name}"
    cfg = _flow_family_cfg(yaml_path, tmp_path, name, iterations)
    prompts = [
        PromptSettings(
            target="sky", positive="blue sky", action="enhance",
            resolution=192, dynamic_resolution=True, batch_size=1,
        )
    ]
    mod.train(cfg, prompts, rank=2, save_file=False)
    shapes = _dyn_shapes(tmp_path, name)
    assert len(shapes) >= 2, shapes
    assert shapes <= set(dynamic_resolution_buckets(192))


def test_pipeline_warmup_conflicts_with_buckets(tmp_path):
    """tpu.pipeline_warmup carries one fixed-shape warm-up state — the
    trainer must refuse the combination instead of silently mis-pipelining."""
    from sliders_conceptmod_tpu.core.config import RootConfig
    from sliders_conceptmod_tpu.core.prompts import PromptSettings
    from sliders_conceptmod_tpu.train import trainer

    cfg = RootConfig(
        prompts_file="unused",
        pretrained_model={"name_or_path": "tiny"},
        network={"rank": 2, "alpha": 1.0},
        train={"iterations": 2, "max_denoising_steps": 2, "precision": "float32"},
        save={"name": "x", "path": str(tmp_path), "precision": "float32", "per_steps": 0},
        logging={},
        tpu={"seed": 0, "pipeline_warmup": True},
    )
    prompts = [
        PromptSettings(target="a", positive="b", resolution=192, dynamic_resolution=True)
    ]
    with pytest.raises(ValueError, match="pipeline_warmup"):
        trainer.train(cfg, prompts, rank=2, save_file=False)
