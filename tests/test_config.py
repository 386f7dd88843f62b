"""Config schema parity: the reference's shipped YAMLs must parse verbatim."""

import textwrap

import jax.numpy as jnp
import pytest

from sliders_conceptmod_tpu.core.config import (
    RootConfig,
    load_config_from_yaml,
    parse_precision,
)

REFERENCE_XL_YAML = textwrap.dedent(
    """
    prompts_file: "trainscripts/textsliders/data/prompts-xl.yaml"
    pretrained_model:
      name_or_path: "stabilityai/stable-diffusion-xl-base-1.0"
      v2: false
      v_pred: false
    network:
      type: "c3lier"
      rank: 4
      alpha: 1.0
      training_method: "noxattn"
    train:
      precision: "bfloat16"
      noise_scheduler: "euler_a"
      iterations: 500
      lr: 0.0002
      optimizer: "AdamW"
      lr_scheduler: "constant"
      max_denoising_steps: 12
    save:
      name: "temp"
      path: "./models"
      per_steps: 10000
      precision: "bfloat16"
    logging:
      use_wandb: false
      verbose: false
    other:
      use_xformers: true
    """
)


def test_reference_xl_yaml_parses(tmp_path):
    p = tmp_path / "config-xl.yaml"
    p.write_text(REFERENCE_XL_YAML)
    cfg = load_config_from_yaml(str(p))
    assert cfg.network.type == "c3lier"
    assert cfg.network.rank == 4
    assert cfg.train.noise_scheduler == "euler_a"
    assert cfg.train.max_denoising_steps == 12
    assert cfg.train.lr == pytest.approx(2e-4)
    assert cfg.save.per_steps == 10000
    assert cfg.other.use_xformers is True
    # TPU block defaults filled
    assert cfg.tpu.mesh_model == 1


def test_missing_blocks_filled(tmp_path):
    p = tmp_path / "min.yaml"
    p.write_text(
        "prompts_file: x.yaml\n"
        "pretrained_model:\n  name_or_path: model\n"
        "network: {}\n"
    )
    cfg = load_config_from_yaml(str(p))
    # defaults per reference config_util.py:30-60
    assert cfg.train.iterations == 500
    assert cfg.train.lr == 1e-3
    assert cfg.train.noise_scheduler == "ddim"
    assert cfg.train.max_denoising_steps == 50
    assert cfg.save.name == "untitled"
    assert cfg.save.per_steps == 200
    assert cfg.logging.use_wandb is False
    assert cfg.other.use_xformers is False
    assert cfg.network.rank == 4
    assert cfg.network.alpha == 1.0
    assert cfg.network.training_method == "full"


def test_parse_precision():
    assert parse_precision("fp32") == jnp.float32
    assert parse_precision("float32") == jnp.float32
    assert parse_precision("bf16") == jnp.bfloat16
    assert parse_precision("bfloat16") == jnp.bfloat16
    # fp16 intentionally maps to bf16 on TPU
    assert parse_precision("fp16") == jnp.bfloat16
    with pytest.raises(ValueError):
        parse_precision("int8")


def test_compilation_cache_knob(tmp_path):
    """tpu.compilation_cache_dir wires jax's persistent executable cache
    (utils/debug.apply_tpu_runtime_flags): after a jitted call, the dir holds
    a cache entry; redeploys then skip the 10-30 min remote compile."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    d = tmp_path / "xla_cache"
    apply_tpu_runtime_flags(
        SimpleNamespace(
            compilation_cache_dir=str(d),
            persistent_cache_min_compile_seconds=0.0,
            debug_nans=False,
        )
    )
    try:
        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        f(jnp.ones((17, 17))).block_until_ready()
        assert d.is_dir() and any(d.iterdir()), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_tpu_config_accepts_cache_fields():
    from sliders_conceptmod_tpu.core.config import TPUConfig

    t = TPUConfig(compilation_cache_dir="/tmp/x", persistent_cache_min_compile_seconds=0.5)
    assert t.compilation_cache_dir == "/tmp/x"
    assert t.persistent_cache_min_compile_seconds == 0.5
    assert TPUConfig().compilation_cache_dir is None


def test_resolve_student_overlay_matrix():
    """core/config.resolve_student_overlay → (student_overlay, overlay_warmup):
    the shared resolution every ESD trainer family rides (BASELINE.md r3
    overlay A/B — merged warm-up + overlay student is the measured bf16 LoRA
    winner on SD1/XL)."""
    import pytest

    from sliders_conceptmod_tpu.core.config import TPUConfig, resolve_student_overlay

    # bf16 LoRA with the SD1/XL default flip: overlay student, merged warm-up
    assert resolve_student_overlay(TPUConfig(), False, "lora", default_overlay=True) == (True, False)
    # no caller default (SD3/Flux): follow quantize_base
    assert resolve_student_overlay(TPUConfig(), False, "lora") == (False, None)
    # int8 base: overlay everywhere (the merged tree cannot exist)
    assert resolve_student_overlay(TPUConfig(), True, "lora") == (True, True)
    # DoRA resolves merged under any default, refuses an explicit overlay
    assert resolve_student_overlay(TPUConfig(), False, "dora", default_overlay=True) == (False, None)
    with pytest.raises(NotImplementedError, match="LoRA only"):
        resolve_student_overlay(TPUConfig(student_overlay=True), False, "dora")
    # explicit merged student refuses an int8 base
    with pytest.raises(ValueError, match="student_overlay"):
        resolve_student_overlay(TPUConfig(student_overlay=False), True, "lora")
    # explicit overlay warm-up keeps the full-overlay route on bf16
    assert resolve_student_overlay(
        TPUConfig(overlay_warmup=True), False, "lora", default_overlay=True
    ) == (True, True)
    # overlay_warmup: false over int8 needs the impossible merged warm-up tree
    with pytest.raises(ValueError, match="overlay_warmup"):
        resolve_student_overlay(TPUConfig(overlay_warmup=False), True, "lora")
    # overlay_warmup without a student overlay is a contradiction
    with pytest.raises(ValueError, match="overlay_warmup"):
        resolve_student_overlay(TPUConfig(overlay_warmup=True), False, "lora")
