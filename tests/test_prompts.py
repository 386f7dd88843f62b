"""Prompt schema + ESD loss semantics (reference prompt_util.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sliders_conceptmod_tpu.core.prompts import (
    PromptSettings,
    action_sign,
    esd_loss,
    esd_loss_target,
    load_prompts_from_yaml,
)


def test_defaulting_rules():
    # reference prompt_util.py:76-88
    s = PromptSettings(target="van gogh")
    assert s.positive == "van gogh"
    assert s.unconditional == ""
    assert s.neutral == ""
    assert s.negative == ""  # fork's 5th prompt defaults to unconditional
    assert s.action == "erase"
    assert s.guidance_scale == 1.0
    assert s.resolution == 512
    assert s.batch_size == 1

    s2 = PromptSettings(target="t", unconditional="u")
    assert s2.neutral == "u"
    assert s2.negative == "u"

    s3 = PromptSettings(target="t", neutral="n", negative="g")
    assert s3.neutral == "n"
    assert s3.negative == "g"


def test_target_required():
    with pytest.raises(Exception):
        PromptSettings(positive="x")


def test_attribute_fanout(tmp_path):
    # reference prompt_util.py:183-193: each attribute is prefixed onto all
    # five prompts, multiplying the list
    p = tmp_path / "prompts.yaml"
    p.write_text(
        "- target: \"smile\"\n  positive: \"smiling\"\n  action: enhance\n"
        "  guidance_scale: 3\n- target: \"age\"\n"
    )
    out = load_prompts_from_yaml(str(p), attributes=["woman", "man"])
    assert len(out) == 4
    assert out[0].target == "woman smile"
    assert out[0].positive == "woman smiling"
    assert out[0].neutral == "woman "
    assert out[1].target == "man smile"
    assert out[2].target == "woman age"
    assert out[2].positive == "woman age"
    assert out[0].action == "enhance"
    assert out[0].guidance_scale == 3


def test_empty_prompts_file(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("")
    with pytest.raises(ValueError):
        load_prompts_from_yaml(str(p))


def test_esd_loss_formula(rng):
    # erase: MSE(target, neutral - g*(pos - neg)); enhance flips the sign
    # (reference prompt_util.py:134-161)
    shape = (1, 4, 8, 8)
    t, p, n, g = (jnp.asarray(rng.normal(size=shape), dtype=jnp.float32) for _ in range(4))
    gs = 3.0

    tgt_erase = esd_loss_target(p, n, g, gs, action_sign("erase"))
    np.testing.assert_allclose(np.asarray(tgt_erase), np.asarray(n - gs * (p - g)), rtol=1e-6)

    tgt_enh = esd_loss_target(p, n, g, gs, action_sign("enhance"))
    np.testing.assert_allclose(np.asarray(tgt_enh), np.asarray(n + gs * (p - g)), rtol=1e-6)

    loss = esd_loss(t, p, n, g, gs, action_sign("erase"))
    expected = np.mean((np.asarray(t) - np.asarray(n - gs * (p - g))) ** 2)
    np.testing.assert_allclose(np.asarray(loss), expected, rtol=1e-6)

    # 4-prompt upstream semantics: negative == unconditional
    # (trainscripts/imagesliders/prompt_util.py:113-134)
    uncond = g
    tgt4 = esd_loss_target(p, n, uncond, gs, action_sign("enhance"))
    np.testing.assert_allclose(np.asarray(tgt4), np.asarray(n + gs * (p - uncond)), rtol=1e-6)
