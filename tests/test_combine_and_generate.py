"""combine_loras key-renaming parity + sampler start_noise gating math."""

import numpy as np
import pytest

from sliders_conceptmod_tpu.cli.combine_loras import _rename, merge_part
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise


def test_rename_transformer_keys():
    """reference combine_loras.py:26-33."""
    assert (
        _rename("lora_unet-down_blocks-0-attn1-to_q.lora_down.weight", "transformer")
        == "transformer.down_blocks.0.attn1.to_q.lora_A.weight"
    )
    assert _rename("lora_te1-text-model.lora_up.weight", "CLIP") == "lora_te1_text_model.lora_up.weight"
    assert _rename("lora_te2_block-0.alpha", "T5") == "lora_te3_block_0.alpha"


def test_merge_strength_on_down_only():
    """strength scales _down/_B factors; _up and alpha pass through
    (reference combine_loras.py:46-60)."""
    out = {}
    tensors = {
        "m.lora_down.weight": np.ones((2, 4), np.float32),
        "m.lora_up.weight": np.ones((4, 2), np.float32),
        "m.alpha": np.asarray(4.0, np.float32),
    }
    merge_part(out, tensors, 0.5, "CLIP")
    np.testing.assert_allclose(out["m.lora_down.weight"], 0.5)
    np.testing.assert_allclose(out["m.lora_up.weight"], 1.0)
    np.testing.assert_allclose(out["m.alpha"], 4.0)


def test_flip_step_for_start_noise():
    """start_noise=750 at 50 DDIM steps: slider turns on at the first
    timestep <= 750 (reference generate_images_xl.py:324-328 flip rule)."""
    sched = create_noise_scheduler("ddim")
    schedule = sched.set_timesteps(50)
    ts = np.asarray(schedule.timesteps)  # 980, 960, ... 0
    flip = flip_step_for_start_noise(schedule, 750)
    assert ts[flip] <= 750 and ts[flip - 1] > 750
    # degenerate ends
    assert flip_step_for_start_noise(schedule, 2000) == 0  # always on
    assert flip_step_for_start_noise(schedule, -1) == 50  # never on
