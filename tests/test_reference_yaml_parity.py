"""The reference's shipped YAMLs must parse verbatim (north-star: identical
config surface). Skipped when /root/reference is not mounted."""

import glob
import os

import pytest

from sliders_conceptmod_tpu.core.config import load_config_from_yaml
from sliders_conceptmod_tpu.core.prompts import load_prompts_from_yaml

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def test_all_reference_configs_parse():
    files = sorted(glob.glob(f"{REF}/**/data/config*.yaml", recursive=True))
    assert len(files) >= 6
    for f in files:
        cfg = load_config_from_yaml(f)
        assert cfg.network.type in ("lierla", "c3lier")
        assert cfg.train.noise_scheduler in ("ddim", "ddpm", "lms", "euler_a", "builtin")


def test_all_reference_prompts_parse():
    files = sorted(glob.glob(f"{REF}/**/data/prompts*.yaml", recursive=True))
    parsed = 0
    for f in files:
        try:
            prompts = load_prompts_from_yaml(f)
        except ValueError:
            # empty/comment-only files raise in the reference too
            # (prompt_util.py:183-184) — same behavior here
            continue
        assert prompts and prompts[0].target is not None
        # the 5th prompt always materializes (fork extension semantics)
        assert prompts[0].negative is not None
        parsed += 1
    assert parsed >= 5

    # attribute fan-out multiplies pairs (prompt_util.py:177-201);
    # prompts-xl.yaml ships 1-byte empty, so use the SD3 prompts
    f = f"{REF}/conceptmod/textsliders/data/prompts-sd3.yaml"
    base = load_prompts_from_yaml(f)
    fanned = load_prompts_from_yaml(f, ["woman", "man"])
    assert len(fanned) == 2 * len(base)
    assert fanned[0].target.startswith("woman ")
