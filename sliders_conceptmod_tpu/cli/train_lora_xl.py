"""CLI: SDXL textual slider training — flag-surface parity with reference
``conceptmod/textsliders/train_lora_xl.py:460-516`` (--config_file --alpha
--rank --device --name --attributes --peft_type) plus the ``train_lora``
programmatic API (:421-458).

``--device`` selects a CUDA ordinal in the reference; on TPU the device set
comes from the JAX runtime/mesh, so the flag is accepted and ignored
(documented deviation). ``main`` reproduces the reference's save-name
decoration ``_alpha{a}_rank{r}_{method}`` (:408-413).
"""

from __future__ import annotations

import argparse
import os

import yaml

from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.core import prompts as prompt_util
from sliders_conceptmod_tpu.train import trainer


def _decorate(config, alpha, rank):
    config.network.alpha = alpha
    config.network.rank = rank
    config.save.name += f"_alpha{alpha}"
    config.save.name += f"_rank{rank}"
    config.save.name += f"_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]

    _decorate(config, args.alpha, args.rank)

    prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, attributes)
    if config.logging.verbose:
        print(prompts)
    trainer.train(
        config, prompts, rank=args.rank, peft_type=args.peft_type,
        resume_from=getattr(args, "resume_from", None),
    )


def train_lora(
    target,
    positive,
    negative,
    unconditional,
    alpha=1.0,
    device=0,
    name=None,
    attributes=None,
    batch_size=1,
    config_file="data/config-xl.yaml",
    resolution=512,
    steps=None,
    on_step_complete=None,
    peft_type="lora",
    rank=4,
):
    """Programmatic API — reference train_lora_xl.py:421-458: writes a
    prompts yaml next to the config, trains, returns the state dict."""
    spec = {
        "target": target,
        "positive": positive,
        "negative": negative,
        "unconditional": unconditional,
        "neutral": target,
        "action": "enhance",
        "resolution": resolution,
        "dynamic_resolution": False,
        "batch_size": batch_size,
    }
    prompts_path = os.path.join(os.path.dirname(config_file) or ".", "prompts-xl.yaml")
    with open(prompts_path, "w") as f:
        yaml.dump([spec], f)

    config = config_util.load_config_from_yaml(config_file)
    config.prompts_file = prompts_path
    if name is not None:
        config.save.name = name
    if steps is not None:
        config.train.iterations = steps
    attr_list = [a.strip() for a in attributes.split(",")] if attributes else []

    _decorate(config, alpha, rank)

    prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, attr_list)
    result = trainer.train(
        config,
        prompts,
        rank=rank,
        peft_type=peft_type,
        on_step_complete=on_step_complete,
        save_file=False,
    )
    if peft_type == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        from sliders_conceptmod_tpu.adapters import lora as peft_mod
    return peft_mod.state_dict_numpy(result.sites, result.lora_params)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True, help="Config file for training.")
    parser.add_argument("--alpha", type=float, required=True, help="LoRA weight.")
    parser.add_argument("--rank", type=int, required=False, default=4, help="Rank of LoRA.")
    parser.add_argument(
        "--device", type=int, required=False, default=0, help="Ignored on TPU (mesh-controlled)."
    )
    parser.add_argument("--name", type=str, required=False, default=None)
    parser.add_argument(
        "--attributes",
        type=str,
        required=False,
        default=None,
        help="attributes to disentangle (comma separated string)",
    )
    parser.add_argument(
        "--peft_type", type=str, required=False, default="lora", help="dora or lora (default)"
    )
    parser.add_argument(
        "--resume_from",
        type=str,
        required=False,
        default=None,
        help="orbax resume checkpoint dir ({name}_resume next to the saves): "
        "restores adapter params, optimizer state, step counter, and PRNG key "
        "(deterministic resume — TPU-native extension, SURVEY §5)",
    )
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
