"""CLI: SD1.x/2.x textual slider training.

The reference's ``conceptmod/textsliders/train_lora.py`` is broken against
its own 5-prompt PromptEmbedsPair (SURVEY §2.4) — this entry point provides
the *working* semantics: same YAML/flag surface, 4-prompt behavior recovered
automatically because a missing ``negative`` defaults to ``unconditional``
(core/prompts.py), collapsing the 5-prompt loss to the upstream formula.

Flags follow reference train_lora.py's argparse (--config_file --alpha
--rank --device --name --attributes) with the same save-name decoration.
"""

from __future__ import annotations

import argparse

from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.core import prompts as prompt_util
from sliders_conceptmod_tpu.train import trainer


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    attributes = []
    if args.attributes is not None:
        attributes = [a.strip() for a in args.attributes.split(",")]

    config.network.alpha = args.alpha
    config.network.rank = args.rank
    config.save.name += f"_alpha{args.alpha}"
    config.save.name += f"_rank{args.rank}"
    config.save.name += f"_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"

    prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, attributes)
    trainer.train(
        config, prompts, rank=args.rank, peft_type=args.peft_type,
        resume_from=getattr(args, "resume_from", None),
    )


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--device", type=int, default=0, help="Ignored on TPU.")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--attributes", type=str, default=None)
    parser.add_argument("--peft_type", type=str, default="lora")
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="orbax resume checkpoint dir (deterministic resume: adapter, "
        "optimizer state, step, PRNG key — TPU-native extension, SURVEY §5)",
    )
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
