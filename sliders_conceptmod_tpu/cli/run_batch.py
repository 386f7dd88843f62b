"""Batch slider-training driver — the reference's ``run.sh`` as a CLI.

Parity target: ``conceptmod/textsliders/run.sh:1-45`` — loop over slider
spec strings ``"target|positive|unconditional"``, generate the prompts yaml
via make_config, then train with a fixed attribute disentanglement list.

Usage:
  python -m sliders_conceptmod_tpu.cli.run_batch --config_file data/config-xl.yaml \\
      --specs "person|smiling person|person" "sky|stormy sky|sky" \\
      [--attributes 'woman, man, bright, dim'] [--alpha 1.0 --rank 4]
"""

from __future__ import annotations

import argparse
import os

import yaml

from sliders_conceptmod_tpu.cli.make_config import make_prompts

DEFAULT_ATTRIBUTES = "woman, man, bright, dim"  # reference run.sh attribute list


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--specs", nargs="+", required=True, help='"target|positive|unconditional" ...')
    parser.add_argument("--attributes", type=str, default=DEFAULT_ATTRIBUTES)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--peft_type", type=str, default="lora")
    args = parser.parse_args()

    from sliders_conceptmod_tpu.cli import train_lora_xl
    from sliders_conceptmod_tpu.core import config as config_util
    from sliders_conceptmod_tpu.core import prompts as prompt_util

    for spec in args.specs:
        prompts_yaml = make_prompts(spec)
        config = config_util.load_config_from_yaml(args.config_file)
        out_path = os.path.join(os.path.dirname(args.config_file) or ".", "prompts-batch.yaml")
        with open(out_path, "w") as f:
            yaml.dump(prompts_yaml, f)
        config.prompts_file = out_path
        config.save.name = spec.split("|")[0].replace(" ", "_")
        train_lora_xl._decorate(config, args.alpha, args.rank)
        attributes = [a.strip() for a in args.attributes.split(",")] if args.attributes else []
        prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, attributes)
        print(f"=== training slider for spec: {spec} ({len(prompts)} prompt pairs)")
        from sliders_conceptmod_tpu.train import trainer

        trainer.train(config, prompts, rank=args.rank, peft_type=args.peft_type)


if __name__ == "__main__":
    main()
