"""One-liner slider-spec → prompts yaml (reference conceptmod/textsliders/
make_config.py:1-28): ``"target|positive|unconditional"`` becomes an
enhance pair with guidance 3, 512px, batch 12, written to data/prompts-xl.yaml.
"""

from __future__ import annotations

import argparse
import os

import yaml


def make_prompts(spec: str):
    parts = spec.split("|")
    target = parts[0]
    positive = parts[1] if len(parts) > 1 else target
    unconditional = parts[2] if len(parts) > 2 else ""
    return [
        {
            "target": target,
            "positive": positive,
            "unconditional": unconditional,
            "neutral": target,
            "action": "enhance",
            "guidance_scale": 3,
            "resolution": 512,
            "dynamic_resolution": False,
            "batch_size": 12,
        }
    ]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("spec", help='"target|positive|unconditional"')
    parser.add_argument("--out", default="data/prompts-xl.yaml")
    args = parser.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        yaml.dump(make_prompts(args.spec), f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
