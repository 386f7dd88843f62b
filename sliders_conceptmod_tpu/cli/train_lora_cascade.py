"""Stable Cascade slider training — deliberately out of scope.

The reference's Cascade trainer is broken upstream (SURVEY §2.4): it
references a ``settings`` variable leaked from the prompt-caching loop and
its ``DDPMWuerstchenScheduler`` import is commented out
(reference ``conceptmod/textsliders/train_util.py:9,515``,
``train_lora_cascade.py:213-266``), so the path only "runs" with builtin
scheduler knowledge and cannot be executed as shipped. This stub exists so
the CLI surface documents the decision instead of silently lacking it.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=False)
    parser.parse_known_args()
    raise NotImplementedError(
        "Stable Cascade slider training is out of scope: the reference "
        "implementation is broken upstream (undefined scheduler import and a "
        "leaked loop variable — see SURVEY.md §2.4). Use the SDXL/SD3/Flux "
        "trainers instead."
    )


if __name__ == "__main__":
    main()
