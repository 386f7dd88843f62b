"""One-command acceptance harness: train → scale sweep → CLIP → LPIPS CSVs.

The reference's stated evaluate procedure (``/root/reference/README.md:34-35``)
is a manual chain: train a slider, generate fixed-seed scale sweeps over a
prompts CSV (``eval-scripts/generate_images_xl.py:406-513``), append per-scale
CLIP columns (``eval-scripts/clip_score.py:53-72``), and write
``lpips_score.csv`` (``eval-scripts/lpip_score.py:44-76``). This CLI runs the
whole chain as ONE command so it is a tested artifact, not folklore:

  python -m sliders_conceptmod_tpu.cli.acceptance \\
      --config_file data/config-xl.yaml --prompts_path prompts/prompts-person.csv \\
      --base <sdxl dir or single file> --save_path /tmp/acc \\
      --clip_model <local CLIPModel dir> \\
      --alexnet_weights alexnet.pth --lpips_weights lpips_alex.pth

Steps (each reuses the standalone CLI's run() — the pipeline adds no logic):
  1. train_lora_xl        → {save.path}/{decorated name}_last.safetensors
  2. generate_images_xl   → {save_path}/{slider}/{scale}/{case}_{idx}.png
  3. clip_score           → {sweep}/clip_scores.csv   (clip_<scale> columns)
  4. lpip_score           → {sweep}/lpips_score.csv   (lpips_<scale> vs scale 0)

``--skip_train`` + ``--model_name`` evaluates an existing slider;
``--clip_model``/LPIPS weights are optional — omitted stages are skipped with
a warning (zero-egress machines may lack pretrained scorer weights).
Per-stage wall-clock lands in ``{save_path}/acceptance.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run(args):
    from sliders_conceptmod_tpu.cli import generate_images_xl as gen_cli
    from sliders_conceptmod_tpu.cli import train_lora_xl as train_cli
    from sliders_conceptmod_tpu.core import config as config_util

    timings = {}
    os.makedirs(args.save_path, exist_ok=True)

    # 1. train ---------------------------------------------------------------
    if args.skip_train:
        if not args.model_name:
            raise SystemExit("--skip_train requires --model_name")
        slider_path = args.model_name
    else:
        t0 = time.time()
        config = config_util.load_config_from_yaml(args.config_file)
        if args.name is not None:
            config.save.name = args.name
        train_cli._decorate(config, args.alpha, args.rank)
        from sliders_conceptmod_tpu.core import prompts as prompt_util
        from sliders_conceptmod_tpu.train import trainer

        prompts = prompt_util.load_prompts_from_yaml(config.prompts_file, [])
        trainer.train(config, prompts, rank=args.rank, peft_type=args.peft_type)
        slider_path = os.path.join(
            config.save.path, f"{config.save.name}_last.safetensors"
        )
        timings["train_seconds"] = time.time() - t0
        print(f"[acceptance] trained {slider_path} in {timings['train_seconds']:.1f}s")

    # 2. scale-grid sweep ----------------------------------------------------
    t0 = time.time()
    gen_args = gen_cli.build_parser().parse_args(
        [
            "--model_name", slider_path,
            "--prompts_path", args.prompts_path,
            "--save_path", args.save_path,
            "--base", args.base,
            "--image_size", str(args.image_size),
            "--num_samples", str(args.num_samples),
            "--ddim_steps", str(args.ddim_steps),
            "--start_noise", str(args.start_noise),
            f"--scales={args.scales}",
            "--till_case", str(args.till_case),
            "--from_case", str(args.from_case),
        ]
        + (["--batch_scales"] if args.batch_scales else [])
    )
    gen_cli.run(gen_args)
    timings["sweep_seconds"] = time.time() - t0
    sweep_dir = os.path.join(args.save_path, os.path.basename(slider_path))
    print(f"[acceptance] sweep {sweep_dir} in {timings['sweep_seconds']:.1f}s")

    # 3. CLIP scores ---------------------------------------------------------
    if args.clip_model:
        from sliders_conceptmod_tpu.eval import clip_score

        t0 = time.time()
        clip_args = clip_score.build_parser().parse_args(
            [
                "--im_path", sweep_dir,
                "--prompt", args.clip_prompt or args.concept,
                "--prompts_path", args.prompts_path,
                "--clip_model", args.clip_model,
                "--till_case", str(args.till_case),
                "--from_case", str(args.from_case),
            ]
        )
        clip_score.run(clip_args)
        timings["clip_seconds"] = time.time() - t0
    else:
        print("[acceptance] WARNING: no --clip_model — skipping CLIP scoring")

    # 4. LPIPS ---------------------------------------------------------------
    if args.alexnet_weights and args.lpips_weights:
        from sliders_conceptmod_tpu.eval import lpip_score

        t0 = time.time()
        lpips_args = lpip_score.build_parser().parse_args(
            [
                "--im_path", sweep_dir,
                "--prompts_path", args.prompts_path,
                "--true", args.true_scale,
                "--alexnet_weights", args.alexnet_weights,
                "--lpips_weights", args.lpips_weights,
            ]
        )
        lpip_score.run(lpips_args)
        timings["lpips_seconds"] = time.time() - t0
    else:
        print("[acceptance] WARNING: no LPIPS weights — skipping LPIPS scoring")

    with open(os.path.join(args.save_path, "acceptance.json"), "w") as f:
        json.dump({"slider": slider_path, "sweep_dir": sweep_dir, **timings}, f, indent=1)
    print(f"[acceptance] done: {json.dumps(timings)}")
    return sweep_dir


def build_parser():
    p = argparse.ArgumentParser(
        prog="acceptance", description="train -> sweep -> clip_scores.csv -> lpips_score.csv"
    )
    p.add_argument("--config_file", type=str, default="data/config-xl.yaml")
    p.add_argument("--prompts_path", type=str, required=True, help="reference-schema prompts CSV")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--base", type=str, default="stabilityai/stable-diffusion-xl-base-1.0")
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--rank", type=int, default=4)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--peft_type", type=str, default="lora")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--model_name", type=str, default=None, help="existing slider (with --skip_train)")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--start_noise", type=int, default=750)
    p.add_argument("--scales", type=str, default="-2,-1,0,1,2")
    p.add_argument("--batch_scales", action="store_true")
    p.add_argument("--till_case", type=int, default=1000000)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--concept", type=str, default="person", help="CLIP probe prompt fallback")
    p.add_argument("--clip_prompt", type=str, default=None)
    p.add_argument("--clip_model", type=str, default=None, help="local CLIPModel dir")
    p.add_argument("--alexnet_weights", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--true_scale", type=str, default="0.0", help="LPIPS reference scale folder")
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
