"""CLI: CLIP score per scale-folder of generated images.

Parity target: reference ``eval-scripts/clip_score.py`` — for each
scale-subfolder of ``--im_path``: HF-CLIP ViT-B/32 image-text logit against
a fixed probe ``--prompt``, averaged per case_number, appended as a
``clip_<scale>`` column to the prompts CSV, written to
``{im_path}/clip_scores.csv``.

TPU-native: scoring runs through models/clip_vision.py (jitted, batched over
a whole folder per device call) instead of per-image torch CLIP calls.
Weights come from a local ``openai/clip-vit-base-patch32``-layout dir via
``--clip_model`` (zero-egress environment — no hub download).
"""

from __future__ import annotations

import argparse
import os
import re

import jax
import jax.numpy as jnp
import numpy as np


def sorted_nicely(l):
    convert = lambda t: int(t) if t.isdigit() else t
    return sorted(l, key=lambda k: [convert(c) for c in re.split(r"([0-9]+)", k)])


def run(args):
    import pandas as pd
    from PIL import Image

    from sliders_conceptmod_tpu.models.clip_vision import load_clip_scorer, preprocess_images

    model, params, tokenizer = load_clip_scorer(args.clip_model)

    @jax.jit
    def score(pixel_values, input_ids):
        return model.apply({"params": params}, pixel_values, input_ids)

    prompt = args.prompt.strip()
    input_ids = jnp.asarray(tokenizer([prompt]))
    print(f"Eval against prompt: {prompt}")

    path = args.im_path
    model_names = [m for m in os.listdir(path) if "all" not in m and ".csv" not in m]
    model_names.sort()
    df = pd.read_csv(args.prompts_path)

    for model_name in model_names:
        im_folder = os.path.join(path, model_name)
        images = sorted_nicely(os.listdir(im_folder))
        ratios = {}
        col = f"clip_{model_name.replace('half', '0.5')}"
        df[col] = np.nan
        batch_imgs, batch_cases = [], []
        for image in images:
            try:
                case_number = int(image.split("_")[0].replace(".png", ""))
            except ValueError:
                continue
            if case_number not in list(df["case_number"]):
                continue
            if not (args.from_case <= case_number <= args.till_case):
                continue
            arr = np.asarray(Image.open(os.path.join(im_folder, image)).convert("RGB"))
            batch_imgs.append(arr)
            batch_cases.append(case_number)

        bs = args.batch_size
        for i in range(0, len(batch_imgs), bs):
            # the model dir's own resolution (224 for ViT-B/32; tiny synthetic
            # scorers use smaller) — a hardcoded 224 would break any other
            px = preprocess_images(
                np.stack(batch_imgs[i : i + bs]),
                image_size=model.vision_config.image_size,
            )
            logits = np.asarray(score(jnp.asarray(px), input_ids))[:, 0]
            for case, s in zip(batch_cases[i : i + bs], logits):
                ratios.setdefault(case, []).append(float(s))

        for case, scores in ratios.items():
            df.loc[df["case_number"] == case, col] = np.mean(scores)
        print(f"{model_name}: mean CLIP score {df[col].mean()}")

    out = os.path.join(path, "clip_scores.csv")
    df.to_csv(out, index=False)
    print(f"wrote {out}")


def build_parser():
    parser = argparse.ArgumentParser(prog="clipScore", description="CLIP score for images")
    parser.add_argument("--im_path", type=str, required=True)
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--clip_model", type=str, required=True, help="local CLIPModel dir")
    parser.add_argument("--device", type=str, default="tpu", help="Ignored (JAX runtime).")
    parser.add_argument("--till_case", type=int, default=1000000)
    parser.add_argument("--from_case", type=int, default=0)
    parser.add_argument("--batch_size", type=int, default=32)
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
