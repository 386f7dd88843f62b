"""CLI: LPIPS between scale-0 ("true") images and each other scale folder.

Parity target: reference ``eval-scripts/lpip_score.py`` — AlexNet LPIPS at
64px per case_number, appended as ``lpips_<scale>`` columns, written to
``{im_path}/lpips_score.csv``.

Weights must be local (zero egress): ``--alexnet_weights`` (torchvision
AlexNet state dict) and ``--lpips_weights`` (lpips alex.pth lin heads).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

IMSIZE = 64  # reference lpip_score.py:22


def image_loader(path: str) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("RGB")
    w, h = im.size
    short = min(w, h)
    im = im.resize((int(round(w * IMSIZE / short)), int(round(h * IMSIZE / short))))
    a = np.asarray(im, np.float32) / 255.0
    return ((a - 0.5) * 2).transpose(2, 0, 1)[None]


def run(args):
    import pandas as pd

    from sliders_conceptmod_tpu.models.lpips import LPIPS, load_lpips_params

    model = LPIPS()
    params = load_lpips_params(args.alexnet_weights, args.lpips_weights)

    @jax.jit
    def distance(a, b):
        return model.apply({"params": params}, a, b)

    true = args.true
    models = [m for m in os.listdir(args.im_path) if m not in [true, "all"] and ".csv" not in m]
    original_path = os.path.join(args.im_path, true)
    df = pd.read_csv(args.prompts_path)

    for model_name in models:
        edited_path = os.path.join(args.im_path, model_name)
        file_names = [n for n in os.listdir(edited_path) if ".png" in n]
        col = f"lpips_{model_name.replace('half', '0.5')}"
        # the reference seeds the column with case_number*0 (int64) — modern
        # pandas then rejects float assignment; seed as float instead
        df[col] = df["case_number"] * 0.0
        for index, row in df.iterrows():
            case = row.case_number
            scores = []
            for file in [f for f in file_names if f.startswith(f"{case}_")]:
                o = os.path.join(original_path, file)
                e = os.path.join(edited_path, file)
                if not (os.path.exists(o) and os.path.exists(e)):
                    continue
                d = distance(jnp.asarray(image_loader(o)), jnp.asarray(image_loader(e)))
                scores.append(float(d[0]))
            if scores:
                df.loc[index, col] = np.mean(scores)
                print(f"Case {case}: {np.mean(scores)}")

    out = os.path.join(args.im_path, "lpips_score.csv")
    df.to_csv(out, index=False)
    print(f"wrote {out}")


def build_parser():
    parser = argparse.ArgumentParser(prog="LPIPS", description="LPIPS vs scale-0 images")
    parser.add_argument("--im_path", type=str, required=True)
    parser.add_argument("--prompts_path", type=str, required=True)
    parser.add_argument("--true", type=str, required=True)
    parser.add_argument("--alexnet_weights", type=str, required=True)
    parser.add_argument("--lpips_weights", type=str, required=True)
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())
