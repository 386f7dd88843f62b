"""Merge unet + text-encoder slider checkpoints into one safetensors file.

Parity target: reference ``conceptmod/notrigger/combine_loras.py``:
* per-part strength is folded into the ``_down``-factor weights (the
  reference scales ``_down``/``_B`` and copies ``_up``/``_A`` verbatim,
  combine_loras.py:50-60 — scaling either factor of a product is
  equivalent; we keep the reference's choice),
* key renaming (combine_loras.py:26-44): the unet part maps
  ``lora_unet-…`` → ``transformer.…`` with ``_down/_up`` → ``_A/_B`` and
  ``-`` → ``.`` (diffusers/PEFT convention), the CLIP parts map ``-`` →
  ``_``, the T5 part additionally maps ``lora_te2_`` → ``lora_te3_``,
* ``alpha`` / ``dora_scale`` entries pass through unscaled,
* inputs may be ``.safetensors`` or torch ``.bin``.

Pure numpy — no device work (this is a host-side artifact tool).
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def read_tensors(file_path: str) -> Dict[str, np.ndarray]:
    if file_path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(file_path))
    if file_path.endswith(".bin") or file_path.endswith(".pt"):
        import torch

        data = torch.load(file_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in data.items()}
    raise ValueError(f"Unsupported checkpoint format: {file_path}")


def _rename(key: str, part: str) -> str:
    if part == "transformer":
        if key.startswith("lora_unet_"):
            # DELIBERATE DEVIATION from combine_loras.py:29-33: the
            # reference rename chain is written for '-'-delimited SD3/Flux
            # keys; applied to a '_'-delimited SD1/XL key it corrupts module
            # names ('down_blocks' → 'A_blocks'), producing a file nothing
            # can load. XL/SD1 unet parts pass through in canonical schema
            # (adapters/slider_file.split_parts reads them back directly).
            return key
        key = key.replace("lora_unet-", "transformer.")
        key = key.replace("_down", "_A")
        key = key.replace("_up", "_B")
        key = key.replace("-", ".")
    elif part == "CLIP":
        key = key.replace("-", "_")
    elif part == "T5":
        key = key.replace("-", "_")
        key = key.replace("lora_te2_", "lora_te3_")
    return key


def merge_part(out: Dict[str, np.ndarray], tensors: Dict[str, np.ndarray], strength: float, part: str):
    for k, v in tensors.items():
        k2 = _rename(k, part)
        if "alpha" in k or "dora_scale" in k:
            out[k2] = np.array(v, copy=True)
        elif "_up" in k or "_A" in k:
            out[k2] = np.array(v, copy=True)
        elif "_down" in k or "_B" in k:
            out[k2] = strength * np.asarray(v)
        else:
            raise AssertionError(f"{k} not supported")


def combine(unet_path, enc1_path, enc2_path, out_path, unet_strength=0.8, enc_strength=1.0, enc2_strength=1.0):
    out: Dict[str, np.ndarray] = {}
    merge_part(out, read_tensors(unet_path), unet_strength, "transformer")
    merge_part(out, read_tensors(enc1_path), enc_strength, "CLIP")
    merge_part(out, read_tensors(enc2_path), enc2_strength, "T5")
    from safetensors.numpy import save_file

    save_file(out, out_path)
    return out


def main():
    parser = argparse.ArgumentParser(description="Merge slider safetensor files.")
    parser.add_argument("unet_model", type=str)
    parser.add_argument("encoder1_model", type=str)
    parser.add_argument("encoder2_model", type=str)
    parser.add_argument("output_model", type=str)
    parser.add_argument("unet_strength", type=float, default=0.8, nargs="?")
    parser.add_argument("enc_strength", type=float, default=1.0, nargs="?")
    parser.add_argument("enc2_strength", type=float, default=1.0, nargs="?")
    args = parser.parse_args()
    combine(
        args.unet_model,
        args.encoder1_model,
        args.encoder2_model,
        args.output_model,
        args.unet_strength,
        args.enc_strength,
        args.enc2_strength,
    )


if __name__ == "__main__":
    main()
