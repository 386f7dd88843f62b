"""Forward-activation parity harness vs the PyTorch reference.

The north star requires CLIP/LPIPS parity curves and diffusers-loadable
exports (BASELINE.md). Bitwise RNG parity is impossible across torch/JAX
(SURVEY §7.4), so parity is established at the *function* level: identical
inputs → near-identical model outputs. This module runs OUR models on fixed
probe inputs and writes the activations; ``dump_reference_activations`` is
the torch-side twin to run wherever torch+diffusers exist; ``compare``
reports per-tensor max-abs/rel errors.

Usage (JAX side, local diffusers checkout):
  python -m sliders_conceptmod_tpu.eval.parity dump --model_dir /ckpts/sd15 \
      --family sd15 --out /tmp/parity_jax.npz
  python -m sliders_conceptmod_tpu.eval.parity compare \
      --a /tmp/parity_jax.npz --b /tmp/parity_torch.npz
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def probe_inputs(family: str, seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic probe tensors shared by both sides."""
    rng = np.random.default_rng(seed)
    d: Dict[str, np.ndarray] = {
        "latents": rng.standard_normal((1, 4, 64, 64)).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "input_ids": np.array([[49406] + [320] * 5 + [49407] + [49407] * 70], np.int64),
    }
    if family == "sdxl":
        d["context"] = rng.standard_normal((1, 77, 2048)).astype(np.float32) * 0.2
        d["pooled"] = rng.standard_normal((1, 1280)).astype(np.float32) * 0.2
        d["time_ids"] = np.array([[512, 512, 0, 0, 512, 512]], np.float32)
    else:
        d["context"] = rng.standard_normal((1, 77, 768)).astype(np.float32) * 0.2
    return d


def dump_jax_activations(model_dir: str, family: str, out: str) -> None:
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.models import factory

    probes = probe_inputs(family)
    acts: Dict[str, np.ndarray] = {}

    if family == "sdxl":
        tokenizers, text_encoders, unet, scheduler = factory.load_models_xl(model_dir)
        added = {
            "text_embeds": jnp.asarray(probes["pooled"]),
            "time_ids": jnp.asarray(probes["time_ids"]),
        }
        acts["unet_out"] = np.asarray(
            unet.apply_fn()(
                unet.params,
                jnp.asarray(probes["latents"]),
                jnp.asarray(probes["timestep"]),
                jnp.asarray(probes["context"]),
                added_cond_kwargs=added,
            ),
            np.float32,
        )
        te = text_encoders[0]
    else:
        tokenizer, te, unet, scheduler = factory.load_models(model_dir)
        acts["unet_out"] = np.asarray(
            unet.apply_fn()(
                unet.params,
                jnp.asarray(probes["latents"]),
                jnp.asarray(probes["timestep"]),
                jnp.asarray(probes["context"]),
            ),
            np.float32,
        )
    te_out = te.apply(jnp.asarray(probes["input_ids"]))
    acts["text_last_hidden"] = np.asarray(te_out.last_hidden_state, np.float32)
    acts["text_penultimate"] = np.asarray(te_out.hidden_states[-2], np.float32)
    np.savez(out, **acts)
    print(f"wrote {out}: " + ", ".join(f"{k}{v.shape}" for k, v in acts.items()))


TORCH_REFERENCE_SNIPPET = r'''
# Run where torch + diffusers are installed (the reference environment):
import numpy as np, torch
from diffusers import UNet2DConditionModel
from transformers import CLIPTextModel
from sliders_conceptmod_tpu.eval.parity import probe_inputs

def dump_reference_activations(model_dir, family, out):
    p = probe_inputs(family)
    unet = UNet2DConditionModel.from_pretrained(f"{model_dir}/unet").eval()
    te = CLIPTextModel.from_pretrained(f"{model_dir}/text_encoder").eval()
    with torch.no_grad():
        kwargs = {}
        if family == "sdxl":
            kwargs["added_cond_kwargs"] = {
                "text_embeds": torch.tensor(p["pooled"]),
                "time_ids": torch.tensor(p["time_ids"]),
            }
        u = unet(torch.tensor(p["latents"]), torch.tensor(p["timestep"]),
                 encoder_hidden_states=torch.tensor(p["context"]), **kwargs).sample
        t = te(torch.tensor(p["input_ids"]), output_hidden_states=True)
    np.savez(out, unet_out=u.numpy(),
             text_last_hidden=t.last_hidden_state.numpy(),
             text_penultimate=t.hidden_states[-2].numpy())
'''


def compare(a_path: str, b_path: str, atol: float = 5e-3) -> bool:
    a, b = np.load(a_path), np.load(b_path)
    ok = True
    for k in sorted(set(a.files) & set(b.files)):
        diff = np.abs(a[k] - b[k])
        scale = np.abs(b[k]).max() + 1e-8
        line = f"{k}: max_abs={diff.max():.3e} rel={diff.max()/scale:.3e}"
        if diff.max() / scale > atol:
            ok = False
            line += "  <-- MISMATCH"
        print(line)
    missing = set(a.files) ^ set(b.files)
    if missing:
        print(f"only in one file: {sorted(missing)}")
        ok = False
    print("PARITY OK" if ok else "PARITY FAILED")
    return ok


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--model_dir", required=True)
    d.add_argument("--family", default="sd15")
    d.add_argument("--out", required=True)
    c = sub.add_parser("compare")
    c.add_argument("--a", required=True)
    c.add_argument("--b", required=True)
    c.add_argument("--atol", type=float, default=5e-3)
    args = ap.parse_args()
    if args.cmd == "dump":
        dump_jax_activations(args.model_dir, args.family, args.out)
    else:
        raise SystemExit(0 if compare(args.a, args.b, args.atol) else 1)


if __name__ == "__main__":
    main()
