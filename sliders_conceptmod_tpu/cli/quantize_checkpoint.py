"""CLI: quantize a frozen base checkpoint to an on-disk int8 artifact.

TPU deployment extension (no reference counterpart — the reference has no
quantized-base path at all): host-quantizing a full-depth Flux checkpoint
costs minutes of single-core CPU at every process start; this does it once.
The artifact (io/quant_cache.py, int8 kernels + fp32 per-column scales in
one safetensors file, ~half the bytes of bf16) loads directly in
``load_models_flux`` / ``load_models_sd3`` / ``load_models_xl`` /
``load_models`` / serving by passing it as the base path (the UNet families
store only the diffusion model — text towers/VAE init weightless unless you
point the CLIs at a real checkpoint dir).

  python -m sliders_conceptmod_tpu.cli.quantize_checkpoint \\
      --base /ckpts/flux-schnell --family flux --out flux-schnell.int8.safetensors
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def run(args):
    from sliders_conceptmod_tpu.io import quant_cache
    from sliders_conceptmod_tpu.models import factory

    dtype = jnp.bfloat16 if args.precision == "bfloat16" else jnp.float32
    if args.family == "flux":
        _, _, bundle, _ = factory.load_models_flux(args.base, weight_dtype=dtype, quantize_base=True)
    elif args.family == "sd3":
        _, _, bundle, _ = factory.load_models_sd3(args.base, weight_dtype=dtype, quantize_base=True)
    elif args.family == "xl":
        _, _, bundle, _ = factory.load_models_xl(args.base, weight_dtype=dtype, quantize_base=True)
    elif args.family == "sd1":
        _, _, bundle, _ = factory.load_models(args.base, weight_dtype=dtype, quantize_base=True)
    else:
        raise SystemExit(f"--family must be flux, sd3, xl or sd1, got {args.family}")
    if bundle.quant_scales is None:
        raise SystemExit("loader returned no quantization scales — nothing to save")
    quant_cache.save_quantized(
        args.out, bundle.params, bundle.quant_scales,
        metadata={"family": args.family, "source": str(args.base)},
    )
    n_q = len(bundle.quant_scales)
    print(f"wrote {args.out}: {n_q} int8 kernels (family={args.family})")


def build_parser():
    p = argparse.ArgumentParser(prog="quantizeCheckpoint")
    p.add_argument("--base", required=True, help="checkpoint dir / single file / weightless keyword")
    p.add_argument("--family", choices=["flux", "sd3", "xl", "sd1"], required=True)
    p.add_argument("--out", required=True, help="output .int8.safetensors path")
    p.add_argument("--precision", default="bfloat16", choices=["bfloat16", "float32"])
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
