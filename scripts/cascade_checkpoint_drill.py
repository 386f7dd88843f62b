"""Real-dimension Stable Cascade prior conversion drill.

COMPONENTS row 15 tracks "real-checkpoint conversion untested" for cascade:
no Stage-C checkpoint exists in this zero-egress env, so
``convert_cascade_state_dict`` (models/cascade.py) had only run on the tiny
config. This drill closes the structural half at REAL scale, the same way
scripts/full_checkpoint_drill.py does for SDXL single files (reference loads
the 3.6B prior via diffusers ``StableCascadePriorPipeline``,
``conceptmod/textsliders/model_util.py:290-308``):

  A. synthesize a real-dimension diffusers-layout ``prior/`` safetensors dir
     (CascadeConfig.prior(), 3.6B params, fp16, seeded random * 0.02 — the
     zero-mean fill; constant fill overflows bf16 at real dims, see
     full_checkpoint_drill.py)
  B. load it through factory.load_models_cascade → convert_cascade_state_dict
     (the REAL conversion path): wall-clock + peak host RSS
  C. run 5 real train steps through the actual train_lora_cascade CLI from
     that dir (wuerstchen scheduler — the repaired reference path)

Run on the TPU host (plain python, background):
  python scripts/cascade_checkpoint_drill.py /tmp/cascade_drill
Writes {out}/drill.json with per-phase timings.
"""

import json
import os
import re
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _dotted(seg: str) -> str:
    # inverse of torch_convert._merge_numeric: trailing _<int> -> .<int>
    while (m := re.match(r"^(.*)_(\d+)$", seg)):
        seg = f"{m.group(1)}.{m.group(2)}"
    return seg


def build_prior_dir(out_dir: str, cfg=None) -> dict:
    """eval_shape the full 3.6B prior and emit the diffusers torch layout by
    inverting the converter's mapping (the tiny-scale inversion
    tests/test_cascade.py::test_convert_cascade_state_dict_structure proves
    forward-equivalence of; here it manufactures the real-size fixture)."""
    import jax
    import jax.numpy as jnp

    from safetensors.numpy import save_file

    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet

    t0 = time.time()
    cfg = cfg or CascadeConfig.prior()
    model = StableCascadeUNet(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.in_channels, 4, 4)),
            jnp.zeros((1,)),
            jnp.zeros((1, 2, cfg.clip_text_in_channels)),
            jnp.zeros((1, 1, cfg.clip_text_pooled_in_channels)),
            jnp.zeros((1, 1, cfg.clip_image_in_channels)),
        )
    )["params"]

    rng = np.random.default_rng(0)
    sd = {}
    n_params = 0
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        segs = [k.key for k in keypath]
        arr = (rng.standard_normal(leaf.shape, np.float32) * 0.02).astype(np.float16)
        n_params += arr.size
        prefix = ".".join(_dotted(s) for s in segs[:-1])
        name = segs[-1]
        if name == "kernel":
            if segs[0].startswith("up_upscalers"):
                # torch ConvTranspose (in,out,kh,kw): undo transpose + flip;
                # diffusers keeps up_upscalers.<i>.1 (Sequential index)
                key = f"up_upscalers.{segs[0].split('_')[-2]}.1.weight"
                sd[key] = np.ascontiguousarray(np.transpose(arr[::-1, ::-1], (2, 3, 0, 1)))
            elif arr.ndim == 4:
                sd[prefix + ".weight"] = np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
            else:
                sd[prefix + ".weight"] = np.ascontiguousarray(np.transpose(arr, (1, 0)))
        elif name in ("gamma", "beta"):
            sd[f"{prefix}.{name}"] = arr
        else:  # bias / embedding-style leaves
            sd[prefix + ".bias" if name == "bias" else f"{prefix}.{name}"] = arr

    prior_dir = os.path.join(out_dir, "prior")
    os.makedirs(prior_dir, exist_ok=True)
    path = os.path.join(prior_dir, "diffusion_pytorch_model.safetensors")
    save_file(sd, path)
    return {
        "build_seconds": time.time() - t0,
        "n_params": int(n_params),
        "file_gb": os.path.getsize(path) / 1e9,
        "n_tensors": len(sd),
    }


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cascade_drill"
    os.makedirs(out_dir, exist_ok=True)
    report = {}

    if not os.path.isdir(os.path.join(out_dir, "prior")):
        report.update(build_prior_dir(out_dir))
        print(f"[drill] built prior/: {json.dumps(report)}", flush=True)

    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.models import factory

    # B: the real conversion path (dir → convert_cascade_state_dict → HBM)
    t0 = time.time()
    tok, te, prior, sched = factory.load_models_cascade(
        out_dir, scheduler_name="wuerstchen", weight_dtype=jnp.bfloat16
    )
    jax.block_until_ready(jax.tree.leaves(prior.params)[0])
    report["load_seconds"] = time.time() - t0
    report["peak_rss_gb_after_load"] = rss_gb()
    print(
        f"[drill] loaded+converted in {report['load_seconds']:.1f}s, "
        f"peak RSS {report['peak_rss_gb_after_load']:.1f} GB",
        flush=True,
    )
    del tok, te, prior, sched  # the CLI reloads below

    # C: 5 real train steps through the actual CLI
    cfg_path = os.path.join(out_dir, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
prompts_file: "{os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'data/prompts-cascade.yaml')}"
pretrained_model:
  name_or_path: "{out_dir}"
network:
  type: "lierla"
  rank: 4
  alpha: 1.0
  training_method: "noxattn"
train:
  precision: "bfloat16"
  noise_scheduler: "wuerstchen"
  iterations: 5
  lr: 0.0001
  optimizer: "adamw"
  lr_scheduler: "cosine"
  max_denoising_steps: 10
save:
  name: "drill"
  path: "{out_dir}/ckpt"
  per_steps: 100
  precision: "bfloat16"
logging:
  verbose: true
tpu:
  seed: 0
""")
    from sliders_conceptmod_tpu.cli import train_lora_cascade as tl

    t0 = time.time()
    args = tl.build_parser().parse_args(
        ["--config_file", cfg_path, "--rank", "4", "--alpha", "1.0"]
    )
    tl.main(args)
    report["train5_seconds"] = time.time() - t0
    report["peak_rss_gb_final"] = rss_gb()

    with open(os.path.join(out_dir, "drill.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"[drill] DONE {json.dumps(report)}", flush=True)


if __name__ == "__main__":
    main()
