"""Full-size single-file checkpoint drill (VERDICT r2 task 6).

The exact-inverse roundtrips + structural goldens validate the single-file
logic on tiny synthetic checkpoints; this drill proves the MULTI-GB path on
real dimensions (reference loads 5-7 GB single files,
``conceptmod/textsliders/model_util.py:37-109``):

  A. synthesize a REAL-dimension SDXL SGM single file (UNet 2.57B + both
     text towers + VAE, fp16 — same layout/size class as sd_xl_base_1.0)
  B. load it through io/ldm_convert (bulk arena reader, io/native.py) on the TPU host:
     wall-clock + peak host RSS
  C. run 10 real train steps from it through the actual train_lora_xl CLI
  D. run a 2-scale DDIM sweep from the trained slider through
     generate_images_xl (base = the same single file, real VAE decode)

Run on the TPU host (plain python, background):
  python scripts/full_checkpoint_drill.py /tmp/drill
Writes {out}/drill.json with per-phase timings.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build_file(path: str) -> dict:
    """Host-side synthesis: eval_shape gives the real-dim trees without any
    device work. Fill is seeded random normal * 0.02 — NOT the constant fill
    bench.py's weightless family uses: at real SDXL dims a constant fill has
    no sign cancellation, activations grow systematically through the 32
    CLIP layers / 5120-wide MLPs, and bf16 overflows to NaN (observed in the
    first drill run). Zero-mean random weights grow only ~sqrt(fan_in)*sigma
    per matmul and the norms renormalize, so losses stay finite."""
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from sliders_conceptmod_tpu.models.vae import AutoencoderKL, VAEConfig

    t0 = time.time()
    unet_cfg = UNetConfig.sdxl()
    unet = UNet2DConditionModel(unet_cfg)
    unet_shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 7, unet_cfg.cross_attention_dim)),
            added_cond_kwargs={
                "text_embeds": jnp.zeros((1, 1280)),
                "time_ids": jnp.zeros((1, 6)),
            },
        )
    )["params"]
    te1 = CLIPTextEncoder(CLIPTextConfig.sdxl_te1())
    te2 = CLIPTextEncoder(CLIPTextConfig.sdxl_te2())
    ids = np.zeros((1, 77), np.int32)
    te1_shapes = jax.eval_shape(lambda: te1.init(jax.random.PRNGKey(0), ids))["params"]
    te2_shapes = jax.eval_shape(lambda: te2.init(jax.random.PRNGKey(0), ids))["params"]
    vae = AutoencoderKL(VAEConfig.sdxl())
    vae_shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))
    )["params"]

    rng = np.random.default_rng(0)

    def fill(tree):
        return jax.tree.map(
            lambda s: (rng.standard_normal(s.shape, np.float32) * 0.02).astype(np.float16),
            tree,
        )

    n_params = sum(
        int(np.prod(s.shape))
        for tree in (unet_shapes, te1_shapes, te2_shapes, vae_shapes)
        for s in jax.tree.leaves(tree)
    )
    sd = le.export_sdxl_checkpoint(
        fill(unet_shapes), fill(te1_shapes), fill(te2_shapes), fill(vae_shapes)
    )
    le.save_ldm_checkpoint(path, sd)
    return {
        "build_seconds": time.time() - t0,
        "n_params": n_params,
        "file_gb": os.path.getsize(path) / 1e9,
        "n_tensors": len(sd),
    }


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/drill"
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, "sdxl_drill.safetensors")
    report = {}

    if not os.path.exists(ckpt):
        report.update(build_file(ckpt))
        print(f"[drill] built {ckpt}: {json.dumps(report)}", flush=True)

    import jax.numpy as jnp

    from sliders_conceptmod_tpu.models import factory

    # B: the multi-GB load path — arena reader -> SGM-layout conversion ->
    # bf16 host trees -> HBM
    t0 = time.time()
    toks, tes, unet, sched, vae = factory.load_models_xl(
        ckpt, weight_dtype=jnp.bfloat16, with_vae=True
    )
    import jax

    jax.block_until_ready(jax.tree.leaves(unet.params)[0])
    report["load_seconds"] = time.time() - t0
    report["peak_rss_gb_after_load"] = rss_gb()
    print(f"[drill] loaded in {report['load_seconds']:.1f}s, peak RSS {report['peak_rss_gb_after_load']:.1f} GB", flush=True)
    del toks, tes, unet, sched, vae  # the CLI reloads below

    # C: 10 real train steps through the actual CLI
    cfg_path = os.path.join(out_dir, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
prompts_file: "data/prompts-xl.yaml"
pretrained_model:
  name_or_path: "{ckpt}"
network:
  type: "lierla"
  rank: 4
  alpha: 1.0
  training_method: "noxattn"
train:
  precision: "bfloat16"
  noise_scheduler: "euler_a"
  iterations: 10
  lr: 0.0002
  optimizer: "adamw"
  lr_scheduler: "cosine"
  max_denoising_steps: 12
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
    from sliders_conceptmod_tpu.cli import train_lora_xl as tl

    t0 = time.time()
    args = tl.build_parser().parse_args(
        ["--config_file", cfg_path, "--rank", "4", "--alpha", "1.0"]
    )
    tl.main(args)
    report["train10_seconds"] = time.time() - t0
    slider = os.path.join(
        out_dir, "ckpt", "drill_alpha1.0_rank4_noxattn", "drill_alpha1.0_rank4_noxattn_last.safetensors"
    )
    if not os.path.exists(slider):
        # decorated path layout: save.path gets the decorated name appended
        import glob

        cands = glob.glob(os.path.join(out_dir, "ckpt", "**", "*_last.safetensors"), recursive=True)
        assert cands, "trainer produced no slider"
        slider = cands[0]
    print(f"[drill] 10 train steps in {report['train10_seconds']:.1f}s -> {slider}", flush=True)

    # D: a 2-scale sweep from the single file (real VAE decode)
    csv_path = os.path.join(out_dir, "prompts.csv")
    with open(csv_path, "w") as f:
        f.write("case_number,prompt,evaluation_seed,concept\n0,a photo of a person,42,person\n")
    from sliders_conceptmod_tpu.cli import generate_images_xl as gen

    t0 = time.time()
    gargs = gen.build_parser().parse_args(
        [
            "--model_name", slider,
            "--prompts_path", csv_path,
            "--save_path", os.path.join(out_dir, "sweep"),
            "--base", ckpt,
            "--image_size", "512",
            "--num_samples", "1",
            "--ddim_steps", "25",
            "--scales=-1,1",
        ]
    )
    gen.run(gargs)
    report["sweep_seconds"] = time.time() - t0
    report["peak_rss_gb_final"] = rss_gb()

    with open(os.path.join(out_dir, "drill.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"[drill] DONE {json.dumps(report)}", flush=True)


if __name__ == "__main__":
    main()
