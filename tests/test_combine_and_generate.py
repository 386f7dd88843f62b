"""combine_loras key-renaming parity + sampler start_noise gating math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.cli.combine_loras import _rename, merge_part
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
from sliders_conceptmod_tpu.infer.generate import flip_step_for_start_noise


def test_rename_transformer_keys():
    """reference combine_loras.py:26-33."""
    assert (
        _rename("lora_unet-down_blocks-0-attn1-to_q.lora_down.weight", "transformer")
        == "transformer.down_blocks.0.attn1.to_q.lora_A.weight"
    )
    assert _rename("lora_te1-text-model.lora_up.weight", "CLIP") == "lora_te1_text_model.lora_up.weight"
    assert _rename("lora_te2_block-0.alpha", "T5") == "lora_te3_block_0.alpha"


def test_merge_strength_on_down_only():
    """strength scales _down/_B factors; _up and alpha pass through
    (reference combine_loras.py:46-60)."""
    out = {}
    tensors = {
        "m.lora_down.weight": np.ones((2, 4), np.float32),
        "m.lora_up.weight": np.ones((4, 2), np.float32),
        "m.alpha": np.asarray(4.0, np.float32),
    }
    merge_part(out, tensors, 0.5, "CLIP")
    np.testing.assert_allclose(out["m.lora_down.weight"], 0.5)
    np.testing.assert_allclose(out["m.lora_up.weight"], 1.0)
    np.testing.assert_allclose(out["m.alpha"], 4.0)


def test_flip_step_for_start_noise():
    """start_noise=750 at 50 DDIM steps: slider turns on at the first
    timestep <= 750 (reference generate_images_xl.py:324-328 flip rule)."""
    sched = create_noise_scheduler("ddim")
    schedule = sched.set_timesteps(50)
    ts = np.asarray(schedule.timesteps)  # 980, 960, ... 0
    flip = flip_step_for_start_noise(schedule, 750)
    assert ts[flip] <= 750 and ts[flip - 1] > 750
    # degenerate ends
    assert flip_step_for_start_noise(schedule, 2000) == 0  # always on
    assert flip_step_for_start_noise(schedule, -1) == 50  # never on


def test_sample_loop_g0_uses_conditional_rows():
    """guidance_scale <= 1 disables CFG and must use the CONDITIONAL rows
    (diffusers do_classifier_free_guidance semantics; turbo models).
    u + 0*(c-u) = u would wrongly return the unconditional prediction."""
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.infer.generate import sample_loop
    from sliders_conceptmod_tpu.models import factory

    tok, te, unet, _ = factory.load_models("tiny")
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(2)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)) * schedule.init_noise_sigma
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32)) * 0.2
    uncond = jnp.zeros((1, 5, 32))
    emb = jnp.concatenate([uncond, cond], axis=0)

    def run(g):
        return np.asarray(
            sample_loop(
                unet.apply_fn(), unet.params, unet.params, 0, scheduler, schedule,
                lat, emb, jax.random.PRNGKey(2), guidance_scale=g,
            )
        )

    # g=0 must equal the pure-conditional trajectory, NOT the uncond one
    cond_only = np.asarray(
        sample_loop(
            unet.apply_fn(), unet.params, unet.params, 0, scheduler, schedule,
            lat, jnp.concatenate([cond, cond], axis=0), jax.random.PRNGKey(2),
            guidance_scale=7.5,  # forced CFG with identical halves == conditional
        )
    )
    np.testing.assert_allclose(run(0.0), cond_only, atol=1e-5)
    # and differ from the unconditional trajectory
    uncond_only = np.asarray(
        sample_loop(
            unet.apply_fn(), unet.params, unet.params, 0, scheduler, schedule,
            lat, jnp.concatenate([uncond, uncond], axis=0), jax.random.PRNGKey(2),
            guidance_scale=7.5,
        )
    )
    assert np.abs(run(0.0) - uncond_only).max() > 1e-4


def test_sample_loop_accepts_traced_guidance():
    """serve.py jits the sampler with guidance_scale as an ARGUMENT — the
    g<=1 fast-path check must not concretize a tracer."""
    from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler
    from sliders_conceptmod_tpu.infer.generate import sample_loop
    from sliders_conceptmod_tpu.models import factory

    tok, te, unet, _ = factory.load_models("tiny")
    scheduler = create_noise_scheduler("ddim")
    schedule = scheduler.set_timesteps(2)
    lat = jnp.zeros((1, 4, 8, 8))
    emb = jnp.zeros((2, 5, 32))

    @jax.jit
    def run(g):
        return sample_loop(
            unet.apply_fn(), unet.params, unet.params, 0, scheduler, schedule,
            lat, emb, jax.random.PRNGKey(0), guidance_scale=g,
        )

    out = run(jnp.asarray(7.5))
    assert np.isfinite(np.asarray(out)).all()


def test_generate_images_sd3_cli_smoke(tmp_path):
    """End-to-end sweep CLI on the tiny weightless family: pre-encode →
    encoder teardown → two-phase flow sampler → per-scale outputs (the
    full-scale run holds base + merged SD3 trees, so the CLI must survive
    the encoder-free restructure unchanged at tiny scale)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.cli.generate_images_sd3 import build_parser, run
    from sliders_conceptmod_tpu.models import factory

    _, _, tr, _ = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.bfloat16)
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    # fresh init has zero up-factors (merged == base at every scale); nudge
    # every factor so ±scale actually produces different outputs
    lp = jax.tree.map(lambda a: jnp.full_like(a, 0.05), lp)
    ckpt = tmp_path / "tiny_sd3_slider_alpha1.0_rank2_full.safetensors"
    lora_lib.save_weights(str(ckpt), sites, lp)
    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text(
        'case_number,prompt,evaluation_seed,concept\n0,"a cat",7,cat\n'
    )

    args = build_parser().parse_args([
        "--model_name", str(ckpt), "--prompts_path", str(csv_path),
        "--save_path", str(tmp_path / "sweep"), "--base", "tiny-sd3",
        "--image_size", "64", "--steps", "3", "--scales=-1,1",
    ])
    run(args)
    outs = sorted((tmp_path / "sweep").rglob("*.npy"))
    assert len(outs) == 2  # one per scale
    a, b = (np.load(p).astype(np.float32) for p in outs)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 0  # the slider scale actually changes the output

    # --quantize_base: traced-scale overlay sampler over the (identical at
    # tiny scale — kernels below QUANT_MIN_ELEMS) base matches the
    # merged-tree sweep up to bf16 merge rounding
    qargs = build_parser().parse_args([
        "--model_name", str(ckpt), "--prompts_path", str(csv_path),
        "--save_path", str(tmp_path / "sweep_q"), "--base", "tiny-sd3",
        "--image_size", "64", "--steps", "3", "--scales=-1,1",
        "--quantize_base",
    ])
    run(qargs)
    qouts = sorted((tmp_path / "sweep_q").rglob("*.npy"))
    assert len(qouts) == 2
    for p, qp in zip(outs, qouts):
        ref, got = np.load(p).astype(np.float32), np.load(qp).astype(np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)


def test_generate_images_flux_cli_smoke(tmp_path):
    """End-to-end flux sweep CLI on tiny weightless: pre-encode → encoder
    teardown → packed-latent flow sampler → per-scale fp32 npy outputs."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.cli.generate_images_flux import build_parser, run
    from sliders_conceptmod_tpu.models import factory

    _, _, tr, _ = factory.load_models_flux("tiny-flux", weight_dtype=jnp.bfloat16)
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda a: jnp.full_like(a, 0.05), lp)
    ckpt = tmp_path / "tiny_flux_slider_alpha1.0_rank2_full.safetensors"
    lora_lib.save_weights(str(ckpt), sites, lp)
    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text(
        'case_number,prompt,evaluation_seed,concept\n0,"a cat",7,cat\n'
    )

    args = build_parser().parse_args([
        "--model_name", str(ckpt), "--prompts_path", str(csv_path),
        "--save_path", str(tmp_path / "sweep"), "--base", "tiny-flux",
        "--image_size", "16", "--steps", "2", "--scales=-1,1",
    ])
    run(args)
    outs = sorted((tmp_path / "sweep").rglob("*.npy"))
    assert len(outs) == 2
    a, b = (np.load(p).astype(np.float32) for p in outs)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 0

    # --quantize_base: the overlay sampler (traced scale, int8-ready base)
    # sweeps the same checkpoint and matches the merged-tree path up to
    # bf16 merge rounding (tiny kernels sit below QUANT_MIN_ELEMS, so the
    # base itself is identical — this isolates overlay-vs-merge)
    qargs = build_parser().parse_args([
        "--model_name", str(ckpt), "--prompts_path", str(csv_path),
        "--save_path", str(tmp_path / "sweep_q"), "--base", "tiny-flux",
        "--image_size", "16", "--steps", "2", "--scales=-1,1",
        "--quantize_base",
    ])
    run(qargs)
    qouts = sorted((tmp_path / "sweep_q").rglob("*.npy"))
    assert len(qouts) == 2
    for p, qp in zip(outs, qouts):
        ref, got = np.load(p).astype(np.float32), np.load(qp).astype(np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)

    # --w8a8 (implies --quantize_base): the W8A8 serving fast path drives the
    # same sweep end-to-end; at tiny scale the kernels sit below
    # QUANT_MIN_ELEMS so the activation-quant interceptor has no members --
    # this smokes the flag plumbing from argparse through the bundle
    wargs = build_parser().parse_args([
        "--model_name", str(ckpt), "--prompts_path", str(csv_path),
        "--save_path", str(tmp_path / "sweep_w8a8"), "--base", "tiny-flux",
        "--image_size", "16", "--steps", "2", "--scales=-1,1",
        "--w8a8",
    ])
    run(wargs)
    wouts = sorted((tmp_path / "sweep_w8a8").rglob("*.npy"))
    assert len(wouts) == 2
    assert all(np.isfinite(np.load(p).astype(np.float32)).all() for p in wouts)


def test_generate_images_sd1_v2_cli_smoke(tmp_path):
    """--v2/--v_pred on the SD1 sweep CLI (r5, VERDICT r4 weak #4: a slider
    trained on an SD2.x base could be served but not swept): v2-layout tiny
    single-file base → OpenCLIP tower + v-prediction LMS loop → per-scale
    PNGs that differ across slider scales."""
    from PIL import Image

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.cli.generate_images_sd1 import build_parser, run
    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models import factory

    _, te, vae, unet, _ = factory.load_models("tiny", with_vae=True)
    base = tmp_path / "tiny-sd2.safetensors"
    le.save_ldm_checkpoint(
        str(base), le.export_ldm_checkpoint(unet.params, te.params, vae.params, v2=True)
    )
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda a: jnp.full_like(a, 0.05), lp)
    ckpt = tmp_path / "tiny_sd2_slider_alpha1.0_rank2_full.safetensors"
    lora_lib.save_weights(str(ckpt), sites, lp)
    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text('case_number,prompt,evaluation_seed,concept\n0,"a cat",7,cat\n')

    args = build_parser().parse_args([
        "--model_name", str(ckpt), "--prompts_path", str(csv_path),
        "--save_path", str(tmp_path / "sweep"), "--base", str(base),
        "--image_size", "64", "--ddim_steps", "3", "--num_samples", "1",
        "--scales=-1,1", "--v2", "--v_pred",
    ])
    run(args)
    name = ckpt.name
    outs = sorted((tmp_path / "sweep" / name).glob("*/0_0.png"))
    assert len(outs) == 2  # one per scale
    a, b = (np.asarray(Image.open(p), np.float32) for p in outs)
    assert np.abs(a - b).max() > 0  # the slider scale changes the v-pred sweep
    assert (tmp_path / "sweep" / name / "all" / "0.png").exists()
