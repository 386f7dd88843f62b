"""argparse→CSV e2e for the eval CLIs + the one-command acceptance harness.

The reference's stated evaluate loop (README.md:34-35) — sweep → clip_score
appends per-scale columns (eval-scripts/clip_score.py:53-72) → lpip_score
writes lpips_score.csv (eval-scripts/lpip_score.py:44-76) — driven end to end
from synthetic scorer weights (zero-egress env: pipeline validation, not
metric-value validation; the CLIP math itself is HF-cross-checked in
tests/test_hf_parity.py)."""

import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    """Local transformers-CLIPModel-layout dir (config.json + model.safetensors);
    tokenizer falls back to the deterministic HashTokenizer."""
    from transformers import CLIPConfig, CLIPModel

    d = tmp_path_factory.mktemp("tiny_clip")
    cfg = CLIPConfig(
        text_config={
            "vocab_size": 49408, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 77, "eos_token_id": 49407,
            "bos_token_id": 49406, "pad_token_id": 0, "hidden_act": "quick_gelu",
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "image_size": 64, "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
        projection_dim=16,
    )
    import torch

    torch.manual_seed(0)
    CLIPModel(cfg).save_pretrained(str(d), safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def lpips_weight_files(tmp_path_factory):
    """Random torchvision-AlexNet + lpips-lin state dicts (exact key/shape
    schema of the real files, random values)."""
    import torch

    d = tmp_path_factory.mktemp("lpips_w")
    torch.manual_seed(0)
    alex = {}
    # torchvision alexnet .features conv layers: idx (out, in, k)
    specs = [(0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3), (8, 256, 384, 3), (10, 256, 256, 3)]
    for idx, out_c, in_c, k in specs:
        alex[f"features.{idx}.weight"] = torch.randn(out_c, in_c, k, k) * 0.05
        alex[f"features.{idx}.bias"] = torch.randn(out_c) * 0.01
    lin = {}
    for i, c in enumerate([64, 192, 384, 256, 256]):
        lin[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1) * 0.1
    alex_path = str(d / "alexnet.pth")
    lin_path = str(d / "lpips_alex.pth")
    torch.save(alex, alex_path)
    torch.save(lin, lin_path)
    return alex_path, lin_path


@pytest.fixture(scope="module")
def sweep_dir(tmp_path_factory):
    """A synthetic generated sweep: 3 scale folders × 2 cases × 2 samples."""
    from PIL import Image

    root = tmp_path_factory.mktemp("sweep")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 64, 3), np.uint8)
    for scale in ("-1.0", "0.0", "1.0"):
        sd = root / scale
        sd.mkdir()
        for case in (0, 1):
            for idx in (0, 1):
                # scale-dependent perturbation so LPIPS(scale≠0 vs 0) > 0
                img = base.copy()
                if scale != "0.0":
                    img = np.clip(
                        img.astype(np.int32) + int(float(scale) * 40) + case, 0, 255
                    ).astype(np.uint8)
                Image.fromarray(img).save(sd / f"{case}_{idx}.png")
    csv = root / "prompts.csv"
    csv.write_text(
        "case_number,prompt,evaluation_seed,concept\n"
        "0,a smiling person,1,person\n"
        "1,a person,2,person\n"
    )
    return str(root), str(csv)


def test_clip_score_cli_writes_csv(sweep_dir, tiny_clip_dir):
    import pandas as pd

    from sliders_conceptmod_tpu.eval import clip_score

    root, csv = sweep_dir
    args = clip_score.build_parser().parse_args(
        ["--im_path", root, "--prompt", "a person", "--prompts_path", csv,
         "--clip_model", tiny_clip_dir]
    )
    clip_score.run(args)
    out = os.path.join(root, "clip_scores.csv")
    assert os.path.exists(out)
    df = pd.read_csv(out)
    for scale in ("-1.0", "0.0", "1.0"):
        col = f"clip_{scale}"
        assert col in df.columns
        assert df[col].notna().all(), f"{col} has NaNs"
        assert np.isfinite(df[col]).all()
    # per-case averaging: both samples of a case fold into one value
    assert len(df) == 2


def test_lpip_score_cli_writes_csv(sweep_dir, lpips_weight_files):
    import pandas as pd

    from sliders_conceptmod_tpu.eval import lpip_score

    root, csv = sweep_dir
    alex, lin = lpips_weight_files
    args = lpip_score.build_parser().parse_args(
        ["--im_path", root, "--prompts_path", csv, "--true", "0.0",
         "--alexnet_weights", alex, "--lpips_weights", lin]
    )
    lpip_score.run(args)
    out = os.path.join(root, "lpips_score.csv")
    assert os.path.exists(out)
    df = pd.read_csv(out)
    for scale in ("-1.0", "1.0"):
        col = f"lpips_{scale}"
        assert col in df.columns
        # perturbed folders are genuinely different from scale-0 → LPIPS > 0
        assert (df[col] > 0).all()
    assert "lpips_0.0" not in df.columns  # the true folder isn't scored


def test_lpips_identical_images_zero(lpips_weight_files, tmp_path):
    """LPIPS(x, x) == 0 — any correct distance, even with random weights."""
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.models.lpips import LPIPS, load_lpips_params

    alex, lin = lpips_weight_files
    model = LPIPS()
    params = load_lpips_params(alex, lin)
    img = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 64, 64)), jnp.float32)
    d = model.apply({"params": params}, img, img)
    assert abs(float(d[0])) < 1e-6


def test_lpips_cross_framework_parity(lpips_weight_files):
    """Our JAX LPIPS vs an INDEPENDENT torch implementation of the published
    pipeline (Zhang et al. 2018; lpips-package semantics the reference scores
    with, eval-scripts/lpip_score.py:22-25) on the SAME random weight files.

    Validates every conversion detail — conv weight transpose, padding,
    strides, maxpool config, ScalingLayer, channel-unit-norm eps placement
    (OUTSIDE the sqrt), 1x1 lin heads, spatial mean, tap sum — i.e. the whole
    scorer up to the actual pretrained values, which the zero-egress env
    cannot supply. The torch side below is written directly from the formula,
    not imported from the lpips package (not installed here)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    alex_path, lin_path = lpips_weight_files
    alex_sd = torch.load(alex_path, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        # torchvision alexnet .features: conv idx (stride, pad); pool after
        # the first two ReLUs (kernel 3, stride 2, floor mode)
        taps, h = [], x
        for i, (idx, stride, pad) in enumerate(
            [(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)]
        ):
            h = F.conv2d(
                h, alex_sd[f"features.{idx}.weight"],
                alex_sd[f"features.{idx}.bias"], stride=stride, padding=pad,
            )
            h = F.relu(h)
            taps.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, 2)
        return taps

    def lpips_torch(i0, i1):
        t0s, t1s = feats((i0 - shift) / scale), feats((i1 - shift) / scale)
        total = torch.zeros(i0.shape[0])
        for i, (t0, t1) in enumerate(zip(t0s, t1s)):
            n0 = t0 / (torch.sqrt((t0**2).sum(1, keepdim=True)) + 1e-10)
            n1 = t1 / (torch.sqrt((t1**2).sum(1, keepdim=True)) + 1e-10)
            lin = F.conv2d((n0 - n1) ** 2, lin_sd[f"lin{i}.model.1.weight"])
            total = total + lin.mean(dim=(2, 3))[:, 0]
        return total

    rng = np.random.default_rng(3)
    i0 = rng.uniform(-1.0, 1.0, (2, 3, 64, 64)).astype(np.float32)
    i1 = np.clip(i0 + rng.normal(0.0, 0.2, i0.shape), -1, 1).astype(np.float32)
    want = lpips_torch(torch.from_numpy(i0), torch.from_numpy(i1)).numpy()

    from sliders_conceptmod_tpu.models.lpips import LPIPS, load_lpips_params

    model = LPIPS()
    params = load_lpips_params(alex_path, lin_path)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(i0), jnp.asarray(i1)),
        np.float32,
    )
    assert want.min() > 1e-4  # non-degenerate fixture: distances are real
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_acceptance_pipeline_e2e(tmp_path, tiny_clip_dir, lpips_weight_files):
    """The whole acceptance chain as ONE command on the tiny weightless
    family: train → sweep → clip_scores.csv → lpips_score.csv."""
    import pandas as pd

    from sliders_conceptmod_tpu.cli import acceptance

    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text("case_number,prompt,evaluation_seed,concept\n0,a person,5,person\n")
    alex, lin = lpips_weight_files

    cfg = f"""
prompts_file: "data/prompts-tiny.yaml"
pretrained_model:
  name_or_path: "tiny-xl"
network:
  type: "lierla"
  rank: 2
  alpha: 1.0
  training_method: "full"
train:
  precision: "float32"
  noise_scheduler: "ddim"
  iterations: 2
  lr: 0.001
  optimizer: "adamw"
  lr_scheduler: "constant"
  max_denoising_steps: 3
save:
  name: "acc_tiny"
  path: "{tmp_path}/ckpt"
  per_steps: 100
  precision: "float32"
logging:
  verbose: false
tpu:
  seed: 0
"""
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(cfg)

    args = acceptance.build_parser().parse_args(
        [
            "--config_file", str(cfg_path),
            "--prompts_path", str(csv_path),
            "--save_path", str(tmp_path / "acc"),
            "--base", "tiny-xl",
            "--rank", "2",
            "--image_size", "64",
            "--ddim_steps", "2",
            "--start_noise", "2000",
            "--scales=-1,0,1",
            "--clip_model", tiny_clip_dir,
            "--alexnet_weights", alex,
            "--lpips_weights", lin,
        ]
    )
    sweep = acceptance.run(args)

    clip_df = pd.read_csv(os.path.join(sweep, "clip_scores.csv"))
    lpips_df = pd.read_csv(os.path.join(sweep, "lpips_score.csv"))
    assert {"clip_-1.0", "clip_0.0", "clip_1.0"} <= set(clip_df.columns)
    assert clip_df["clip_1.0"].notna().all()
    assert {"lpips_-1.0", "lpips_1.0"} <= set(lpips_df.columns)
    import json

    with open(tmp_path / "acc" / "acceptance.json") as f:
        t = json.load(f)
    assert {"train_seconds", "sweep_seconds", "clip_seconds", "lpips_seconds"} <= set(t)
    # verify_outputs ran (VERDICT r3 task 6): per-scale mean curves + the
    # LPIPS zero-point identity land in acceptance.json
    assert set(t["clip_curve"]) == {"-1.0", "0.0", "1.0"}
    assert set(t["lpips_curve"]) == {"-1.0", "1.0"}
    assert all(np.isfinite(v) for v in t["clip_curve"].values())
    assert all(np.isfinite(v) and v >= 0 for v in t["lpips_curve"].values())
    assert t["lpips_identity"] == 0.0


def test_acceptance_verify_catches_structural_breaks(tmp_path):
    """verify_outputs rejects missing columns and non-finite values."""
    import pandas as pd
    import pytest

    from sliders_conceptmod_tpu.cli.acceptance import verify_outputs

    sweep = tmp_path / "sweep"
    for scale in ("-1.0", "0.0", "1.0"):
        (sweep / scale).mkdir(parents=True)
    pd.DataFrame({"case_number": [0], "clip_-1.0": [0.1], "clip_0.0": [0.2]}).to_csv(
        sweep / "clip_scores.csv", index=False
    )
    with pytest.raises(SystemExit, match="missing column clip_1.0"):
        verify_outputs(str(sweep), "0.0")

    pd.DataFrame(
        {"case_number": [0], "clip_-1.0": [0.1], "clip_0.0": [float("nan")], "clip_1.0": [0.3]}
    ).to_csv(sweep / "clip_scores.csv", index=False)
    with pytest.raises(SystemExit, match="non-finite"):
        verify_outputs(str(sweep), "0.0")

    pd.DataFrame(
        {"case_number": [0], "clip_-1.0": [0.1], "clip_0.0": [0.3], "clip_1.0": [0.2]}
    ).to_csv(sweep / "clip_scores.csv", index=False)
    with pytest.raises(SystemExit, match="not monotone"):
        verify_outputs(str(sweep), "0.0", expect_monotone=True)

    pd.DataFrame(
        {"case_number": [0], "clip_-1.0": [0.1], "clip_0.0": [0.2], "clip_1.0": [0.3]}
    ).to_csv(sweep / "clip_scores.csv", index=False)
    report = verify_outputs(str(sweep), "0.0", expect_monotone=True)
    assert report["clip_curve"] == {"-1.0": 0.1, "0.0": 0.2, "1.0": 0.3}

    pd.DataFrame({"case_number": [0], "lpips_-1.0": [-0.5], "lpips_1.0": [0.2]}).to_csv(
        sweep / "lpips_score.csv", index=False
    )
    with pytest.raises(SystemExit, match="negative LPIPS"):
        verify_outputs(str(sweep), "0.0")
