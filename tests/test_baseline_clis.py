"""End-to-end smoke of the baseline-comparison generator CLIs (VERDICT r1
item 2) — UCE / Textual Inversion SD1+XL / Custom Diffusion — each driven
from its argparse surface against tiny weightless models on CPU, producing
real PNGs from synthetic checkpoints.

Reference surfaces: eval-scripts/generate_images-uce.py,
generate_images_textinversion{,_xl}.py, generate_images_customdiffusion.py.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def prompts_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("prompts") / "prompts.csv"
    p.write_text(
        "case_number,prompt,evaluation_seed,concept\n0,a photo of a person,42,person\n"
    )
    return str(p)


def _common(parser_args, extra):
    return parser_args + [
        "--image_size", "64",
        "--ddim_steps", "3",
        "--num_samples", "1",
    ] + extra


def test_uce_cli(prompts_csv, tmp_path):
    from sliders_conceptmod_tpu.cli import generate_images_uce as cli
    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models import factory

    _, _, unet, _ = factory.load_models("tiny")
    sd = le._flax_to_torch_entries(unet.params)
    edited = {k: torch.from_numpy(np.asarray(v, np.float32) + 0.01) for k, v in sd.items()}
    model_path = tmp_path / "uce_edited.pt"
    torch.save(edited, str(model_path))

    args = cli.build_parser().parse_args(
        _common(
            ["--model_path", str(model_path), "--prompts_path", prompts_csv,
             "--save_path", str(tmp_path / "out"), "--base", "tiny"],
            ["--scales=-1,0,0.5", "--start_noise", "500"],
        )
    )
    cli.run(args)
    name = "uce_edited.pt"
    for folder in ("-1", "0", "half"):
        assert os.path.exists(tmp_path / "out" / name / folder / "0_0.png"), folder
    assert os.path.exists(tmp_path / "out" / name / "all" / "0.png")


def test_textinversion_cli_sd1(prompts_csv, tmp_path):
    from safetensors.numpy import save_file

    from sliders_conceptmod_tpu.cli import generate_images_textinversion as cli
    from sliders_conceptmod_tpu.models import factory

    _, te, _, _ = factory.load_models("tiny")
    dim = np.asarray(te.params["token_embedding"]["embedding"]).shape[1]
    emb_path = tmp_path / "learned_embeds.safetensors"
    save_file({"<sks>": np.full((dim,), 0.02, np.float32)}, str(emb_path))

    args = cli.build_parser().parse_args(
        _common(
            ["--model_name", "tiny", "--prompts_path", prompts_csv,
             "--token", "<sks>", "--embedding_path", str(emb_path),
             "--save_path", str(tmp_path / "ti")],
            [],
        )
    )
    cli.run(args)
    assert os.path.exists(tmp_path / "ti" / "tiny" / "0_0.png")


def test_textinversion_cli_xl(prompts_csv, tmp_path):
    from safetensors.numpy import save_file

    from sliders_conceptmod_tpu.cli import generate_images_textinversion_xl as cli
    from sliders_conceptmod_tpu.models import factory

    _, tes, _, _ = factory.load_models_xl("tiny-xl")
    dims = [np.asarray(t.params["token_embedding"]["embedding"]).shape[1] for t in tes]
    emb_path = tmp_path / "learned_embeds_xl.safetensors"
    save_file(
        {
            "clip_l": np.full((dims[0],), 0.02, np.float32),
            "clip_g": np.full((dims[1],), 0.02, np.float32),
        },
        str(emb_path),
    )

    args = cli.build_parser().parse_args(
        _common(
            ["--model_name", "tiny-xl", "--prompts_path", prompts_csv,
             "--token", "<sks>", "--embedding_path", str(emb_path),
             "--save_path", str(tmp_path / "tixl")],
            [],
        )
    )
    cli.run(args)
    assert os.path.exists(tmp_path / "tixl" / "tiny-xl" / "0_0.png")


def test_customdiffusion_cli_xl(prompts_csv, tmp_path):
    from sliders_conceptmod_tpu.cli import generate_images_customdiffusion as cli
    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models import factory

    _, tes, unet, _ = factory.load_models_xl("tiny-xl")
    sd = le._flax_to_torch_entries(unet.params)
    kv_keys = [k for k in sd if "attn2" in k and (".to_k." in k or ".to_v." in k)]
    assert kv_keys, "tiny-xl UNet must expose attn2 K/V weights"
    # one plain copy + one compressed u@v entry
    k_copy, k_add = kv_keys[0], kv_keys[1]
    w = np.asarray(sd[k_add], np.float32)
    u = np.ones((w.shape[0], 1), np.float32) * 0.01
    v = np.ones((1, w.shape[1]), np.float32)
    dims = [np.asarray(t.params["token_embedding"]["embedding"]).shape[1] for t in tes]
    delta = {
        "unet": {
            k_copy: torch.from_numpy(np.asarray(sd[k_copy], np.float32) + 0.05),
            k_add: {"u": torch.from_numpy(u), "v": torch.from_numpy(v)},
        },
        "modifier_token": {
            "<new1>": [
                torch.full((dims[0],), 0.02),
                torch.full((dims[1],), 0.02),
            ]
        },
    }
    model_path = tmp_path / "delta.bin"
    torch.save(delta, str(model_path))

    args = cli.build_parser().parse_args(
        _common(
            ["--model_name", str(model_path), "--prompts_path", prompts_csv,
             "--token", "<new1>", "--family", "xl", "--base", "tiny-xl",
             "--save_path", str(tmp_path / "cd")],
            [],
        )
    )
    cli.run(args)
    assert os.path.exists(tmp_path / "cd" / "delta.bin" / "0_0.png")


def test_customdiffusion_patch_math():
    """compressed u@v entries are ADDED, plain entries copied
    (reference load_model :503-507)."""
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.eval.baselines import patch_custom_diffusion_kv
    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models import factory

    _, _, unet, _ = factory.load_models("tiny")
    sd = le._flax_to_torch_entries(unet.params)
    kv_keys = [k for k in sd if "attn2" in k and ".to_k." in k]
    k0 = kv_keys[0]
    w = np.asarray(sd[k0], np.float32)
    u = np.full((w.shape[0], 1), 0.5, np.float32)
    v = np.full((1, w.shape[1]), 1.0, np.float32)
    patched = patch_custom_diffusion_kv(unet.params, {k0: {"u": u, "v": v}})

    # locate the leaf in the flax tree
    def get(tree, dotted):
        from sliders_conceptmod_tpu.io.torch_convert import torch_entry_to_flax

        path, _ = torch_entry_to_flax(dotted, w)
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    before = get(unet.params, k0)
    after = get(patched, k0)
    np.testing.assert_allclose(after, before + 0.5, atol=1e-5)
