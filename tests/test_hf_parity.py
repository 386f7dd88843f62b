"""Cross-implementation parity vs HuggingFace transformers (random weights).

These are the strongest correctness tests available in this zero-egress
environment: instantiate a tiny RANDOM HF model (torch), convert its state
dict through io/torch_convert, run both implementations on identical inputs,
and require near-identical outputs. This validates the architecture AND the
converter together. (diffusers is not installed, so the UNet/VAE get this
treatment when a checkpoint or diffusers env is available — see
eval/parity.py.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp


def test_clip_text_encoder_matches_transformers():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    from sliders_conceptmod_tpu.io.torch_convert import convert_clip_text_state_dict, tree_to_jax
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

    hf_cfg = HFConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=16,
        eos_token_id=3,
        bos_token_id=1,
        pad_token_id=0,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = tree_to_jax(convert_clip_text_state_dict(sd))

    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        eos_token_id=3,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    model = CLIPTextEncoder(cfg)

    ids = np.array([[1, 5, 9, 7, 3, 0, 0, 0], [1, 42, 3, 0, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids), output_hidden_states=True)
    out = model.apply({"params": params}, jnp.asarray(ids))

    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), hf_out.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.hidden_states[-2]), hf_out.hidden_states[-2].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.projected), hf_out.text_embeds.numpy(), atol=2e-5
    )


def test_t5_encoder_matches_transformers():
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel as HFT5

    from sliders_conceptmod_tpu.io.torch_convert import tree_to_jax
    from sliders_conceptmod_tpu.models.t5 import T5Config, T5EncoderModel, convert_t5_state_dict

    hf_cfg = HFT5Config(
        vocab_size=64,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu",  # v1.1
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = HFT5(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = tree_to_jax(convert_t5_state_dict(sd))

    cfg = T5Config(
        vocab_size=64,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
    )
    model = T5EncoderModel(cfg)
    ids = np.array([[3, 7, 11, 1, 0, 0], [9, 1, 0, 0, 0, 0]], np.int64)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state
    out = model.apply({"params": params}, jnp.asarray(ids), mask=jnp.asarray(mask, bool))
    np.testing.assert_allclose(np.asarray(out), hf_out.numpy(), atol=3e-5)


def test_clip_vision_scorer_matches_transformers():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig
    from sliders_conceptmod_tpu.models.clip_vision import (
        CLIPScorer,
        CLIPVisionConfig,
        convert_clip_model_state_dict,
    )
    from sliders_conceptmod_tpu.io.torch_convert import tree_to_jax

    hf_cfg = HFCLIPConfig(
        text_config={
            "vocab_size": 99,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "max_position_embeddings": 16,
            "eos_token_id": 3,
            "bos_token_id": 1,
            "pad_token_id": 0,
            "hidden_act": "quick_gelu",
        },
        vision_config={
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 32,
            "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
        projection_dim=16,
    )
    torch.manual_seed(0)
    hf = HFCLIPModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = tree_to_jax(convert_clip_model_state_dict(sd))

    model = CLIPScorer(
        CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
            image_size=32, patch_size=16, projection_dim=16,
        ),
        CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=16, eos_token_id=3,
            projection_dim=16, hidden_act="quick_gelu",
        ),
    )

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ids = np.array([[1, 5, 9, 3, 0, 0], [1, 42, 3, 0, 0, 0]], np.int64)
    with torch.no_grad():
        hf_logits = hf(pixel_values=torch.tensor(px), input_ids=torch.tensor(ids)).logits_per_image
    logits = model.apply({"params": params}, jnp.asarray(px), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), hf_logits.numpy(), atol=1e-4, rtol=1e-4)
