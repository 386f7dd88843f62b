"""CLIP vision tower + image-text scorer (Flax, from scratch).

Backs eval/clip_score.py — the reference scores generated images with HF
``CLIPModel`` ViT-B/32 ``logits_per_image`` (``eval-scripts/clip_score.py:24-25,59-62``).
This is the TPU-native equivalent: ViT vision encoder + the text tower from
models/clip.py + projections + logit_scale, weights converted from a local
``openai/clip-vit-base-patch32``-layout directory (io/torch_convert).

ViT details (HF CLIPVisionModel): non-overlapping conv patch embed, class
token, learned positions, pre-LN transformer (same encoder layer as the text
tower, no causal mask), post-LN on the class token, linear projection.
"""

from __future__ import annotations

from dataclasses import dataclass
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

# HF CLIPProcessor normalization constants
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512

    @classmethod
    def vit_b32(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
            projection_dim=16,
        )


class ViTEncoderLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        hd = d // h
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name, dtype=x.dtype)

        residual = x
        y = ln("layer_norm1")(x)
        B, S, _ = y.shape
        q = nn.Dense(d, name="q_proj")(y).reshape(B, S, h, hd)
        k = nn.Dense(d, name="k_proj")(y).reshape(B, S, h, hd)
        v = nn.Dense(d, name="v_proj")(y).reshape(B, S, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(y.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, d)
        y = nn.Dense(d, name="out_proj")(y)
        x = residual + y

        residual = x
        y = ln("layer_norm2")(x)
        y = nn.Dense(cfg.intermediate_size, name="mlp_fc1")(y)
        y = y * jax.nn.sigmoid(1.702 * y)  # quick_gelu
        y = nn.Dense(d, name="mlp_fc2")(y)
        return residual + y


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: [B, 3, H, W] normalized — returns pooled [B, D]."""
        cfg = self.config
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            name="patch_embedding",
        )(x)
        B, gh, gw, D = patches.shape
        patches = patches.reshape(B, gh * gw, D)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (D,))
        cls_tok = jnp.broadcast_to(cls, (B, 1, D))
        h = jnp.concatenate([cls_tok, patches], axis=1)

        n_pos = gh * gw + 1
        pos = nn.Embed(n_pos, D, name="position_embedding")(jnp.arange(n_pos)[None])
        h = h + pos

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layrnorm")(h)
        for i in range(cfg.num_hidden_layers):
            h = ViTEncoderLayer(cfg, name=f"layers_{i}")(h)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm")(h[:, 0])
        return pooled


class CLIPScorer(nn.Module):
    """Full CLIP: image/text towers + projections + logit_scale."""

    vision_config: CLIPVisionConfig
    text_config: CLIPTextConfig

    def setup(self):
        self.vision_model = CLIPVisionEncoder(self.vision_config)
        self.text_model = CLIPTextEncoder(self.text_config)
        self.visual_projection = nn.Dense(self.vision_config.projection_dim, use_bias=False)
        self.logit_scale = self.param("logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ())

    def __call__(self, pixel_values: jnp.ndarray, input_ids: jnp.ndarray) -> jnp.ndarray:
        """logits_per_image [B_img, B_text] — HF CLIPModel semantics."""
        img = self.visual_projection(self.vision_model(pixel_values))
        txt_out = self.text_model(input_ids)
        txt = txt_out.projected  # text tower must carry projection_dim
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return jnp.exp(self.logit_scale) * img @ txt.T


def preprocess_images(images: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8 HWC images -> normalized [B,3,H,W] (CLIPProcessor semantics:
    resize shortest side, center crop, rescale, normalize)."""
    from PIL import Image

    out = []
    for arr in images:
        im = Image.fromarray(arr)
        w, h = im.size
        short = min(w, h)
        im = im.resize((int(round(w * image_size / short)), int(round(h * image_size / short))), Image.BICUBIC)
        w, h = im.size
        left, top = (w - image_size) // 2, (h - image_size) // 2
        im = im.crop((left, top, left + image_size, top + image_size))
        a = np.asarray(im, np.float32) / 255.0
        a = (a - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        out.append(a.transpose(2, 0, 1))
    return np.stack(out)


def convert_clip_model_state_dict(sd) -> dict:
    """transformers CLIPModel state dict -> CLIPScorer param tree."""
    from sliders_conceptmod_tpu.io.torch_convert import (
        _assign,
        convert_clip_text_state_dict,
        torch_entry_to_flax,
    )

    tree: dict = {}
    # text tower (+ projection) via the existing converter
    text_tree = convert_clip_text_state_dict(
        {k: v for k, v in sd.items() if k.startswith("text_model.") or k == "text_projection.weight"}
    )
    tree["text_model"] = {k: v for k, v in text_tree.items() if k != "text_projection"}
    if "text_projection" in text_tree:
        tree["text_model"]["text_projection"] = text_tree["text_projection"]

    for key, value in sd.items():
        value = np.asarray(value)
        if key == "visual_projection.weight":
            _assign(tree, ("visual_projection", "kernel"), value.T)
        elif key == "logit_scale":
            tree["logit_scale"] = value
        elif key == "vision_model.embeddings.class_embedding":
            _assign(tree, ("vision_model", "class_embedding"), value)
        elif key == "vision_model.embeddings.patch_embedding.weight":
            _assign(tree, ("vision_model", "patch_embedding", "kernel"), value.transpose(2, 3, 1, 0))
        elif key == "vision_model.embeddings.position_embedding.weight":
            _assign(tree, ("vision_model", "position_embedding", "embedding"), value)
        elif key.startswith("vision_model.encoder.") or key.startswith("vision_model.pre_layrnorm") or key.startswith("vision_model.post_layernorm"):
            k = key[len("vision_model."):]
            for prefix in ("encoder.",):
                if k.startswith(prefix):
                    k = k[len(prefix):]
            k = k.replace("self_attn.", "").replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
            entry = torch_entry_to_flax(k, value)
            if entry is not None:
                path, arr = entry
                _assign(tree, ("vision_model",) + path, arr)
    return tree


def load_clip_scorer(model_dir: str):
    """Build scorer + params from a local transformers CLIPModel directory
    (config.json + model.safetensors + tokenizer files)."""
    import json
    import os

    from safetensors.numpy import load_file

    from sliders_conceptmod_tpu.models.tokenizer import load_tokenizer

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    v, t = cfg["vision_config"], cfg["text_config"]
    vision_cfg = CLIPVisionConfig(
        hidden_size=v.get("hidden_size", 768),
        intermediate_size=v.get("intermediate_size", 3072),
        num_hidden_layers=v.get("num_hidden_layers", 12),
        num_attention_heads=v.get("num_attention_heads", 12),
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 32),
        projection_dim=cfg.get("projection_dim", 512),
    )
    text_cfg = CLIPTextConfig(
        vocab_size=t.get("vocab_size", 49408),
        hidden_size=t.get("hidden_size", 512),
        intermediate_size=t.get("intermediate_size", 2048),
        num_hidden_layers=t.get("num_hidden_layers", 12),
        num_attention_heads=t.get("num_attention_heads", 8),
        projection_dim=cfg.get("projection_dim", 512),
    )
    sd = load_file(os.path.join(model_dir, "model.safetensors"))
    params = convert_clip_model_state_dict(sd)
    model = CLIPScorer(vision_cfg, text_cfg)
    tokenizer = load_tokenizer(model_dir, component="", max_length=77)
    return model, params, tokenizer
