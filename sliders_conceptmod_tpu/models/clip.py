"""CLIP text encoder (Flax, from scratch).

Functional-parity target: HF ``CLIPTextModel`` / ``CLIPTextModelWithProjection``
as used by the reference for SD1/2 (``model_util.py:37-109``) and SDXL's dual
encoders (``model_util.py:164-208``): causal transformer over 77 BPE tokens,
penultimate-hidden-state conditioning (``train_util.py:140-155``), pooled
output at the EOS position, optional projection head (te2).

Param-tree naming mirrors the HF module paths so diffusers/transformers
checkpoints convert mechanically (see io/torch_convert.py).

TPU notes: attention over 77 tokens is tiny — it runs as one fused XLA
attention (no Pallas needed here); the win is batching all 5 prompt
encodings into a single call at train start.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # "gelu" for OpenCLIP bigG (SDXL te2)
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for CLIPTextModelWithProjection

    @classmethod
    def sd15_te(cls):
        """openai/clip-vit-large-patch14 text tower (SD1.x)."""
        return cls()

    @classmethod
    def sd2_te(cls):
        """OpenCLIP ViT-H text tower (SD2.x): 1024 wide, 23 used layers of 24, gelu."""
        return cls(
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=23,
            num_attention_heads=16,
            hidden_act="gelu",
        )

    @classmethod
    def sdxl_te1(cls):
        """SDXL text_encoder (CLIP ViT-L, projection head unused for embeds)."""
        return cls()

    @classmethod
    def sdxl_te2(cls):
        """SDXL text_encoder_2 (OpenCLIP ViT-bigG with 1280-dim projection)."""
        return cls(
            hidden_size=1280,
            intermediate_size=5120,
            num_hidden_layers=32,
            num_attention_heads=20,
            hidden_act="gelu",
            projection_dim=1280,
        )

    @classmethod
    def tiny(cls, projection_dim=None, hidden_size=32):
        """Tiny config for CPU tests."""
        return cls(
            vocab_size=49408,  # full vocab so real tokenizers also work
            hidden_size=hidden_size,
            intermediate_size=hidden_size * 2,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=77,
            projection_dim=projection_dim,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"Unknown activation: {name}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        hd = d // h

        def proj(name):
            return nn.Dense(d, name=name, dtype=x.dtype)

        q = proj("q_proj")(x)
        k = proj("k_proj")(x)
        v = proj("v_proj")(x)

        B, S, _ = x.shape
        split = lambda t: t.reshape(B, S, h, hd)
        # scale folded into q, softmax in fp32 for stability
        attn = jnp.einsum("bqhd,bkhd->bhqk", split(q) * (hd**-0.5), split(k)).astype(jnp.float32)
        attn = jnp.where(causal_mask, attn, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v)).reshape(B, S, d)
        return proj("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name, dtype=x.dtype)
        residual = x
        x = ln("layer_norm1")(x)
        x = CLIPAttention(cfg, name="self_attn")(x, causal_mask)
        x = residual + x
        residual = x
        x = ln("layer_norm2")(x)
        x = nn.Dense(cfg.intermediate_size, name="mlp_fc1", dtype=x.dtype)(x)
        x = _act(cfg.hidden_act)(x)
        x = nn.Dense(cfg.hidden_size, name="mlp_fc2", dtype=x.dtype)(x)
        return residual + x


@dataclass
class CLIPTextOutput:
    """hidden_states[i] is the input to layer i; [-1] is the final pre-LN
    hidden state; ``last_hidden_state`` has the final LayerNorm applied —
    matching HF semantics (output_hidden_states=True)."""

    last_hidden_state: jnp.ndarray
    pooled_output: jnp.ndarray
    hidden_states: Tuple[jnp.ndarray, ...]
    projected: Optional[jnp.ndarray] = None


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> CLIPTextOutput:
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding", dtype=self.dtype)
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embedding", dtype=self.dtype
        )
        x = tok(input_ids) + pos(jnp.arange(S)[None, :])

        causal = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]

        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x, causal)
            hidden_states.append(x)

        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm", dtype=self.dtype)(x)

        # pooled = final-LN hidden state at the EOS position. HF quirk
        # (CLIPTextModel.forward): configs with eos_token_id == 2 (all the
        # shipped OpenAI/SD configs) take argmax over raw token ids — the
        # "legacy" path; since the real vocab's eos (49407) is the max id and
        # also the pad token, argmax-first-occurrence lands on the same
        # position as first-eos. Other configs match on the eos id directly.
        if cfg.eos_token_id == 2:
            eos_pos = jnp.argmax(input_ids, axis=1)
        else:
            eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]

        projected = None
        if cfg.projection_dim is not None:
            projected = nn.Dense(
                cfg.projection_dim, use_bias=False, name="text_projection", dtype=self.dtype
            )(pooled)

        return CLIPTextOutput(
            last_hidden_state=last,
            pooled_output=pooled,
            hidden_states=tuple(hidden_states),
            projected=projected,
        )


def penultimate_hidden_state(out: CLIPTextOutput) -> jnp.ndarray:
    """SDXL conditioning uses hidden_states[-2] (reference train_util.py:149)."""
    return out.hidden_states[-2]


def clip_skip_hidden_state(out: CLIPTextOutput, clip_skip: Optional[int]) -> jnp.ndarray:
    """SD1/2 clip_skip semantics (reference model_util.py:91-109): clip_skip=n
    takes hidden_states[-n]; None/1 -> final LN output."""
    if clip_skip is None or clip_skip <= 1:
        return out.last_hidden_state
    return out.hidden_states[-clip_skip]
