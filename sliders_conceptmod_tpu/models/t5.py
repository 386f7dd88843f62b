"""T5 v1.1 text encoder (Flax, from scratch).

Functional-parity target: HF ``T5EncoderModel`` (google/t5-v1_1-xxl) as used
by the reference for Flux prompt encoding (``model_util.py:238-268`` via
FluxPipeline, 512-token context ``train_util.py:204``) and by notrigger's
``t5attn`` training method (``dora.py:242-244``, clip_index 2 → prefix
``lora_te2``, merged as ``lora_te3`` by combine_loras.py:35-37).

Architecture (v1.1): pre-RMSNorm blocks; self-attention WITHOUT the
1/sqrt(d) score scale (T5 convention); shared relative-position bias
(bucketed, bidirectional, 32 buckets / max distance 128) owned by block 0;
gated-GELU feed-forward (wi_0 ⊙ gelu, wi_1, wo); no biases anywhere.

Param paths mirror HF (``block_0/layer_0/SelfAttention/q`` …) so checkpoint
conversion is mechanical and LoRA keys come out as the reference's
``lora_te2_encoder_block_0_layer_0_SelfAttention_q`` schema.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4)


class T5LayerNorm(nn.Module):
    """RMSNorm, scale only (T5 style)."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * scale


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """HF T5 bidirectional bucketing."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5SelfAttention(nn.Module):
    config: T5Config
    has_relative_bias: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        B, S, _ = x.shape

        q = nn.Dense(inner, use_bias=False, name="q", dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, name="k", dtype=self.dtype)(x)
        v = nn.Dense(inner, use_bias=False, name="v", dtype=self.dtype)(x)
        split = lambda t: t.reshape(B, S, cfg.num_heads, cfg.d_kv)

        if self.has_relative_bias:
            bias_table = nn.Embed(
                cfg.relative_attention_num_buckets,
                cfg.num_heads,
                name="relative_attention_bias",
                dtype=jnp.float32,
            )
            pos = jnp.arange(S)
            rel = pos[None, :] - pos[:, None]  # memory - query
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            position_bias = jnp.transpose(bias_table(buckets), (2, 0, 1))[None]  # [1,H,S,S]

        # T5 omits the 1/sqrt(d) score scale
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)).astype(jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(B, S, inner)
        out = nn.Dense(cfg.d_model, use_bias=False, name="o", dtype=self.dtype)(out)
        return out, position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        cfg = self.config

        class Layer0(nn.Module):
            dtype: jnp.dtype

            @nn.compact
            def __call__(lself, h, pb, m):
                normed = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, name="layer_norm", dtype=lself.dtype)(h)
                out, pb = T5SelfAttention(
                    cfg, self.has_relative_bias, name="SelfAttention", dtype=lself.dtype
                )(normed, pb, m)
                return h + out, pb

        class Layer1(nn.Module):
            dtype: jnp.dtype

            @nn.compact
            def __call__(lself, h):
                normed = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, name="layer_norm", dtype=lself.dtype)(h)

                class DenseGatedActDense(nn.Module):
                    dtype: jnp.dtype

                    @nn.compact
                    def __call__(dself, z):
                        g = nn.Dense(cfg.d_ff, use_bias=False, name="wi_0", dtype=dself.dtype)(z)
                        g = jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(dself.dtype)
                        lin = nn.Dense(cfg.d_ff, use_bias=False, name="wi_1", dtype=dself.dtype)(z)
                        return nn.Dense(cfg.d_model, use_bias=False, name="wo", dtype=dself.dtype)(g * lin)

                return h + DenseGatedActDense(name="DenseReluDense", dtype=lself.dtype)(normed)

        x, position_bias = Layer0(name="layer_0", dtype=self.dtype)(x, position_bias, mask)
        x = Layer1(name="layer_1", dtype=self.dtype)(x)
        return x, position_bias


class T5EncoderModel(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared", dtype=self.dtype)(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_relative_bias=(i == 0), name=f"block_{i}", dtype=self.dtype
            )(x, position_bias, mask)
        return T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, name="final_layer_norm", dtype=self.dtype)(x)


def convert_t5_state_dict(sd) -> dict:
    """HF T5EncoderModel state dict → flax tree (Linear weights transpose;
    embeddings pass through; RMSNorm weight → scale)."""
    from sliders_conceptmod_tpu.io.torch_convert import _assign, _merge_numeric

    tree: dict = {}
    for key, value in sd.items():
        value = np.asarray(value)
        parts = key.split(".")
        if parts[0] == "encoder":
            parts = parts[1:]
        if parts == ["shared", "weight"] or parts == ["embed_tokens", "weight"]:
            _assign(tree, ("shared", "embedding"), value)
            continue
        path = _merge_numeric(parts[:-1])
        leaf = parts[-1]
        if path and path[-1] == "relative_attention_bias" and leaf == "weight":
            _assign(tree, tuple(path) + ("embedding",), value)
        elif path and path[-1] in ("layer_norm", "final_layer_norm") and leaf == "weight":
            _assign(tree, tuple(path) + ("scale",), value)
        elif leaf == "weight" and value.ndim == 2:
            _assign(tree, tuple(path) + ("kernel",), value.T)
        else:
            raise ValueError(f"Unexpected T5 key: {key}")
    return tree
