"""Flux transformer (Flax, from scratch) — dual + single stream DiT w/ RoPE.

Architecture-parity target: diffusers ``FluxTransformer2DModel`` (schnell)
as loaded by the reference (``model_util.py:238-268``; trainer
``train_lora_flux.py``): packed 2×2 latents as 64-dim tokens, 19
dual-stream blocks (text+image with qk-RMSNorm and 3-axis RoPE), 38
single-stream blocks (parallel attention+MLP), AdaLN-zero conditioning on
timestep (+ optional guidance embed — off for schnell) + CLIP pooled text.

Module paths mirror diffusers (``transformer_blocks_0/attn/to_q``,
``single_transformer_blocks_0/attn/to_q``, ``proj_mlp``/``proj_out`` …) so
checkpoint conversion is mechanical and LoRA keys match the reference's
'-'-delimited Attention-target selection (train_lora_flux.py:140-148; the
``add_``-skip keeps adapters off the context projections).

Sequence order parity: Flux concatenates [text, image] (text FIRST — the
opposite of SD3); RoPE ids are cat(txt_ids, img_ids) with axes dims
(16, 56, 56) over (batch-constant, row, col).

TPU notes: attention runs via ops/attention (flash on TPU; 4096+512 tokens
at 1024px), timestep arrives in [0,1] and is scaled ×1000 inside (diffusers
semantics — the caller passes t/1000, train_util.py:427).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.models.mmdit import AdaLayerNormContinuous, AdaLayerNormZero
from sliders_conceptmod_tpu.models.unet import TimestepEmbedding, timestep_embedding
from sliders_conceptmod_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5 context
    pooled_projection_dim: int = 768  # CLIP pooled
    guidance_embeds: bool = False  # schnell
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def schnell(cls) -> "FluxConfig":
        return cls()

    @classmethod
    def dev(cls) -> "FluxConfig":
        return cls(guidance_embeds=True)

    @classmethod
    def tiny(cls) -> "FluxConfig":
        return cls(
            in_channels=16,
            num_layers=2,
            num_single_layers=2,
            attention_head_dim=8,
            num_attention_heads=4,
            joint_attention_dim=32,
            pooled_projection_dim=32,
            axes_dims_rope=(2, 4, 2),  # each axis dim must be even (rotary pairs)
        )


def rope_freqs(ids: jnp.ndarray, axes_dims: Tuple[int, ...], theta: float = 10000.0):
    """ids [B, S, n_axes] → (cos, sin) each [B, S, head_dim] (interleaved
    real format, diffusers FluxPosEmbed semantics)."""
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
        angles = ids[..., i, None].astype(jnp.float32) * freqs  # [B, S, d/2]
        cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, D]; cos/sin [B, S, D] → rotated (interleaved pairs)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos[:, :, None, :] + rotated * sin[:, :, None, :]


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * scale


class FluxTimeTextEmbed(nn.Module):
    inner_dim: int
    guidance_embeds: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep, pooled, guidance=None):
        # diffusers: timestep (and guidance) scaled x1000 before sinusoids
        t_emb = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, 256, flip_sin_to_cos=True).astype(self.dtype)
        emb = TimestepEmbedding(self.inner_dim, name="timestep_embedder", dtype=self.dtype)(t_emb)
        if self.guidance_embeds:
            # scalar guidance (e.g. the dev-variant default 3.5 injected by
            # the factory bundle) broadcasts to the batch
            g = jnp.broadcast_to(jnp.asarray(guidance, jnp.float32), timestep.shape)
            g_emb = timestep_embedding(g * 1000.0, 256, flip_sin_to_cos=True).astype(self.dtype)
            emb = emb + TimestepEmbedding(self.inner_dim, name="guidance_embedder", dtype=self.dtype)(g_emb)
        emb = emb + TimestepEmbedding(self.inner_dim, name="text_embedder", dtype=self.dtype)(
            pooled.astype(self.dtype)
        )
        return emb


class FluxJointAttention(nn.Module):
    """Dual-stream attention, [text, image] order, qk-RMSNorm + RoPE."""

    inner_dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, cos, sin):
        d, h = self.inner_dim, self.heads
        hd = d // h
        B, S, _ = x.shape
        Sc = context.shape[1]

        def heads_of(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd)

        q = heads_of(nn.Dense(d, name="to_q", dtype=self.dtype)(x))
        k = heads_of(nn.Dense(d, name="to_k", dtype=self.dtype)(x))
        v = heads_of(nn.Dense(d, name="to_v", dtype=self.dtype)(x))
        q = RMSNorm(hd, name="norm_q", dtype=self.dtype)(q)
        k = RMSNorm(hd, name="norm_k", dtype=self.dtype)(k)

        cq = heads_of(nn.Dense(d, name="add_q_proj", dtype=self.dtype)(context))
        ck = heads_of(nn.Dense(d, name="add_k_proj", dtype=self.dtype)(context))
        cv = heads_of(nn.Dense(d, name="add_v_proj", dtype=self.dtype)(context))
        cq = RMSNorm(hd, name="norm_added_q", dtype=self.dtype)(cq)
        ck = RMSNorm(hd, name="norm_added_k", dtype=self.dtype)(ck)

        # text first (Flux order), then image
        qq = jnp.concatenate([cq, q], axis=1)
        kk = jnp.concatenate([ck, k], axis=1)
        vv = jnp.concatenate([cv, v], axis=1)
        qq = apply_rope(qq, cos, sin)
        kk = apply_rope(kk, cos, sin)

        out = dot_product_attention(qq, kk, vv).reshape(B, S + Sc, d)
        ctx_out, x_out = out[:, :Sc], out[:, Sc:]
        x_out = nn.Dense(d, name="to_out_0", dtype=self.dtype)(x_out)
        ctx_out = nn.Dense(d, name="to_add_out", dtype=self.dtype)(ctx_out)
        return x_out, ctx_out


class FluxTransformerBlock(nn.Module):
    config: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, temb, cos, sin):
        cfg = self.config
        d = cfg.inner_dim

        x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(d, name="norm1", dtype=self.dtype)(x, temb)
        ctx_mod, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
            d, name="norm1_context", dtype=self.dtype
        )(context, temb)

        attn_out, ctx_attn_out = FluxJointAttention(
            d, cfg.num_attention_heads, name="attn", dtype=self.dtype
        )(x_mod, ctx_mod, cos, sin)

        x = x + gate_msa[:, None] * attn_out
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(x)
        h = h.astype(self.dtype) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        ff = nn.Dense(4 * d, name="ff_net_0_proj", dtype=self.dtype)(h)
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=True).astype(self.dtype)
        ff = nn.Dense(d, name="ff_net_2", dtype=self.dtype)(ff)
        x = x + gate_mlp[:, None] * ff

        context = context + c_gate_msa[:, None] * ctx_attn_out
        ch = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(context)
        ch = ch.astype(self.dtype) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        cff = nn.Dense(4 * d, name="ff_context_net_0_proj", dtype=self.dtype)(ch)
        cff = jax.nn.gelu(cff.astype(jnp.float32), approximate=True).astype(self.dtype)
        cff = nn.Dense(d, name="ff_context_net_2", dtype=self.dtype)(cff)
        context = context + c_gate_mlp[:, None] * cff
        return x, context


class FluxSingleTransformerBlock(nn.Module):
    """Single stream: parallel attention + MLP over concat [text, image]."""

    config: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, cos, sin):
        cfg = self.config
        d = cfg.inner_dim
        h = cfg.num_attention_heads
        hd = d // h
        B, S, _ = x.shape

        # AdaLayerNormZeroSingle: 3 chunks
        emb = nn.Dense(3 * d, name="norm_linear", dtype=self.dtype)(jax.nn.silu(temb))
        shift, scale, gate = jnp.split(emb, 3, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(x)
        normed = normed.astype(self.dtype) * (1 + scale[:, None]) + shift[:, None]

        mlp = nn.Dense(4 * d, name="proj_mlp", dtype=self.dtype)(normed)
        mlp = jax.nn.gelu(mlp.astype(jnp.float32), approximate=True).astype(self.dtype)

        def heads_of(t):
            return t.reshape(B, S, h, hd)

        q = RMSNorm(hd, name="attn_norm_q", dtype=self.dtype)(
            heads_of(nn.Dense(d, name="attn_to_q", dtype=self.dtype)(normed))
        )
        k = RMSNorm(hd, name="attn_norm_k", dtype=self.dtype)(
            heads_of(nn.Dense(d, name="attn_to_k", dtype=self.dtype)(normed))
        )
        v = heads_of(nn.Dense(d, name="attn_to_v", dtype=self.dtype)(normed))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v).reshape(B, S, d)

        out = nn.Dense(d, name="proj_out", dtype=self.dtype)(jnp.concatenate([attn, mlp], axis=-1))
        return x + gate[:, None] * out


def prepare_latent_image_ids(gh: int, gw: int) -> np.ndarray:
    """[gh*gw, 3]: (0, row, col) — diffusers FluxPipeline._prepare_latent_image_ids."""
    ids = np.zeros((gh, gw, 3), np.float32)
    ids[..., 1] = np.arange(gh)[:, None]
    ids[..., 2] = np.arange(gw)[None, :]
    return ids.reshape(gh * gw, 3)


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] → [B, (H/2)(W/2), 4C] (2×2 patch packing)."""
    B, C, H, W = latents.shape
    x = latents.reshape(B, C, H // 2, 2, W // 2, 2)
    x = jnp.einsum("bchpwq->bhwcpq", x).reshape(B, (H // 2) * (W // 2), C * 4)
    return x


def unpack_latents(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    B, S, D = x.shape
    C = D // 4
    x = x.reshape(B, H // 2, W // 2, C, 2, 2)
    x = jnp.einsum("bhwcpq->bchpwq", x).reshape(B, C, H, W)
    return x


class FluxTransformer2DModel(nn.Module):
    config: FluxConfig
    dtype: jnp.dtype = jnp.float32
    # per-BLOCK rematerialization: the backward keeps only each block's
    # inputs and recomputes its internals, capping fwd+bwd peak HBM at
    # ~(num_blocks × block-input) + one block's temps. A whole-model
    # jax.checkpoint does NOT do this (its backward re-runs the full forward
    # and holds every residual again); at full schnell depth that 4.75 GB
    # temp peak is what pushed the int8-base TRAIN step 132 MB past v5e HBM.
    # Same recompute count as whole-model remat, so FLOPs are unchanged.
    # Param tree is identical either way (nn.remat preserves names).
    remat_blocks: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, S_img, in_channels] packed tokens
        timestep: jnp.ndarray,  # [B] in [0, 1] (t/1000, diffusers semantics)
        encoder_hidden_states: jnp.ndarray,  # [B, S_txt, joint_attention_dim]
        pooled_projections: jnp.ndarray,  # [B, pooled_projection_dim]
        txt_ids: jnp.ndarray,  # [S_txt, 3] (or [B, S_txt, 3])
        img_ids: jnp.ndarray,  # [S_img, 3]
        guidance: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        d = cfg.inner_dim
        B = hidden_states.shape[0]

        x = nn.Dense(d, name="x_embedder", dtype=self.dtype)(hidden_states.astype(self.dtype))
        context = nn.Dense(d, name="context_embedder", dtype=self.dtype)(
            encoder_hidden_states.astype(self.dtype)
        )
        temb = FluxTimeTextEmbed(d, cfg.guidance_embeds, name="time_text_embed", dtype=self.dtype)(
            jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (B,)),
            pooled_projections,
            guidance,
        )

        if txt_ids.ndim == 2:
            txt_ids = txt_ids[None]
        if img_ids.ndim == 2:
            img_ids = img_ids[None]
        ids = jnp.concatenate(
            [jnp.broadcast_to(txt_ids, (B,) + txt_ids.shape[1:]), jnp.broadcast_to(img_ids, (B,) + img_ids.shape[1:])],
            axis=1,
        )
        cos, sin = rope_freqs(ids, cfg.axes_dims_rope)

        DualBlock = nn.remat(FluxTransformerBlock) if self.remat_blocks else FluxTransformerBlock
        SingleBlock = (
            nn.remat(FluxSingleTransformerBlock) if self.remat_blocks else FluxSingleTransformerBlock
        )
        for i in range(cfg.num_layers):
            x, context = DualBlock(cfg, name=f"transformer_blocks_{i}", dtype=self.dtype)(
                x, context, temb, cos, sin
            )

        combined = jnp.concatenate([context, x], axis=1)  # text first
        for i in range(cfg.num_single_layers):
            combined = SingleBlock(
                cfg, name=f"single_transformer_blocks_{i}", dtype=self.dtype
            )(combined, temb, cos, sin)
        x = combined[:, context.shape[1] :]

        x = AdaLayerNormContinuous(d, name="norm_out", dtype=self.dtype)(x, temb)
        return nn.Dense(cfg.in_channels, name="proj_out", dtype=self.dtype)(x)


# flattened flax module names <- diffusers FluxTransformer2DModel key pieces.
# The single-stream block and the ff stacks use flat Dense names here (one
# module, not a submodule tree), so the generic numeric-merge conversion in
# io/torch_convert.py is not enough.
_FLUX_KEY_RENAMES = (
    ("ff.net.0.proj", "ff_net_0_proj"),
    ("ff.net.2", "ff_net_2"),
    ("ff_context.net.0.proj", "ff_context_net_0_proj"),
    ("ff_context.net.2", "ff_context_net_2"),
)
_FLUX_SINGLE_RENAMES = (
    ("attn.to_q", "attn_to_q"),
    ("attn.to_k", "attn_to_k"),
    ("attn.to_v", "attn_to_v"),
    ("attn.norm_q", "attn_norm_q"),
    ("attn.norm_k", "attn_norm_k"),
    ("norm.linear", "norm_linear"),
)


def convert_flux_state_dict(sd):
    """diffusers FluxTransformer2DModel state dict → this module's flax tree
    (reference loads via FluxPipeline.from_pretrained, model_util.py:238-268)."""
    from sliders_conceptmod_tpu.io import torch_convert as tc

    tree = {}
    for key, value in sd.items():
        renames = _FLUX_KEY_RENAMES
        if key.startswith("single_transformer_blocks."):
            renames = _FLUX_KEY_RENAMES + _FLUX_SINGLE_RENAMES
        for old, new in renames:
            key = key.replace(old, new)
        entry = tc.torch_entry_to_flax(key, np.asarray(value))
        if entry:
            tc._assign(tree, entry[0], entry[1])
    return tree
