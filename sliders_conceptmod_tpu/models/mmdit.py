"""SD3 MMDiT transformer (Flax, from scratch).

Architecture-parity target: diffusers ``SD3Transformer2DModel`` as loaded by
the reference (``model_util.py:217-236`` via StableDiffusion3Pipeline; used
by ``train_lora_sd3.py`` and ``predict_noise_sd3`` train_util.py:350-382):
patchified 16-channel latents + joint (dual-stream) attention between image
tokens and text context, AdaLN-zero conditioning on timestep + pooled text.

Module names mirror diffusers paths (``transformer_blocks_0/attn/to_q``,
``norm1/linear``, ``ff/net_0/proj`` …) for mechanical checkpoint conversion
and LoRA key parity: the reference SD3 slider uses target ["Attention"] with
delimiter "-" (train_lora_sd3.py:104-111), and the ``add_``-child skip
(lora.py:227-228) restricts adapters to the image-stream q/k/v/out — the
site selector reproduces both.

TPU-first: attention runs through ops/attention.py (Pallas flash on TPU —
the joint sequence at 1024px is 4096+154 tokens); AdaLN modulation tensors
are fused elementwise ops XLA folds into the surrounding matmuls; the fixed
2D sin-cos position table is computed (not stored) exactly as diffusers
generates its ``pos_embed`` buffer.
"""

from __future__ import annotations

from dataclasses import dataclass
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.models.unet import TimestepEmbedding, timestep_embedding
from sliders_conceptmod_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def sd3_medium(cls) -> "MMDiTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "MMDiTConfig":
        return cls(
            sample_size=8,
            num_layers=2,
            attention_head_dim=8,
            num_attention_heads=4,
            joint_attention_dim=32,
            caption_projection_dim=32,
            pooled_projection_dim=32,
            pos_embed_max_size=16,
        )


def _sincos_2d_pos_embed(dim: int, grid_size: int) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed (base_size variant not needed for
    the cropped-buffer path): [grid*grid, dim]."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w first (diffusers convention)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(dim // 2, grid[0])
    emb_w = _1d(dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # [G*G, dim]


class PatchEmbedProj(nn.Module):
    """pos_embed.proj — patchifying conv (the sin-cos table is computed)."""

    dim: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch), name="proj", dtype=self.dtype)(x)


class TimestepTextEmbed(nn.Module):
    """time_text_embed: sinusoidal(256)→MLP + pooled-text MLP, summed.
    Child names match diffusers: timestep_embedder/text_embedder.linear_{1,2}."""

    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep, pooled):
        t_emb = timestep_embedding(timestep.astype(jnp.float32), 256).astype(self.dtype)
        t = TimestepEmbedding(self.inner_dim, name="timestep_embedder", dtype=self.dtype)(t_emb)
        p = TimestepEmbedding(self.inner_dim, name="text_embedder", dtype=self.dtype)(
            pooled.astype(self.dtype)
        )
        return t + p


class AdaLayerNormZero(nn.Module):
    """norm1: silu(temb)→linear(6·dim); returns modulated x + gates."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        emb = nn.Dense(6 * self.dim, name="linear", dtype=self.dtype)(jax.nn.silu(temb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(emb, 6, axis=-1)
        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(x)
        x_mod = norm.astype(self.dtype) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(nn.Module):
    """norm_out / final-block context norm: silu(temb)→linear(2·dim)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        emb = nn.Dense(2 * self.dim, name="linear", dtype=self.dtype)(jax.nn.silu(temb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(x)
        return norm.astype(self.dtype) * (1 + scale[:, None]) + shift[:, None]


class JointAttention(nn.Module):
    """Dual-stream attention over concat([image, context]) tokens."""

    inner_dim: int
    heads: int
    context_pre_only: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        d = self.inner_dim
        hd = d // self.heads
        B, S, _ = x.shape
        Sc = context.shape[1]

        q = nn.Dense(d, name="to_q", dtype=self.dtype)(x)
        k = nn.Dense(d, name="to_k", dtype=self.dtype)(x)
        v = nn.Dense(d, name="to_v", dtype=self.dtype)(x)
        cq = nn.Dense(d, name="add_q_proj", dtype=self.dtype)(context)
        ck = nn.Dense(d, name="add_k_proj", dtype=self.dtype)(context)
        cv = nn.Dense(d, name="add_v_proj", dtype=self.dtype)(context)

        qq = jnp.concatenate([q, cq], axis=1).reshape(B, S + Sc, self.heads, hd)
        kk = jnp.concatenate([k, ck], axis=1).reshape(B, S + Sc, self.heads, hd)
        vv = jnp.concatenate([v, cv], axis=1).reshape(B, S + Sc, self.heads, hd)
        out = dot_product_attention(qq, kk, vv).reshape(B, S + Sc, d)

        x_out, ctx_out = out[:, :S], out[:, S:]
        x_out = nn.Dense(d, name="to_out_0", dtype=self.dtype)(x_out)
        if self.context_pre_only:
            return x_out, None
        ctx_out = nn.Dense(d, name="to_add_out", dtype=self.dtype)(ctx_out)
        return x_out, ctx_out


class GELUProj(nn.Module):
    """diffusers FeedForward net.0 = GELU(approximate='tanh') with .proj."""

    inner: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner, name="proj", dtype=self.dtype)(x)
        return jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(self.dtype)


class MMDiTFeedForward(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GELUProj(4 * self.dim, name="net_0", dtype=self.dtype)(x)
        return nn.Dense(self.dim, name="net_2", dtype=self.dtype)(h)


class JointTransformerBlock(nn.Module):
    config: MMDiTConfig
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, temb):
        cfg = self.config
        d = cfg.inner_dim

        x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
            d, name="norm1", dtype=self.dtype
        )(x, temb)
        if self.context_pre_only:
            ctx_mod = AdaLayerNormContinuous(d, name="norm1_context", dtype=self.dtype)(context, temb)
            c_gates = None
        else:
            ctx_mod, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
                d, name="norm1_context", dtype=self.dtype
            )(context, temb)

        attn_out, ctx_attn_out = JointAttention(
            d, cfg.num_attention_heads, self.context_pre_only, name="attn", dtype=self.dtype
        )(x_mod, ctx_mod)

        x = x + gate_msa[:, None] * attn_out
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(x)
        h = norm2.astype(self.dtype) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * MMDiTFeedForward(d, name="ff", dtype=self.dtype)(h)

        if self.context_pre_only:
            return x, None
        context = context + c_gate_msa[:, None] * ctx_attn_out
        cnorm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32)(context)
        ch = cnorm2.astype(self.dtype) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        context = context + c_gate_mlp[:, None] * MMDiTFeedForward(d, name="ff_context", dtype=self.dtype)(ch)
        return x, context


class SD3Transformer2DModel(nn.Module):
    config: MMDiTConfig
    dtype: jnp.dtype = jnp.float32
    # per-BLOCK rematerialization for the train student's grad pass: caps
    # fwd+bwd peak HBM at block-input granularity at the same recompute count
    # (see models/flux.py for the full rationale — whole-model jax.checkpoint
    # does not lower the fwd+bwd peak). Identical param tree and forward.
    remat_blocks: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, 16, H, W] latents (NCHW boundary)
        timestep: jnp.ndarray,  # [B] raw train timesteps (0..1000)
        encoder_hidden_states: jnp.ndarray,  # [B, Sc, joint_attention_dim]
        pooled_projections: jnp.ndarray,  # [B, pooled_projection_dim]
    ) -> jnp.ndarray:
        cfg = self.config
        d = cfg.inner_dim
        p = cfg.patch_size
        B, C, H, W = hidden_states.shape
        gh, gw = H // p, W // p

        # --- patch embed with center-cropped fixed sin-cos table ----------
        x = jnp.transpose(hidden_states, (0, 2, 3, 1)).astype(self.dtype)
        x = PatchEmbedProj(d, p, name="pos_embed", dtype=self.dtype)(x)
        x = x.reshape(B, gh * gw, d)

        table = _sincos_2d_pos_embed(d, cfg.pos_embed_max_size).reshape(
            cfg.pos_embed_max_size, cfg.pos_embed_max_size, d
        )
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos = table[top : top + gh, left : left + gw].reshape(1, gh * gw, d)
        x = x + jnp.asarray(pos, self.dtype)

        temb = TimestepTextEmbed(d, name="time_text_embed", dtype=self.dtype)(
            jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (B,)),
            pooled_projections,
        )
        context = nn.Dense(d, name="context_embedder", dtype=self.dtype)(
            encoder_hidden_states.astype(self.dtype)
        )

        Block = nn.remat(JointTransformerBlock) if self.remat_blocks else JointTransformerBlock
        for i in range(cfg.num_layers):
            x, context = Block(
                cfg,
                context_pre_only=(i == cfg.num_layers - 1),
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
            )(x, context, temb)

        x = AdaLayerNormContinuous(d, name="norm_out", dtype=self.dtype)(x, temb)
        x = nn.Dense(p * p * cfg.out_channels, name="proj_out", dtype=self.dtype)(x)

        # unpatchify -> NCHW
        x = x.reshape(B, gh, gw, p, p, cfg.out_channels)
        x = jnp.einsum("bhwpqc->bchpwq", x).reshape(B, cfg.out_channels, H, W)
        return x
