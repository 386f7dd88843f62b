"""UNet2DCondition (Flax, from scratch) — SD1.x / SD2.x / SDXL families.

Architecture-parity target: diffusers ``UNet2DConditionModel`` as loaded by
the reference (``model_util.py:112-137`` SD1/2, ``:358-385`` SDXL), including
the SDXL "text_time" addition embedding consumed via
``added_cond_kwargs={text_embeds, time_ids}`` (reference train_util.py:465-476).

Module *names* mirror the diffusers module paths with ``.`` → ``_``
(``down_blocks_0 / attentions_1 / transformer_blocks_0 / attn1 / to_q`` …) so:
  1. the LoRA key schema ``lora_unet_<path>`` (reference lora.py:239-240)
     falls out of the flax param-tree path verbatim, and
  2. diffusers torch checkpoints convert by a mechanical name/layout mapping
     (io/torch_convert.py).

TPU-first decisions:
  * NHWC everywhere inside (XLA:TPU conv layout); NCHW only at the public
    boundary for reference shape parity,
  * attention runs through ops/attention.py (Pallas flash on TPU),
  * norms/softmax in fp32, matmuls/convs in the configured compute dtype
    (bf16 on TPU),
  * no python-level branching on traced values — a single jitted forward
    serves teacher and student branches (adapters are merged into params,
    see adapters/lora.py).

The diffusers "attention_head_dim actually means num-heads" quirk is
preserved: SD1.5's ``attention_head_dim=8`` → 8 heads; SDXL's ``[5,10,20]``
→ that many heads per block (64-dim heads).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.ops.attention import dot_product_attention

# trace-time switches for ptp-style attention controllers (the reference
# monkey-patches CrossAttention.forward to expose/modify maps,
# ptp_utils.py:173-240,243-295); context managers keep one model definition
# serving all modes:
#   with capture_attention_maps():
#       out, inter = model.apply(vars, ..., mutable=["intermediates"])
#   with reweight_cross_attention(token_weights):   # [S_text] scales
#       out = model.apply(vars, ...)
_CAPTURE_ATTENTION = [False]
_CROSS_ATTN_WEIGHTS = [None]


class capture_attention_maps:
    """TRACE-TIME switch: must be active while the forward is being traced —
    a function already jitted outside the context keeps its cached
    (capture-free) executable and this silently no-ops. Nested use restores
    the outer state on exit."""

    def __enter__(self):
        self._prev = _CAPTURE_ATTENTION[0]
        _CAPTURE_ATTENTION[0] = True

    def __exit__(self, *a):
        _CAPTURE_ATTENTION[0] = self._prev


class reweight_cross_attention:
    """Scale cross-attention probabilities per text token — the functional
    equivalent of prompt-to-prompt attention reweighting (the reference's
    alpha-schedule helpers, ptp_utils.py:243-295). ``weights`` is a [S_text]
    vector (applied to every batch row — CFG callers that want the
    reference's conditional-rows-only behavior pass [B_rows, S_text] with
    ones on the uncond rows); probabilities are multiplied column-wise and
    renormalized.

    TRACE-TIME switch like :class:`capture_attention_maps`: the context must
    wrap the trace, weights traced once are baked into that executable, and
    an already-compiled function ignores a later context. Nested use
    restores the outer weights on exit."""

    def __init__(self, weights):
        self.weights = weights

    def __enter__(self):
        self._prev = _CROSS_ATTN_WEIGHTS[0]
        _CROSS_ATTN_WEIGHTS[0] = self.weights

    def __exit__(self, *a):
        _CROSS_ATTN_WEIGHTS[0] = self._prev


@dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # per-block num-heads (diffusers' misnamed attention_head_dim)
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1
    use_linear_projection: bool = False
    addition_embed_type: Optional[str] = None  # "text_time" for SDXL
    addition_time_embed_dim: Optional[int] = None  # 256 for SDXL
    projection_class_embeddings_input_dim: Optional[int] = None  # 2816 for SDXL
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: int = 0

    def heads_for_block(self, i: int) -> int:
        a = self.attention_head_dim
        return a[i] if isinstance(a, (tuple, list)) else a

    def tf_layers_for_block(self, i: int) -> int:
        t = self.transformer_layers_per_block
        return t[i] if isinstance(t, (tuple, list)) else t

    @classmethod
    def sd15(cls) -> "UNetConfig":
        """runwayml/stable-diffusion-v1-5 unet/config.json."""
        return cls()

    @classmethod
    def sd21(cls) -> "UNetConfig":
        """stabilityai/stable-diffusion-2-1: 1024-dim context, per-block head
        counts [5,10,20,20], linear projections, v-prediction handled by the
        scheduler (not the UNet)."""
        return cls(
            sample_size=96,
            cross_attention_dim=1024,
            attention_head_dim=(5, 10, 20, 20),
            use_linear_projection=True,
        )

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        """stabilityai/stable-diffusion-xl-base-1.0 unet/config.json."""
        return cls(
            sample_size=128,
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
            block_out_channels=(320, 640, 1280),
            cross_attention_dim=2048,
            attention_head_dim=(5, 10, 20),
            transformer_layers_per_block=(1, 2, 10),
            use_linear_projection=True,
            addition_embed_type="text_time",
            addition_time_embed_dim=256,
            projection_class_embeddings_input_dim=2816,
        )

    @classmethod
    def tiny(cls, cross_attention_dim: int = 32) -> "UNetConfig":
        """Small config for CPU tests: same topology as SD1.5, tiny widths."""
        return cls(
            sample_size=8,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=4,
            norm_num_groups=8,
        )

    @classmethod
    def tiny_xl(cls, cross_attention_dim: int = 32) -> "UNetConfig":
        """Tiny SDXL-topology config (text_time conditioning) for CPU tests.

        projection_class_embeddings_input_dim = pooled(32) + 6*addition(8)=80.
        """
        return cls(
            sample_size=8,
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=4,
            transformer_layers_per_block=1,
            use_linear_projection=True,
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=80,
            norm_num_groups=8,
        )


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers ``get_timestep_embedding`` semantics."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 → silu → linear_2 (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.time_embed_dim, name="linear_1", dtype=self.dtype)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.time_embed_dim, name="linear_2", dtype=self.dtype)(x)


def _group_norm(num_groups: int, eps: float, name: str):
    # fp32 statistics regardless of compute dtype
    return nn.GroupNorm(num_groups=num_groups, epsilon=eps, name=name, dtype=jnp.float32)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = _group_norm(self.groups, self.eps, "norm1")(x).astype(self.dtype)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv1", dtype=self.dtype)(h)

        t = nn.Dense(self.out_channels, name="time_emb_proj", dtype=self.dtype)(jax.nn.silu(temb))
        h = h + t[:, None, None, :]

        h = _group_norm(self.groups, self.eps, "norm2")(h).astype(self.dtype)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv2", dtype=self.dtype)(h)

        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", dtype=self.dtype)(x)
        return x + h


class Attention(nn.Module):
    """diffusers Attention: to_q/to_k/to_v (no bias) + to_out.0.

    ``capture_maps=True`` sows the softmax attention probabilities into the
    'intermediates' collection — the functional equivalent of the
    reference's prompt-to-prompt attention controllers, which monkey-patch
    ``CrossAttention.forward`` to expose maps
    (reference conceptmod/textsliders/ptp_utils.py:173-240). Retrieve with
    ``model.apply(..., capture_intermediates/mutable=['intermediates'])``;
    this path uses the materializing XLA attention (maps can't come out of
    the flash kernel without being materialized anyway).
    """

    query_dim: int
    heads: int
    cross_attention_dim: Optional[int] = None  # None -> self attention
    dtype: jnp.dtype = jnp.float32
    capture_maps: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads

        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(context)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(context)

        B, S, _ = q.shape
        Skv = k.shape[1]
        q = q.reshape(B, S, self.heads, head_dim)
        k = k.reshape(B, Skv, self.heads, head_dim)
        v = v.reshape(B, Skv, self.heads, head_dim)
        is_cross = self.cross_attention_dim is not None
        reweight = _CROSS_ATTN_WEIGHTS[0] if is_cross else None
        if self.capture_maps or _CAPTURE_ATTENTION[0] or reweight is not None:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * (head_dim**-0.5), k
            ).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            if reweight is not None:
                w = jnp.asarray(reweight, jnp.float32)
                # [S] = every row; [B_rows, S] = per-row (CFG callers put
                # ones on the uncond rows, matching the reference's
                # conditional-only reweighting)
                w = w.reshape(1, 1, 1, -1) if w.ndim == 1 else w[:, None, None, :]
                probs = probs * w
                probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
            if self.capture_maps or _CAPTURE_ATTENTION[0]:
                self.sow("intermediates", "attn_probs", probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
        else:
            out = dot_product_attention(q, k, v)
        out = out.reshape(B, S, inner)
        return nn.Dense(self.query_dim, name="to_out_0", dtype=self.dtype)(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.inner_dim * 2, name="proj", dtype=self.dtype)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(self.dtype)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, name="net_0", dtype=self.dtype)(x)
        return nn.Dense(self.dim, name="net_2", dtype=self.dtype)(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name, dtype=jnp.float32)
        h = ln("norm1")(x).astype(self.dtype)
        x = x + Attention(self.dim, self.heads, name="attn1", dtype=self.dtype)(h)
        h = ln("norm2")(x).astype(self.dtype)
        x = x + Attention(
            self.dim, self.heads, cross_attention_dim=self.cross_attention_dim, name="attn2", dtype=self.dtype
        )(h, context)
        h = ln("norm3")(x).astype(self.dtype)
        x = x + FeedForward(self.dim, name="ff", dtype=self.dtype)(h)
        return x


class Transformer2DModel(nn.Module):
    heads: int
    cross_attention_dim: int
    num_layers: int = 1
    use_linear_projection: bool = False
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = _group_norm(self.groups, 1e-6, "norm")(x).astype(self.dtype)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(C, name="proj_in", dtype=self.dtype)(h)
        else:
            h = nn.Conv(C, (1, 1), name="proj_in", dtype=self.dtype)(h)
            h = h.reshape(B, H * W, C)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                C, self.heads, self.cross_attention_dim, name=f"transformer_blocks_{i}", dtype=self.dtype
            )(h, context)

        if self.use_linear_projection:
            h = nn.Dense(C, name="proj_out", dtype=self.dtype)(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), name="proj_out", dtype=self.dtype)(h)
        return h + residual


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="conv", dtype=self.dtype
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), name="conv", dtype=self.dtype)(x)


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context=None):
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups, name=f"resnets_{i}", dtype=self.dtype)(x, temb)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0", dtype=self.dtype)(x)
            outputs.append(x)
        return x, outputs


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    transformer_layers: int
    use_linear_projection: bool
    add_downsample: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups, name=f"resnets_{i}", dtype=self.dtype)(x, temb)
            x = Transformer2DModel(
                self.heads,
                self.cross_attention_dim,
                num_layers=self.transformer_layers,
                use_linear_projection=self.use_linear_projection,
                groups=self.groups,
                name=f"attentions_{i}",
                dtype=self.dtype,
            )(x, context)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0", dtype=self.dtype)(x)
            outputs.append(x)
        return x, outputs


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    heads: int
    cross_attention_dim: int
    transformer_layers: int
    use_linear_projection: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, groups=self.groups, name="resnets_0", dtype=self.dtype)(x, temb)
        x = Transformer2DModel(
            self.heads,
            self.cross_attention_dim,
            num_layers=self.transformer_layers,
            use_linear_projection=self.use_linear_projection,
            groups=self.groups,
            name="attentions_0",
            dtype=self.dtype,
        )(x, context)
        x = ResnetBlock2D(self.channels, groups=self.groups, name="resnets_1", dtype=self.dtype)(x, temb)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, context=None):
        for i in range(self.num_layers):
            res = res_samples.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups, name=f"resnets_{i}", dtype=self.dtype)(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0", dtype=self.dtype)(x)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    transformer_layers: int
    use_linear_projection: bool
    add_upsample: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, context):
        for i in range(self.num_layers):
            res = res_samples.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.groups, name=f"resnets_{i}", dtype=self.dtype)(x, temb)
            x = Transformer2DModel(
                self.heads,
                self.cross_attention_dim,
                num_layers=self.transformer_layers,
                use_linear_projection=self.use_linear_projection,
                groups=self.groups,
                name=f"attentions_{i}",
                dtype=self.dtype,
            )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0", dtype=self.dtype)(x)
        return x


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # NCHW [B, in_channels, H, W] (reference layout)
        timestep: jnp.ndarray,  # scalar or [B]
        encoder_hidden_states: jnp.ndarray,  # [B, S, cross_attention_dim]
        added_cond_kwargs: Optional[dict] = None,  # XL: {"text_embeds", "time_ids"}
    ) -> jnp.ndarray:
        cfg = self.config
        B = sample.shape[0]
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)  # -> NHWC
        context = encoder_hidden_states.astype(self.dtype)

        # --- time embedding ---------------------------------------------------
        timesteps = jnp.broadcast_to(jnp.asarray(timestep, dtype=jnp.float32).reshape(-1), (B,))
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        time_embed_dim = cfg.block_out_channels[0] * 4
        emb = TimestepEmbedding(time_embed_dim, name="time_embedding", dtype=self.dtype)(t_emb)

        if cfg.addition_embed_type == "text_time":
            if added_cond_kwargs is None:
                raise ValueError("XL UNet requires added_cond_kwargs{text_embeds, time_ids}")
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift
            )
            time_embeds = time_embeds.reshape(B, -1)
            add_embeds = jnp.concatenate(
                [text_embeds.astype(jnp.float32), time_embeds], axis=-1
            ).astype(self.dtype)
            aug_emb = TimestepEmbedding(time_embed_dim, name="add_embedding", dtype=self.dtype)(add_embeds)
            emb = emb + aug_emb

        # --- down -------------------------------------------------------------
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), name="conv_in", dtype=self.dtype
        )(x)
        res_samples = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == len(cfg.down_block_types) - 1
            out_ch = cfg.block_out_channels[i]
            if block_type == "CrossAttnDownBlock2D":
                x, outs = CrossAttnDownBlock2D(
                    out_channels=out_ch,
                    num_layers=cfg.layers_per_block,
                    heads=cfg.heads_for_block(i),
                    cross_attention_dim=cfg.cross_attention_dim,
                    transformer_layers=cfg.tf_layers_for_block(i),
                    use_linear_projection=cfg.use_linear_projection,
                    add_downsample=not is_final,
                    groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}",
                    dtype=self.dtype,
                )(x, emb, context)
            elif block_type == "DownBlock2D":
                x, outs = DownBlock2D(
                    out_channels=out_ch,
                    num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}",
                    dtype=self.dtype,
                )(x, emb)
            else:
                raise ValueError(f"Unknown down block: {block_type}")
            res_samples.extend(outs)

        # --- mid --------------------------------------------------------------
        x = UNetMidBlock2DCrossAttn(
            channels=cfg.block_out_channels[-1],
            heads=cfg.heads_for_block(len(cfg.block_out_channels) - 1),
            cross_attention_dim=cfg.cross_attention_dim,
            transformer_layers=cfg.tf_layers_for_block(len(cfg.block_out_channels) - 1),
            use_linear_projection=cfg.use_linear_projection,
            groups=cfg.norm_num_groups,
            name="mid_block",
            dtype=self.dtype,
        )(x, emb, context)

        # --- up ---------------------------------------------------------------
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = [cfg.heads_for_block(i) for i in reversed(range(len(cfg.block_out_channels)))]
        rev_tf = [cfg.tf_layers_for_block(i) for i in reversed(range(len(cfg.block_out_channels)))]
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(cfg.up_block_types) - 1
            out_ch = rev_channels[i]
            n_layers = cfg.layers_per_block + 1
            block_res = res_samples[-n_layers:]
            del res_samples[-n_layers:]
            if block_type == "CrossAttnUpBlock2D":
                x = CrossAttnUpBlock2D(
                    out_channels=out_ch,
                    num_layers=n_layers,
                    heads=rev_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    transformer_layers=rev_tf[i],
                    use_linear_projection=cfg.use_linear_projection,
                    add_upsample=not is_final,
                    groups=cfg.norm_num_groups,
                    name=f"up_blocks_{i}",
                    dtype=self.dtype,
                )(x, block_res, emb, context)
            elif block_type == "UpBlock2D":
                x = UpBlock2D(
                    out_channels=out_ch,
                    num_layers=n_layers,
                    add_upsample=not is_final,
                    groups=cfg.norm_num_groups,
                    name=f"up_blocks_{i}",
                    dtype=self.dtype,
                )(x, block_res, emb)
            else:
                raise ValueError(f"Unknown up block: {block_type}")

        # --- out --------------------------------------------------------------
        x = _group_norm(cfg.norm_num_groups, 1e-5, "conv_norm_out")(x).astype(self.dtype)
        x = jax.nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out", dtype=self.dtype)(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # -> NCHW
