"""Stable Cascade prior (Würstchen Stage C) — Flax, from scratch.

Architecture-parity target: the ``prior`` component of
``StableCascadePriorPipeline`` as loaded by the reference
(``conceptmod/textsliders/model_util.py:139-160``) and called by
``predict_noise_cascade`` / ``diffusion_cascade``
(``train_util.py:492-576,844-972``) with
``unet(x=…, r=ratio, clip_text_pooled=…, clip_text=…, clip_img=…)``.

Stage C is a two-level conv/attention hybrid over 16-channel "effnet"
latents at ``ceil(res/42.67)`` spatial size (train_util.py:899-907):
pixel-unshuffle patchify (patch 1 ⇒ identity) → 1×1 conv embedding →
per-level stacks of [depthwise-conv ResBlock → timestep-ratio modulation
block → attention block] (8/24 layers down, 24/8 up, both 2048 wide,
stride-2 conv between levels), cross/self attention against a CLIP-G
conditioning sequence (mapped text tokens + pooled·clip_seq + image-embed
slots), cosine timestep-*ratio* conditioning with two extra zero conds
("sca", "crp").

Param paths mirror the diffusers ``StableCascadeUNet`` state-dict layout
(``down_blocks_0_2.attention.to_q`` …) so checkpoint conversion is
mechanical and LoRA targeting sees the attention module as class
"Attention" (reference LoRANetwork over DEFAULT_TARGET_REPLACE,
train_lora_cascade.py:87-93). Real-checkpoint conversion is untested in
this zero-egress environment (no stable-cascade weights on disk) — tracked
with the UNet/VAE activation-parity gap in COMPONENTS.md.

TPU-first: NHWC internally (NCHW at the call boundary), attention through
ops/attention.py, depthwise convs via ``feature_group_count`` (XLA maps
these onto the VPU/MXU fine at 2048 channels), everything static-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class CascadeConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 1
    conditioning_dim: int = 2048
    block_out_channels: Tuple[int, ...] = (2048, 2048)
    num_attention_heads: Tuple[int, ...] = (32, 32)
    down_num_layers_per_block: Tuple[int, ...] = (8, 24)
    up_num_layers_per_block: Tuple[int, ...] = (24, 8)
    clip_text_in_channels: int = 1280
    clip_text_pooled_in_channels: int = 1280
    clip_image_in_channels: int = 768
    clip_seq: int = 4
    kernel_size: int = 3
    timestep_ratio_embedding_dim: int = 64
    timestep_conditioning_type: Tuple[str, ...] = ("sca", "crp")
    # stage-C latents are ceil(pixel_res / resolution_multiple) on a side
    # (reference train_util.py:899-903)
    resolution_multiple: float = 42.67

    @classmethod
    def prior(cls) -> "CascadeConfig":
        """stabilityai/stable-cascade-prior (3.6B)."""
        return cls()

    @classmethod
    def tiny(cls) -> "CascadeConfig":
        return cls(
            conditioning_dim=32,
            block_out_channels=(32, 32),
            num_attention_heads=(2, 2),
            down_num_layers_per_block=(1, 1),
            up_num_layers_per_block=(1, 1),
            clip_text_in_channels=16,
            clip_text_pooled_in_channels=16,
            clip_image_in_channels=16,
            clip_seq=2,
            timestep_ratio_embedding_dim=8,
        )


def ratio_embedding(r: jnp.ndarray, dim: int, max_positions: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding of a [0,1] timestep *ratio* (Stage C conditions on
    the cosine-schedule ratio, not an integer timestep)."""
    r = r.astype(jnp.float32) * max_positions
    half = dim // 2
    freqs = jnp.exp(-np.log(max_positions) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = r[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _channel_layer_norm(x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm over the trailing (channel) dim, no affine, eps 1e-6, fp32."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


class GlobalResponseNorm(nn.Module):
    """ConvNeXt-v2 GRN (channels-last): x·(‖x‖₂ over space / mean over C)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        x32 = x.astype(jnp.float32)
        agg = jnp.sqrt(jnp.sum(x32 * x32, axis=(1, 2), keepdims=True))  # [B,1,1,C]
        stand = agg / (agg.mean(axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x32 * stand) + beta + x32).astype(x.dtype)


class CascadeResBlock(nn.Module):
    """Depthwise conv + channelwise MLP with GRN; optional skip concat before
    the MLP (the up-path level-transition skip)."""

    c: int
    c_skip: int = 0
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip: Optional[jnp.ndarray] = None):  # NHWC
        res = x
        k = self.kernel_size
        x = nn.Conv(
            self.c, (k, k), padding=k // 2, feature_group_count=self.c,
            name="depthwise", dtype=self.dtype,
        )(x)
        x = _channel_layer_norm(x)
        if x_skip is not None:
            x = jnp.concatenate([x, x_skip.astype(x.dtype)], axis=-1)
        h = nn.Dense(self.c * 4, name="channelwise_0", dtype=self.dtype)(x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = GlobalResponseNorm(self.c * 4, name="channelwise_2", dtype=self.dtype)(h)
        h = nn.Dense(self.c, name="channelwise_4", dtype=self.dtype)(h)
        return h + res


class CascadeTimestepBlock(nn.Module):
    """FiLM on the ratio embedding: x·(1+a)+b, with one extra mapper per
    auxiliary condition (sca/crp) whose (a,b) are summed in."""

    c: int
    conds: Tuple[str, ...] = ("sca", "crp")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, r_embed):  # x NHWC, r_embed [B, dim·(1+len(conds))]
        chunks = jnp.split(r_embed.astype(self.dtype), 1 + len(self.conds), axis=1)
        ab = nn.Dense(self.c * 2, name="mapper", dtype=self.dtype)(chunks[0])
        a, b = jnp.split(ab, 2, axis=1)
        for i, cname in enumerate(self.conds):
            ab_c = nn.Dense(self.c * 2, name=f"mapper_{cname}", dtype=self.dtype)(chunks[i + 1])
            ac, bc = jnp.split(ab_c, 2, axis=1)
            a, b = a + ac, b + bc
        return x * (1 + a[:, None, None, :]) + b[:, None, None, :]


class CascadeAttention(nn.Module):
    """The inner attention module — named/structured as diffusers class
    ``Attention`` (to_q/to_k/to_v/to_out.0) so the LoRA site selector targets
    it exactly like UNet attention."""

    c: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens):  # [B,Sq,C], [B,Skv,C]
        hd = self.c // self.heads
        q = nn.Dense(self.c, name="to_q", dtype=self.dtype)(q_tokens)
        k = nn.Dense(self.c, name="to_k", dtype=self.dtype)(kv_tokens)
        v = nn.Dense(self.c, name="to_v", dtype=self.dtype)(kv_tokens)
        B, Sq, _ = q.shape
        Skv = k.shape[1]
        out = dot_product_attention(
            q.reshape(B, Sq, self.heads, hd),
            k.reshape(B, Skv, self.heads, hd),
            v.reshape(B, Skv, self.heads, hd),
        ).reshape(B, Sq, self.c)
        return nn.Dense(self.c, name="to_out_0", dtype=self.dtype)(out)


class CascadeAttnBlock(nn.Module):
    """norm → attention where KV = [image tokens (self), mapped CLIP seq]."""

    c: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, clip):  # x NHWC, clip [B, Sc, c]
        B, H, W, C = x.shape
        kv = nn.Dense(self.c, name="kv_mapper_1", dtype=self.dtype)(
            jax.nn.silu(clip.astype(jnp.float32)).astype(self.dtype)
        )
        norm_x = _channel_layer_norm(x)
        tokens = norm_x.reshape(B, H * W, C)
        kv = jnp.concatenate([tokens, kv], axis=1)  # self_attn=True
        attn = CascadeAttention(self.c, self.heads, name="attention", dtype=self.dtype)(
            tokens, kv
        )
        return x + attn.reshape(B, H, W, C)


class StableCascadeUNet(nn.Module):
    """Stage C prior. Boundary layout NCHW (matching the torch call sites);
    returns the predicted image-embedding noise, same shape as ``x``."""

    config: CascadeConfig
    dtype: jnp.dtype = jnp.float32

    def _r_embed(self, r, extra_conds):
        cfg = self.config
        parts = [ratio_embedding(r, cfg.timestep_ratio_embedding_dim)]
        for cname in cfg.timestep_conditioning_type:
            cond = extra_conds.get(cname) if extra_conds else None
            if cond is None:
                cond = jnp.zeros_like(r)
            parts.append(ratio_embedding(cond, cfg.timestep_ratio_embedding_dim))
        return jnp.concatenate(parts, axis=1)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, c_in, H', W'] effnet latents
        r: jnp.ndarray,  # [B] timestep ratio in [0, 1]
        clip_text: jnp.ndarray,  # [B, S, clip_text_in_channels]
        clip_text_pooled: jnp.ndarray,  # [B, 1, pooled] (or [B, pooled])
        clip_img: jnp.ndarray,  # [B, 1, img] (or [B, img])
        **extra_conds,
    ) -> jnp.ndarray:
        cfg = self.config
        c0 = cfg.block_out_channels[0]
        conds = tuple(cfg.timestep_conditioning_type)

        r_embed = self._r_embed(jnp.broadcast_to(jnp.reshape(r, (-1,)), (x.shape[0],)), extra_conds)

        # conditioning sequence: mapped text + pooled·clip_seq + img·clip_seq
        if clip_text_pooled.ndim == 2:
            clip_text_pooled = clip_text_pooled[:, None]
        if clip_img.ndim == 2:
            clip_img = clip_img[:, None]
        B = x.shape[0]
        d = cfg.conditioning_dim
        txt = nn.Dense(d, name="clip_txt_mapper", dtype=self.dtype)(clip_text.astype(self.dtype))
        pooled = nn.Dense(d * cfg.clip_seq, name="clip_txt_pooled_mapper", dtype=self.dtype)(
            clip_text_pooled.astype(self.dtype)
        ).reshape(B, clip_text_pooled.shape[1] * cfg.clip_seq, d)
        img = nn.Dense(d * cfg.clip_seq, name="clip_img_mapper", dtype=self.dtype)(
            clip_img.astype(self.dtype)
        ).reshape(B, clip_img.shape[1] * cfg.clip_seq, d)
        clip = _channel_layer_norm(jnp.concatenate([txt, pooled, img], axis=1))

        # embedding (patch 1 ⇒ pixel-unshuffle is identity): 1×1 conv + norm
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        h = nn.Conv(c0, (1, 1), name="embedding_1", dtype=self.dtype)(h)
        h = _channel_layer_norm(h)

        # --- down path -----------------------------------------------------
        level_outputs = []
        for i, c in enumerate(cfg.block_out_channels):
            if i > 0:
                h = _channel_layer_norm(h)
                # unpadded kernel-2/stride-2 (torch Conv2d padding=0): odd
                # grids floor, matching the original decomposition
                h = nn.Conv(
                    c, (2, 2), strides=(2, 2), padding="VALID",
                    name=f"down_downscalers_{i}_1", dtype=self.dtype,
                )(h)
            j = 0
            for _ in range(cfg.down_num_layers_per_block[i]):
                h = CascadeResBlock(
                    c, kernel_size=cfg.kernel_size, name=f"down_blocks_{i}_{j}", dtype=self.dtype
                )(h)
                h = CascadeTimestepBlock(
                    c, conds=conds, name=f"down_blocks_{i}_{j+1}", dtype=self.dtype
                )(h, r_embed)
                h = CascadeAttnBlock(
                    c, cfg.num_attention_heads[i], name=f"down_blocks_{i}_{j+2}", dtype=self.dtype
                )(h, clip)
                j += 3
            level_outputs.insert(0, h)

        # --- up path ---------------------------------------------------------
        h = level_outputs[0]
        n_levels = len(cfg.block_out_channels)
        for gi in range(n_levels):
            level = n_levels - 1 - gi  # original level index (deep first)
            c = cfg.block_out_channels[level]
            j = 0
            for layer in range(cfg.up_num_layers_per_block[gi]):
                skip = level_outputs[gi] if layer == 0 and gi > 0 else None
                if skip is not None and h.shape[1:3] != skip.shape[1:3]:
                    # odd latent sizes: stride-2 down + transpose-up lands one
                    # off — bilinear-resize to the skip as the original does.
                    # Deliberate deviation: half-pixel sampling (jax.image)
                    # vs torch's align_corners=True; only reachable on odd
                    # grids (non-multiple-of-~85px inputs), where the
                    # original interpolates too
                    h = jax.image.resize(
                        h, (h.shape[0],) + skip.shape[1:3] + (h.shape[3],), "bilinear"
                    ).astype(h.dtype)
                h = CascadeResBlock(
                    c,
                    c_skip=c if skip is not None else 0,
                    kernel_size=cfg.kernel_size,
                    name=f"up_blocks_{gi}_{j}",
                    dtype=self.dtype,
                )(h, skip)
                h = CascadeTimestepBlock(
                    c, conds=conds, name=f"up_blocks_{gi}_{j+1}", dtype=self.dtype
                )(h, r_embed)
                h = CascadeAttnBlock(
                    c, cfg.num_attention_heads[level], name=f"up_blocks_{gi}_{j+2}", dtype=self.dtype
                )(h, clip)
                j += 3
            if level > 0:  # transition up to the shallower level
                h = _channel_layer_norm(h)
                # torch ConvTranspose2d(k=2, s=2) parity: kernels convert via
                # (2,3,0,1)-transpose + spatial flip (convert_cascade_state_dict)
                h = nn.ConvTranspose(
                    cfg.block_out_channels[level - 1],
                    (2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    name=f"up_upscalers_{gi}_1",
                    dtype=self.dtype,
                )(h)

        # --- head ------------------------------------------------------------
        h = _channel_layer_norm(h)
        out = nn.Conv(cfg.out_channels * cfg.patch_size**2, (1, 1), name="clf_1", dtype=self.dtype)(h)
        return jnp.transpose(out, (0, 3, 1, 2)).astype(x.dtype)


def convert_cascade_state_dict(sd):
    """diffusers StableCascadeUNet state dict → this module's flax params.

    Extends io/torch_convert.torch_entry_to_flax with the two Stage-C
    specifics it cannot know about:
    * GlobalResponseNorm ``gamma``/``beta`` leaves — (1,1,1,C) channels-last
      in torch too (the channelwise MLP runs permuted), copied through,
    * ``up_upscalers.*.1`` ConvTranspose kernels — torch (in,out,kh,kw) →
      flax (kh,kw,in,out) with a spatial flip (verified exact against
      torch.nn.functional.conv_transpose2d in tests/test_cascade.py).
    """
    import re

    from sliders_conceptmod_tpu.io.torch_convert import (
        _assign,
        _merge_numeric,
        torch_entry_to_flax,
    )

    _upscaler = re.compile(r"^up_upscalers\.\d+\.1\.weight$")
    tree = {}
    for key, value in sd.items():
        value = np.asarray(value)
        parts = key.split(".")
        if parts[-1] in ("gamma", "beta"):
            _assign(tree, tuple(_merge_numeric(parts[:-1])) + (parts[-1],), value)
            continue
        if _upscaler.match(key):
            kernel = np.transpose(value, (2, 3, 0, 1))[::-1, ::-1].copy()
            _assign(tree, (f"up_upscalers_{parts[1]}_1", "kernel"), kernel)
            continue
        entry = torch_entry_to_flax(key, value)
        if entry is not None:
            _assign(tree, entry[0], entry[1])
    return tree
