"""AutoencoderKL (Flax, from scratch) — SD1/2 and SDXL VAE.

Functional-parity target: the diffusers ``AutoencoderKL`` the reference uses
to encode dataset images for visual sliders
(``trainscripts/imagesliders/train_util.py:200-235``: ``vae.encode`` →
``· vae.config.scaling_factor``) and to decode at inference
(``generate_images_xl.py:364-385``, fp32-upcast path). Scaling factors:
0.18215 (SD1/2), 0.13025 (SDXL).

Param-tree naming mirrors diffusers module paths (``encoder/down_blocks_0/
resnets_0/conv1`` …) for mechanical checkpoint conversion (io/torch_convert).

TPU notes: NHWC internally, NCHW at the public boundary; the 512-channel
mid-block attention runs single-head over spatial tokens in fp32 softmax via
the shared attention dispatch. Decode of a 1024px latent is 128×128=16k
tokens — flash-attention eligible on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    # flow-matching VAEs (SD3 0.0609, Flux 0.1159): x = z/scaling + shift
    # before decode; 0.0 for the epsilon families
    shift_factor: float = 0.0
    # SD3/Flux VAEs ship no (post_)quant_conv (diffusers use_quant_conv=false)
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sdxl(cls) -> "VAEConfig":
        return cls(scaling_factor=0.13025)

    @classmethod
    def sd3(cls) -> "VAEConfig":
        """16-channel SD3/Flux VAE (shift_factor applied by the caller —
        infer/generate_flow.sd3_latents_to_images). Real checkpoints carry
        no quant convs — the encoder's conv_out emits 2·C moments directly."""
        return cls(
            latent_channels=16,
            scaling_factor=1.5305,
            shift_factor=0.0609,
            use_quant_conv=False,
            use_post_quant_conv=False,
        )

    @classmethod
    def tiny(cls) -> "VAEConfig":
        # two blocks -> 2x downsampling; latents are H/2 (not the SD H/8)
        return cls(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4)


def _gn(groups: int, name: str):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name, dtype=jnp.float32)


class VAEResnetBlock(nn.Module):
    """diffusers ResnetBlock2D without time conditioning (VAE flavor)."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(self.groups, "norm1")(x).astype(self.dtype)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv1", dtype=self.dtype)(h)
        h = _gn(self.groups, "norm2")(h).astype(self.dtype)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv2", dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", dtype=self.dtype)(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head spatial self-attention (diffusers Attention in VAE mid)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(self.groups, "group_norm")(x).astype(self.dtype)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q", dtype=self.dtype)(h)
        k = nn.Dense(C, name="to_k", dtype=self.dtype)(h)
        v = nn.Dense(C, name="to_v", dtype=self.dtype)(h)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(C, name="to_out_0", dtype=self.dtype)(out)
        return x + out.reshape(B, H, W, C)


class VAEDownsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers VAE downsample pads asymmetrically (0,1,0,1)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID", name="conv", dtype=self.dtype
        )(x)


class VAEUpsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), name="conv", dtype=self.dtype)(x)


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = VAEResnetBlock(self.out_channels, self.groups, name=f"resnets_{i}", dtype=self.dtype)(x)
        if self.add_downsample:
            x = VAEDownsample(self.out_channels, name="downsamplers_0", dtype=self.dtype)(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = VAEResnetBlock(self.out_channels, self.groups, name=f"resnets_{i}", dtype=self.dtype)(x)
        if self.add_upsample:
            x = VAEUpsample(self.out_channels, name="upsamplers_0", dtype=self.dtype)(x)
        return x


class MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, self.groups, name="resnets_0", dtype=self.dtype)(x)
        x = VAEAttentionBlock(self.channels, self.groups, name="attentions_0", dtype=self.dtype)(x)
        x = VAEResnetBlock(self.channels, self.groups, name="resnets_1", dtype=self.dtype)(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), name="conv_in", dtype=self.dtype)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock(
                ch,
                cfg.layers_per_block,
                add_downsample=i < len(cfg.block_out_channels) - 1,
                groups=cfg.norm_num_groups,
                name=f"down_blocks_{i}",
                dtype=self.dtype,
            )(x)
        x = MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups, name="mid_block", dtype=self.dtype)(x)
        x = _gn(cfg.norm_num_groups, "conv_norm_out")(x).astype(self.dtype)
        x = jax.nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out", dtype=self.dtype)(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), name="conv_in", dtype=self.dtype)(z)
        x = MidBlock(rev[0], cfg.norm_num_groups, name="mid_block", dtype=self.dtype)(x)
        for i, ch in enumerate(rev):
            x = UpDecoderBlock(
                ch,
                cfg.layers_per_block + 1,
                add_upsample=i < len(rev) - 1,
                groups=cfg.norm_num_groups,
                name=f"up_blocks_{i}",
                dtype=self.dtype,
            )(x)
        x = _gn(cfg.norm_num_groups, "conv_norm_out")(x).astype(self.dtype)
        x = jax.nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out", dtype=self.dtype)(x)


class AutoencoderKL(nn.Module):
    """Public boundary is NCHW images in [-1, 1] / NCHW latents (reference
    layout); ``encode`` returns (mean, logvar); use :func:`sample_latents` or
    take the mean (null-text inversion uses the mean·0.18215,
    ``demo_image_editing.ipynb`` cell 6)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        if self.config.use_quant_conv:
            self.quant_conv = nn.Conv(
                2 * self.config.latent_channels, (1, 1), name="quant_conv", dtype=self.dtype
            )
        if self.config.use_post_quant_conv:
            self.post_quant_conv = nn.Conv(
                self.config.latent_channels, (1, 1), name="post_quant_conv", dtype=self.dtype
            )

    def encode(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.encoder(x)
        if self.config.use_quant_conv:
            moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return (
            jnp.transpose(mean, (0, 3, 1, 2)),
            jnp.transpose(logvar, (0, 3, 1, 2)),
        )

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        z = jnp.transpose(latents, (0, 2, 3, 1)).astype(self.dtype)
        if self.config.use_post_quant_conv:
            z = self.post_quant_conv(z)
        x = self.decoder(z)
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, images):
        mean, logvar = self.encode(images)
        return self.decode(mean)


def sample_latents(key: jax.Array, mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """DiagonalGaussianDistribution.sample()."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
