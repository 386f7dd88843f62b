"""Cross-framework numerics parity for the diffusion backbones (VERDICT r3 #1).

The reference gets UNet/VAE/MMDiT/Flux correctness for free by instantiating
diffusers classes (conceptmod/textsliders/model_util.py:112-137,217-268,
358-385). This repo's from-scratch Flax models were previously validated only
against structural goldens and internal equivalence tests — a wrong GroupNorm
eps, attention scale, or time-embedding sign would have passed everything.

These tests extend the LPIPS pattern
(tests/test_eval_clis.py::test_lpips_cross_framework_parity): an INDEPENDENT
torch implementation of each architecture, written from the published
formulas (LDM/SD UNet: Rombach et al. 2022 + DDPM sinusoidal embedding;
SD VAE: Kingma & Welling KL autoencoder with the SD mid-attention; MMDiT:
Esser et al. 2024 SD3 paper; Flux: BFL's released architecture description),
using torch's own native ops (F.conv2d / F.group_norm / F.layer_norm /
softmax) — NOT a port of the Flax code and NOT diffusers (not installed
here). Both sides consume the SAME randomly-initialized Flax param tree;
activations must agree to ~1e-4 in fp32 (disagreement at that scale flags a
semantic difference, not rounding).

Layout conventions bridged explicitly: flax Dense kernel [in,out] (used via
x @ W so no transpose), flax Conv kernel [kh,kw,in,out] -> torch
[out,in,kh,kw], NHWC (flax internal) vs NCHW (torch); public boundaries are
NCHW on both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def T(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def dense(x, p):
    y = x @ T(p["kernel"])
    return y + T(p["bias"]) if "bias" in p else y


def conv2d(x, p, stride=1, padding=1):
    w = T(p["kernel"]).permute(3, 2, 0, 1)
    return F.conv2d(x, w, T(p["bias"]), stride=stride, padding=padding)


def group_norm(x, p, groups, eps):
    return F.group_norm(x, groups, T(p["scale"]), T(p["bias"]), eps)


def layer_norm(x, p, eps=1e-5):
    return F.layer_norm(x, x.shape[-1:], T(p["scale"]), T(p["bias"]), eps)


def silu(x):
    return F.silu(x)


def attention(q, k, v, heads):
    """Multi-head scaled-dot-product attention from the formula; fp32
    softmax. q: [B,S,C]; k,v: [B,Skv,C]."""
    B, S, C = q.shape
    Skv = k.shape[1]
    d = C // heads
    q = q.view(B, S, heads, d).permute(0, 2, 1, 3)
    k = k.view(B, Skv, heads, d).permute(0, 2, 1, 3)
    v = v.view(B, Skv, heads, d).permute(0, 2, 1, 3)
    probs = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
    return (probs @ v).permute(0, 2, 1, 3).reshape(B, S, C)


def timestep_embedding(t, dim, flip_sin_to_cos=True, freq_shift=0.0, max_period=10000):
    """DDPM/Transformer sinusoidal embedding; flip_sin_to_cos puts cos first."""
    half = dim // 2
    freqs = torch.exp(
        -np.log(max_period) * torch.arange(half, dtype=torch.float32) / (half - freq_shift)
    )
    ang = t.float()[:, None] * freqs[None, :]
    emb = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


# --------------------------------------------------------------------------
# VAE (torch, from the SD KL-autoencoder architecture)
# --------------------------------------------------------------------------


def vae_resnet(x, p, groups):
    h = conv2d(silu(group_norm(x, p["norm1"], groups, 1e-6)), p["conv1"])
    h = conv2d(silu(group_norm(h, p["norm2"], groups, 1e-6)), p["conv2"])
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"], padding=0)
    return x + h


def vae_attn(x, p, groups):
    B, C, H, W = x.shape
    h = group_norm(x, p["group_norm"], groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    out = attention(dense(h, p["to_q"]), dense(h, p["to_k"]), dense(h, p["to_v"]), heads=1)
    out = dense(out, p["to_out_0"])
    return x + out.reshape(B, H, W, C).permute(0, 3, 1, 2)


def vae_mid(x, p, groups):
    x = vae_resnet(x, p["resnets_0"], groups)
    x = vae_attn(x, p["attentions_0"], groups)
    return vae_resnet(x, p["resnets_1"], groups)


def torch_vae_encode(images, params, cfg):
    """encoder -> (quant_conv) -> split moments. Returns (mean, logvar)."""
    p = params["encoder"]
    g = cfg.norm_num_groups
    x = conv2d(images, p["conv_in"])
    n = len(cfg.block_out_channels)
    for i in range(n):
        bp = p[f"down_blocks_{i}"]
        for j in range(cfg.layers_per_block):
            x = vae_resnet(x, bp[f"resnets_{j}"], g)
        if i < n - 1:
            # SD VAE downsample: asymmetric (0,1,0,1) pad + stride-2 VALID conv
            x = F.pad(x, (0, 1, 0, 1))
            x = conv2d(x, bp["downsamplers_0"]["conv"], stride=2, padding=0)
    x = vae_mid(x, p["mid_block"], g)
    x = conv2d(silu(group_norm(x, p["conv_norm_out"], g, 1e-6)), p["conv_out"])
    if "quant_conv" in params:
        x = conv2d(x, params["quant_conv"], padding=0)
    mean, logvar = torch.chunk(x, 2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


def torch_vae_decode(latents, params, cfg):
    z = latents
    if "post_quant_conv" in params:
        z = conv2d(z, params["post_quant_conv"], padding=0)
    p = params["decoder"]
    g = cfg.norm_num_groups
    rev = list(reversed(cfg.block_out_channels))
    x = conv2d(z, p["conv_in"])
    x = vae_mid(x, p["mid_block"], g)
    for i in range(len(rev)):
        bp = p[f"up_blocks_{i}"]
        for j in range(cfg.layers_per_block + 1):
            x = vae_resnet(x, bp[f"resnets_{j}"], g)
        if i < len(rev) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv2d(x, bp["upsamplers_0"]["conv"])
    return conv2d(silu(group_norm(x, p["conv_norm_out"], g, 1e-6)), p["conv_out"])


@pytest.mark.parametrize("use_quant_conv", [True, False])
def test_vae_cross_framework_parity(use_quant_conv):
    """Flax AutoencoderKL encode+decode vs the independent torch VAE on the
    same random weights — validates GroupNorm eps (1e-6), the asymmetric
    downsample pad, nearest upsample, single-head mid attention scale, the
    logvar clamp, and the (post_)quant_conv gating (SD3/Flux VAEs ship
    none)."""
    from dataclasses import replace

    from sliders_conceptmod_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = replace(
        VAEConfig.tiny(),
        use_quant_conv=use_quant_conv,
        use_post_quant_conv=use_quant_conv,
        latent_channels=4 if use_quant_conv else 8,
    )
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
    # break init symmetry: zero-init convs/denses would hide transpose bugs
    leaves = jax.tree.leaves(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree.unflatten(
        jax.tree.structure(params),
        [0.1 * jax.random.normal(k, l.shape, jnp.float32) for k, l in zip(keys, leaves)],
    )

    mean_j, logvar_j = model.apply({"params": params}, jnp.asarray(images), method=model.encode)
    np_params = jax.tree.map(np.asarray, params)
    mean_t, logvar_t = torch_vae_encode(T(images), np_params, cfg)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=1e-4, rtol=1e-4)

    latents = rng.standard_normal((2, cfg.latent_channels, 8, 8)).astype(np.float32)
    dec_j = model.apply({"params": params}, jnp.asarray(latents), method=model.decode)
    dec_t = torch_vae_decode(T(latents), np_params, cfg)
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.numpy(), atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# SD UNet (torch, from the LDM/SD architecture)
# --------------------------------------------------------------------------


def unet_resnet(x, temb, p, groups):
    h = conv2d(silu(group_norm(x, p["norm1"], groups, 1e-5)), p["conv1"])
    h = h + dense(silu(temb), p["time_emb_proj"])[:, :, None, None]
    h = conv2d(silu(group_norm(h, p["norm2"], groups, 1e-5)), p["conv2"])
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"], padding=0)
    return x + h


def geglu_ff(x, p):
    h = dense(x, p["net_0"]["proj"])
    h, gate = torch.chunk(h, 2, dim=-1)
    h = h * F.gelu(gate)  # exact (erf) gelu
    return dense(h, p["net_2"])


def basic_transformer_block(x, context, p, heads):
    h = layer_norm(x, p["norm1"])
    a = p["attn1"]
    x = x + dense(attention(dense(h, a["to_q"]), dense(h, a["to_k"]), dense(h, a["to_v"]), heads), a["to_out_0"])
    h = layer_norm(x, p["norm2"])
    a = p["attn2"]
    x = x + dense(
        attention(dense(h, a["to_q"]), dense(context, a["to_k"]), dense(context, a["to_v"]), heads),
        a["to_out_0"],
    )
    return x + geglu_ff(layer_norm(x, p["norm3"]), p["ff"])


def transformer_2d(x, context, p, heads, n_layers, linear_proj, groups):
    B, C, H, W = x.shape
    residual = x
    h = group_norm(x, p["norm"], groups, 1e-6)
    if linear_proj:
        h = dense(h.permute(0, 2, 3, 1).reshape(B, H * W, C), p["proj_in"])
    else:
        h = conv2d(h, p["proj_in"], padding=0).permute(0, 2, 3, 1).reshape(B, H * W, C)
    for i in range(n_layers):
        h = basic_transformer_block(h, context, p[f"transformer_blocks_{i}"], heads)
    if linear_proj:
        h = dense(h, p["proj_out"]).reshape(B, H, W, C).permute(0, 3, 1, 2)
    else:
        h = conv2d(h.reshape(B, H, W, C).permute(0, 3, 1, 2), p["proj_out"], padding=0)
    return h + residual


def torch_unet(sample, timestep, context, params, cfg, added_cond=None):
    g = cfg.norm_num_groups
    B = sample.shape[0]
    t = torch.full((B,), float(timestep)) if np.ndim(timestep) == 0 else T(timestep)
    temb = timestep_embedding(t, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
    te = params["time_embedding"]
    emb = dense(silu(dense(temb, te["linear_1"])), te["linear_2"])
    if cfg.addition_embed_type == "text_time":
        time_embeds = timestep_embedding(
            added_cond["time_ids"].reshape(-1), cfg.addition_time_embed_dim,
            cfg.flip_sin_to_cos, cfg.freq_shift,
        ).reshape(B, -1)
        add_in = torch.cat([added_cond["text_embeds"], time_embeds], dim=-1)
        ae = params["add_embedding"]
        emb = emb + dense(silu(dense(add_in, ae["linear_1"])), ae["linear_2"])

    x = conv2d(sample, params["conv_in"])
    res = [x]
    n_down = len(cfg.down_block_types)
    for i, bt in enumerate(cfg.down_block_types):
        bp = params[f"down_blocks_{i}"]
        for j in range(cfg.layers_per_block):
            x = unet_resnet(x, emb, bp[f"resnets_{j}"], g)
            if bt == "CrossAttnDownBlock2D":
                x = transformer_2d(
                    x, context, bp[f"attentions_{j}"], cfg.heads_for_block(i),
                    cfg.tf_layers_for_block(i), cfg.use_linear_projection, g,
                )
            res.append(x)
        if i < n_down - 1:
            x = conv2d(x, bp["downsamplers_0"]["conv"], stride=2)
            res.append(x)

    mp = params["mid_block"]
    last = len(cfg.block_out_channels) - 1
    x = unet_resnet(x, emb, mp["resnets_0"], g)
    x = transformer_2d(
        x, context, mp["attentions_0"], cfg.heads_for_block(last),
        cfg.tf_layers_for_block(last), cfg.use_linear_projection, g,
    )
    x = unet_resnet(x, emb, mp["resnets_1"], g)

    rev_heads = [cfg.heads_for_block(i) for i in reversed(range(len(cfg.block_out_channels)))]
    rev_tf = [cfg.tf_layers_for_block(i) for i in reversed(range(len(cfg.block_out_channels)))]
    for i, bt in enumerate(cfg.up_block_types):
        bp = params[f"up_blocks_{i}"]
        for j in range(cfg.layers_per_block + 1):
            x = torch.cat([x, res.pop()], dim=1)
            x = unet_resnet(x, emb, bp[f"resnets_{j}"], g)
            if bt == "CrossAttnUpBlock2D":
                x = transformer_2d(
                    x, context, bp[f"attentions_{j}"], rev_heads[i], rev_tf[i],
                    cfg.use_linear_projection, g,
                )
        if i < len(cfg.up_block_types) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv2d(x, bp["upsamplers_0"]["conv"])

    x = silu(group_norm(x, params["conv_norm_out"], g, 1e-5))
    return conv2d(x, params["conv_out"])


def _random_tree(params, seed, scale=0.1):
    leaves = jax.tree.leaves(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        jax.tree.structure(params),
        [scale * jax.random.normal(k, l.shape, jnp.float32) for k, l in zip(keys, leaves)],
    )


@pytest.mark.parametrize("family", ["sd1", "xl"])
def test_unet_cross_framework_parity(family):
    """Flax UNet2DConditionModel (tiny SD1 and tiny-XL topologies) vs the
    independent torch UNet on the same random weights — validates the
    sinusoidal time embedding (flip order, freq_shift denominator), resnet
    time-projection placement, GroupNorm eps (1e-5 resnets / 1e-6 in
    Transformer2D), GEGLU with exact gelu, attention scale, conv/linear
    proj_in variants, skip-connection pop order, and the SDXL
    text_time add_embedding path."""
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.tiny() if family == "sd1" else UNetConfig.tiny_xl()
    model = UNet2DConditionModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    sample = rng.standard_normal((2, cfg.in_channels, 8, 8)).astype(np.float32)
    context = rng.standard_normal((2, 7, cfg.cross_attention_dim)).astype(np.float32)
    timesteps = np.asarray([3.0, 977.0], np.float32)
    added_np = None
    added_j = None
    if cfg.addition_embed_type == "text_time":
        pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
        added_np = {
            "text_embeds": rng.standard_normal((2, pooled_dim)).astype(np.float32),
            "time_ids": np.tile(np.asarray([[512, 512, 0, 0, 512, 512]], np.float32), (2, 1)),
        }
        added_j = {k: jnp.asarray(v) for k, v in added_np.items()}

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample), jnp.asarray(timesteps),
        jnp.asarray(context), added_cond_kwargs=added_j,
    )["params"]
    params = _random_tree(params, seed=2)

    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(sample), jnp.asarray(timesteps),
            jnp.asarray(context), added_cond_kwargs=added_j,
        )
    )
    np_params = jax.tree.map(np.asarray, params)
    added_t = {k: T(v) for k, v in added_np.items()} if added_np else None
    want = torch_unet(T(sample), timesteps, T(context), np_params, cfg, added_t).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# SD3 MMDiT (torch, from the SD3 paper's MM-DiT formulation)
# --------------------------------------------------------------------------


def sincos_2d_pos_embed(dim, grid_size):
    """2D sin-cos table: per-axis 1D sinusoids (sin block then cos block),
    height-embedding first — the DiT/ViT convention SD3 inherits."""

    def _1d(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    return np.concatenate([_1d(dim // 2, grid[0]), _1d(dim // 2, grid[1])], axis=1)


def ada_ln_zero(x, temb, p, n_chunks=6):
    emb = dense(F.silu(temb), p["linear"])
    chunks = torch.chunk(emb, n_chunks, dim=-1)
    norm = F.layer_norm(x, x.shape[-1:], eps=1e-6)
    mod = norm * (1 + chunks[1][:, None]) + chunks[0][:, None]
    return (mod,) + chunks[2:]


def ada_ln_continuous(x, temb, p):
    emb = dense(F.silu(temb), p["linear"])
    scale, shift = torch.chunk(emb, 2, dim=-1)
    norm = F.layer_norm(x, x.shape[-1:], eps=1e-6)
    return norm * (1 + scale[:, None]) + shift[:, None]


def mlp_embed(x, p):
    return dense(F.silu(dense(x, p["linear_1"])), p["linear_2"])


def gelu_tanh_ff(x, p):
    h = F.gelu(dense(x, p["net_0"]["proj"]), approximate="tanh")
    return dense(h, p["net_2"])


def torch_mmdit(latents, timestep, context, pooled, params, cfg):
    d = cfg.inner_dim
    p_sz = cfg.patch_size
    B, C, H, W = latents.shape
    gh, gw = H // p_sz, W // p_sz

    x = conv2d(latents, params["pos_embed"]["proj"], stride=p_sz, padding=0)
    x = x.permute(0, 2, 3, 1).reshape(B, gh * gw, d)
    table = sincos_2d_pos_embed(d, cfg.pos_embed_max_size).reshape(
        cfg.pos_embed_max_size, cfg.pos_embed_max_size, d
    )
    top = (cfg.pos_embed_max_size - gh) // 2
    left = (cfg.pos_embed_max_size - gw) // 2
    x = x + torch.from_numpy(
        table[top : top + gh, left : left + gw].reshape(1, gh * gw, d)
    ).float()

    tte = params["time_text_embed"]
    temb = mlp_embed(timestep_embedding(timestep, 256), tte["timestep_embedder"]) + mlp_embed(
        pooled, tte["text_embedder"]
    )
    ctx = dense(context, params["context_embedder"])

    for i in range(cfg.num_layers):
        bp = params[f"transformer_blocks_{i}"]
        pre_only = i == cfg.num_layers - 1
        x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada_ln_zero(x, temb, bp["norm1"])
        if pre_only:
            ctx_mod = ada_ln_continuous(ctx, temb, bp["norm1_context"])
        else:
            ctx_mod, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = ada_ln_zero(
                ctx, temb, bp["norm1_context"]
            )
        a = bp["attn"]
        S = x_mod.shape[1]
        q = torch.cat([dense(x_mod, a["to_q"]), dense(ctx_mod, a["add_q_proj"])], dim=1)
        k = torch.cat([dense(x_mod, a["to_k"]), dense(ctx_mod, a["add_k_proj"])], dim=1)
        v = torch.cat([dense(x_mod, a["to_v"]), dense(ctx_mod, a["add_v_proj"])], dim=1)
        out = attention(q, k, v, cfg.num_attention_heads)
        x_attn, ctx_attn = out[:, :S], out[:, S:]
        x = x + gate_msa[:, None] * dense(x_attn, a["to_out_0"])
        h = F.layer_norm(x, x.shape[-1:], eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * gelu_tanh_ff(h, bp["ff"])
        if not pre_only:
            ctx = ctx + c_gate_msa[:, None] * dense(ctx_attn, a["to_add_out"])
            ch = (
                F.layer_norm(ctx, ctx.shape[-1:], eps=1e-6) * (1 + c_scale_mlp[:, None])
                + c_shift_mlp[:, None]
            )
            ctx = ctx + c_gate_mlp[:, None] * gelu_tanh_ff(ch, bp["ff_context"])

    x = ada_ln_continuous(x, temb, params["norm_out"])
    x = dense(x, params["proj_out"])
    x = x.reshape(B, gh, gw, p_sz, p_sz, cfg.out_channels)
    return torch.einsum("bhwpqc->bchpwq", x).reshape(B, cfg.out_channels, H, W)


def test_mmdit_cross_framework_parity():
    """Flax SD3Transformer2DModel (tiny) vs the independent torch MM-DiT on
    the same random weights — validates the patchify conv, the center-cropped
    2D sin-cos table, AdaLN-zero chunk ORDER (shift, scale, gate...), the
    elementwise-affine-free LayerNorms (eps 1e-6), joint [image, context]
    concatenation order, tanh-approx GELU in the FF, the final-block
    context_pre_only asymmetry, and the unpatchify einsum."""
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel

    cfg = MMDiTConfig.tiny()
    model = SD3Transformer2DModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    latents = rng.standard_normal((2, cfg.in_channels, 8, 8)).astype(np.float32)
    timesteps = np.asarray([17.0, 804.0], np.float32)
    context = rng.standard_normal((2, 5, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.standard_normal((2, cfg.pooled_projection_dim)).astype(np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(latents), jnp.asarray(timesteps),
        jnp.asarray(context), jnp.asarray(pooled),
    )["params"]
    params = _random_tree(params, seed=4)

    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(latents), jnp.asarray(timesteps),
            jnp.asarray(context), jnp.asarray(pooled),
        )
    )
    np_params = jax.tree.map(np.asarray, params)
    want = torch_mmdit(T(latents), T(timesteps), T(context), T(pooled), np_params, cfg).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# Flux (torch, from BFL's released architecture: dual + single stream, RoPE)
# --------------------------------------------------------------------------


def torch_rope(ids, axes_dims, theta=10000.0):
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dims):
        freqs = 1.0 / theta ** (torch.arange(0, d, 2, dtype=torch.float32) / d)
        ang = ids[..., i, None].float() * freqs
        cos_parts.append(torch.repeat_interleave(torch.cos(ang), 2, dim=-1))
        sin_parts.append(torch.repeat_interleave(torch.sin(ang), 2, dim=-1))
    return torch.cat(cos_parts, dim=-1), torch.cat(sin_parts, dim=-1)


def torch_apply_rope(x, cos, sin):
    # x [B,S,H,D]; interleaved-pair rotation
    x1, x2 = x[..., 0::2], x[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).reshape(x.shape)
    return x * cos[:, :, None, :] + rot * sin[:, :, None, :]


def rms_norm(x, p, eps=1e-6):
    var = (x.float() ** 2).mean(dim=-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * T(p["scale"])


def rope_attention(q, k, v, heads, cos, sin):
    """Heads-split + qk already normed; applies RoPE then attention."""
    B, S, C = q.shape
    d = C // heads
    q = torch_apply_rope(q.view(B, S, heads, d), cos, sin).permute(0, 2, 1, 3)
    k = torch_apply_rope(k.view(B, S, heads, d), cos, sin).permute(0, 2, 1, 3)
    v = v.view(B, S, heads, d).permute(0, 2, 1, 3)
    probs = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
    return (probs @ v).permute(0, 2, 1, 3).reshape(B, S, C)


def torch_flux(tokens, timestep, context, pooled, txt_ids, img_ids, params, cfg):
    d = cfg.inner_dim
    heads = cfg.num_attention_heads
    hd = d // heads
    B = tokens.shape[0]
    x = dense(tokens, params["x_embedder"])
    ctx = dense(context, params["context_embedder"])
    tte = params["time_text_embed"]
    temb = mlp_embed(timestep_embedding(timestep * 1000.0, 256), tte["timestep_embedder"]) + mlp_embed(
        pooled, tte["text_embedder"]
    )
    ids = torch.cat([txt_ids, img_ids], dim=0)[None].expand(B, -1, -1)
    cos, sin = torch_rope(ids, cfg.axes_dims_rope)
    Sc = ctx.shape[1]

    def heads_norm(t, p):
        return rms_norm(t.view(B, -1, heads, hd), p).reshape(B, -1, d)

    for i in range(cfg.num_layers):
        bp = params[f"transformer_blocks_{i}"]
        x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada_ln_zero(x, temb, bp["norm1"])
        ctx_mod, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = ada_ln_zero(
            ctx, temb, bp["norm1_context"]
        )
        a = bp["attn"]
        q = torch.cat(
            [heads_norm(dense(ctx_mod, a["add_q_proj"]), a["norm_added_q"]),
             heads_norm(dense(x_mod, a["to_q"]), a["norm_q"])], dim=1)
        k = torch.cat(
            [heads_norm(dense(ctx_mod, a["add_k_proj"]), a["norm_added_k"]),
             heads_norm(dense(x_mod, a["to_k"]), a["norm_k"])], dim=1)
        v = torch.cat([dense(ctx_mod, a["add_v_proj"]), dense(x_mod, a["to_v"])], dim=1)
        out = rope_attention(q, k, v, heads, cos, sin)
        ctx_attn, x_attn = out[:, :Sc], out[:, Sc:]
        x = x + gate_msa[:, None] * dense(x_attn, a["to_out_0"])
        h = F.layer_norm(x, x.shape[-1:], eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = F.gelu(dense(h, bp["ff_net_0_proj"]), approximate="tanh")
        x = x + gate_mlp[:, None] * dense(h, bp["ff_net_2"])
        ctx = ctx + c_gate_msa[:, None] * dense(ctx_attn, a["to_add_out"])
        ch = (
            F.layer_norm(ctx, ctx.shape[-1:], eps=1e-6) * (1 + c_scale_mlp[:, None])
            + c_shift_mlp[:, None]
        )
        ch = F.gelu(dense(ch, bp["ff_context_net_0_proj"]), approximate="tanh")
        ctx = ctx + c_gate_mlp[:, None] * dense(ch, bp["ff_context_net_2"])

    combined = torch.cat([ctx, x], dim=1)
    for i in range(cfg.num_single_layers):
        bp = params[f"single_transformer_blocks_{i}"]
        emb = dense(F.silu(temb), bp["norm_linear"])
        shift, scale, gate = torch.chunk(emb, 3, dim=-1)
        normed = F.layer_norm(combined, combined.shape[-1:], eps=1e-6)
        normed = normed * (1 + scale[:, None]) + shift[:, None]
        mlp = F.gelu(dense(normed, bp["proj_mlp"]), approximate="tanh")
        q = heads_norm(dense(normed, bp["attn_to_q"]), bp["attn_norm_q"])
        k = heads_norm(dense(normed, bp["attn_to_k"]), bp["attn_norm_k"])
        v = dense(normed, bp["attn_to_v"])
        attn = rope_attention(q, k, v, heads, cos, sin)
        combined = combined + gate[:, None] * dense(torch.cat([attn, mlp], dim=-1), bp["proj_out"])
    x = combined[:, Sc:]

    x = ada_ln_continuous(x, temb, params["norm_out"])
    return dense(x, params["proj_out"])


def test_flux_cross_framework_parity():
    """Flax FluxTransformer2DModel (tiny: 2 dual + 2 single blocks) vs the
    independent torch Flux on the same random weights — validates the
    [text, image] concatenation order (opposite of SD3), interleaved-pair
    RoPE over (const, row, col) axes, qk-RMSNorm placement (before RoPE),
    the single-block parallel attention+MLP with fused proj_out, the ×1000
    timestep scaling, and AdaLN-zero chunking."""
    from sliders_conceptmod_tpu.models.flux import (
        FluxConfig,
        FluxTransformer2DModel,
        prepare_latent_image_ids,
    )

    cfg = FluxConfig.tiny()
    model = FluxTransformer2DModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    gh = gw = 4
    tokens = rng.standard_normal((2, gh * gw, cfg.in_channels)).astype(np.float32)
    timesteps = np.asarray([0.25, 0.9], np.float32)
    context = rng.standard_normal((2, 6, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.standard_normal((2, cfg.pooled_projection_dim)).astype(np.float32)
    img_ids = prepare_latent_image_ids(gh, gw)
    txt_ids = np.zeros((6, 3), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(timesteps),
        jnp.asarray(context), jnp.asarray(pooled), jnp.asarray(txt_ids), jnp.asarray(img_ids),
    )["params"]
    params = _random_tree(params, seed=6)

    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(tokens), jnp.asarray(timesteps),
            jnp.asarray(context), jnp.asarray(pooled), jnp.asarray(txt_ids), jnp.asarray(img_ids),
        )
    )
    np_params = jax.tree.map(np.asarray, params)
    want = torch_flux(
        T(tokens), T(timesteps), T(context), T(pooled), T(txt_ids), T(img_ids), np_params, cfg
    ).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# Stable Cascade Stage-C prior (torch, from the Wuerstchen Stage-C
# architecture: depthwise-conv ResBlocks with ConvNeXt-v2 GRN, FiLM
# timestep-ratio blocks, self+cross attention against the mapped CLIP
# sequence) — VERDICT r4 task 4: the last backbone without an external
# numerics anchor (the reference loads it from diffusers,
# model_util.py:139-156).
# --------------------------------------------------------------------------


def cl_norm(x):
    """Channels-last LayerNorm, no affine, eps 1e-6 (Stage-C uses this
    everywhere in place of GroupNorm)."""
    return F.layer_norm(x, x.shape[-1:], eps=1e-6)


def conv_cl(x, p, stride=1, padding=0, groups=1):
    """Conv over a channels-last input (the torch impl keeps NHWC like the
    conditioning math; convs hop through NCHW)."""
    w = T(p["kernel"]).permute(3, 2, 0, 1)
    y = F.conv2d(
        x.permute(0, 3, 1, 2), w, T(p["bias"]), stride=stride, padding=padding, groups=groups
    )
    return y.permute(0, 2, 3, 1)


def cascade_ratio_embedding(r, dim, max_positions=10000):
    """Sinusoidal embedding of the [0,1] timestep RATIO (not an integer t):
    r is scaled by max_positions first, [sin | cos], no flip."""
    r = r.float() * max_positions
    half = dim // 2
    freqs = torch.exp(
        -np.log(max_positions) * torch.arange(half, dtype=torch.float32) / (half - 1)
    )
    ang = r[:, None] * freqs[None, :]
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=1)


def cascade_grn(x, p):
    """ConvNeXt-v2 Global Response Norm over channels-last feature maps."""
    agg = torch.sqrt(torch.sum(x * x, dim=(1, 2), keepdim=True))
    stand = agg / (agg.mean(dim=-1, keepdim=True) + 1e-6)
    return T(p["gamma"]) * (x * stand) + T(p["beta"]) + x


def cascade_resblock(x, p, skip=None):
    c = x.shape[-1]
    h = conv_cl(x, p["depthwise"], padding=1, groups=c)
    h = cl_norm(h)
    if skip is not None:
        h = torch.cat([h, skip], dim=-1)
    h = dense(h, p["channelwise_0"])
    h = F.gelu(h)  # exact (erf) gelu
    h = cascade_grn(h, p["channelwise_2"])
    return dense(h, p["channelwise_4"]) + x


def cascade_timestep_block(x, r_embed, p, conds=("sca", "crp")):
    """FiLM x*(1+a)+b with one extra mapper per auxiliary condition whose
    (a, b) are summed in."""
    chunks = torch.chunk(r_embed, 1 + len(conds), dim=1)
    a, b = torch.chunk(dense(chunks[0], p["mapper"]), 2, dim=1)
    for i, cname in enumerate(conds):
        ac, bc = torch.chunk(dense(chunks[i + 1], p[f"mapper_{cname}"]), 2, dim=1)
        a, b = a + ac, b + bc
    return x * (1 + a[:, None, None, :]) + b[:, None, None, :]


def cascade_attn_block(x, clip, p, heads):
    """norm -> attention with KV = [image tokens (self), mapped CLIP seq]."""
    B, H, W, C = x.shape
    kv_cond = dense(F.silu(clip), p["kv_mapper_1"])
    tokens = cl_norm(x).reshape(B, H * W, C)
    kv = torch.cat([tokens, kv_cond], dim=1)
    ap = p["attention"]
    out = attention(dense(tokens, ap["to_q"]), dense(kv, ap["to_k"]), dense(kv, ap["to_v"]), heads)
    return x + dense(out, ap["to_out_0"]).reshape(B, H, W, C)


def torch_cascade_forward(x, r, clip_text, clip_text_pooled, clip_img, params, cfg):
    conds = tuple(cfg.timestep_conditioning_type)
    dim = cfg.timestep_ratio_embedding_dim
    r_embed = torch.cat(
        [cascade_ratio_embedding(r, dim)]
        + [cascade_ratio_embedding(torch.zeros_like(r), dim) for _ in conds],
        dim=1,
    )
    B = x.shape[0]
    d = cfg.conditioning_dim
    txt = dense(clip_text, params["clip_txt_mapper"])
    pooled = dense(clip_text_pooled, params["clip_txt_pooled_mapper"]).reshape(
        B, clip_text_pooled.shape[1] * cfg.clip_seq, d
    )
    img = dense(clip_img, params["clip_img_mapper"]).reshape(
        B, clip_img.shape[1] * cfg.clip_seq, d
    )
    clip = cl_norm(torch.cat([txt, pooled, img], dim=1))

    h = x.permute(0, 2, 3, 1)  # NHWC, like the flax internals
    h = conv_cl(h, params["embedding_1"])
    h = cl_norm(h)

    level_outputs = []
    for i, c in enumerate(cfg.block_out_channels):
        if i > 0:
            h = cl_norm(h)
            h = conv_cl(h, params[f"down_downscalers_{i}_1"], stride=2)
        j = 0
        for _ in range(cfg.down_num_layers_per_block[i]):
            h = cascade_resblock(h, params[f"down_blocks_{i}_{j}"])
            h = cascade_timestep_block(h, r_embed, params[f"down_blocks_{i}_{j + 1}"], conds)
            h = cascade_attn_block(
                h, clip, params[f"down_blocks_{i}_{j + 2}"], cfg.num_attention_heads[i]
            )
            j += 3
        level_outputs.insert(0, h)

    h = level_outputs[0]
    n = len(cfg.block_out_channels)
    for gi in range(n):
        level = n - 1 - gi
        j = 0
        for layer in range(cfg.up_num_layers_per_block[gi]):
            skip = level_outputs[gi] if layer == 0 and gi > 0 else None
            h = cascade_resblock(h, params[f"up_blocks_{gi}_{j}"], skip)
            h = cascade_timestep_block(h, r_embed, params[f"up_blocks_{gi}_{j + 1}"], conds)
            h = cascade_attn_block(
                h, clip, params[f"up_blocks_{gi}_{j + 2}"], cfg.num_attention_heads[level]
            )
            j += 3
        if level > 0:
            h = cl_norm(h)
            p = params[f"up_upscalers_{gi}_1"]
            # flax ConvTranspose kernel [kh,kw,in,out] -> torch [in,out,kh,kw]
            # with the spatial flip (inverse of convert_cascade_state_dict,
            # whose torch->flax direction is verified exact in
            # tests/test_cascade.py::test_conv_transpose_conversion_matches_torch)
            w = T(np.transpose(np.asarray(p["kernel"])[::-1, ::-1], (2, 3, 0, 1)).copy())
            y = F.conv_transpose2d(h.permute(0, 3, 1, 2), w, T(p["bias"]), stride=2)
            h = y.permute(0, 2, 3, 1)
    h = cl_norm(h)
    out = conv_cl(h, params["clf_1"])
    return out.permute(0, 3, 1, 2)


def test_cascade_cross_framework_parity():
    """Flax StableCascadeUNet (Stage-C prior) vs the independent torch
    implementation above on the same random weights — validates the ratio
    embedding scale (r*10000, sin|cos order), the no-affine 1e-6 LayerNorms,
    GRN aggregation axes and eps, FiLM chunk order and aux-cond summing, the
    self+cross KV concat order, the k2/s2 VALID down/up-scalers (incl. the
    ConvTranspose kernel flip), and the skip-concat placement."""
    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet

    cfg = CascadeConfig.tiny()
    model = StableCascadeUNet(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cfg.in_channels, 6, 6)).astype(np.float32)
    r = np.asarray([0.25, 0.8], np.float32)
    clip_text = rng.standard_normal((2, 5, cfg.clip_text_in_channels)).astype(np.float32)
    clip_pooled = rng.standard_normal((2, 1, cfg.clip_text_pooled_in_channels)).astype(np.float32)
    clip_img = rng.standard_normal((2, 1, cfg.clip_image_in_channels)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (x, r, clip_text, clip_pooled, clip_img))
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    # break init symmetry: zero-init biases / GRN affines would hide
    # transpose, chunk-order, and affine bugs
    leaves = jax.tree.leaves(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree.unflatten(
        jax.tree.structure(params),
        [0.1 * jax.random.normal(k, l.shape, jnp.float32) for k, l in zip(keys, leaves)],
    )
    got = np.asarray(model.apply({"params": params}, *args))
    np_params = jax.tree.map(np.asarray, params)
    want = torch_cascade_forward(
        T(x), T(r), T(clip_text), T(clip_pooled), T(clip_img), np_params, cfg
    ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
