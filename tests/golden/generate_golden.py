"""Regenerate the golden structural fixtures (param key sets + shapes per
model family). Run after any *deliberate* architecture change:

    PYTHONPATH= JAX_PLATFORMS=cpu python tests/golden/generate_golden.py

Purpose (VERDICT r1 item 9): real-checkpoint numerical parity for UNet/VAE is
environment-blocked (no diffusers assets, zero egress), so the structures the
converters in io/ were built against are pinned here — any refactor that
would break real-weight loading fails in CI now, not when weights appear.
Everything is jax.eval_shape'd: no FLOPs, full-scale configs included.
"""

from __future__ import annotations

import json
import os
import sys


def family_shapes():
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.models.cascade import CascadeConfig, StableCascadeUNet
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from sliders_conceptmod_tpu.models.flux import FluxConfig, FluxTransformer2DModel
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
    from sliders_conceptmod_tpu.models.unet import UNet2DConditionModel, UNetConfig
    from sliders_conceptmod_tpu.models.vae import AutoencoderKL, VAEConfig

    def shapes_of(init_thunk):
        variables = jax.eval_shape(init_thunk)
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): list(leaf.shape)
            for path, leaf in flat
        }

    out = {}
    rng = jax.random.PRNGKey(0)

    for name, cfg, sample, extra in [
        ("unet_sd15", UNetConfig.sd15(), (1, 4, 8, 8), dict(ctx=768, pooled=None)),
        ("unet_sd21", UNetConfig.sd21(), (1, 4, 8, 8), dict(ctx=1024, pooled=None)),
        ("unet_sdxl", UNetConfig.sdxl(), (1, 4, 8, 8), dict(ctx=2048, pooled=1280)),
    ]:
        model = UNet2DConditionModel(cfg)
        added = (
            None
            if extra["pooled"] is None
            else {
                "text_embeds": jnp.zeros((1, extra["pooled"])),
                "time_ids": jnp.zeros((1, 6)),
            }
        )
        out[name] = shapes_of(
            lambda model=model, sample=sample, extra=extra, added=added: model.init(
                rng,
                jnp.zeros(sample),
                jnp.zeros((1,)),
                jnp.zeros((1, 7, extra["ctx"])),
                added_cond_kwargs=added,
            )
        )

    for name, cfg in [("vae_sd", VAEConfig.sd()), ("vae_sdxl", VAEConfig.sdxl()), ("vae_sd3", VAEConfig.sd3())]:
        model = AutoencoderKL(cfg)
        out[name] = shapes_of(lambda model=model: model.init(rng, jnp.zeros((1, 3, 32, 32))))

    for name, cfg in [
        ("clip_sd15_te", CLIPTextConfig.sd15_te()),
        ("clip_sd2_te", CLIPTextConfig.sd2_te()),
        ("clip_sdxl_te1", CLIPTextConfig.sdxl_te1()),
        ("clip_sdxl_te2", CLIPTextConfig.sdxl_te2()),
    ]:
        model = CLIPTextEncoder(cfg)
        out[name] = shapes_of(
            lambda model=model: model.init(rng, jnp.zeros((1, 77), jnp.int32))
        )

    mm = SD3Transformer2DModel(MMDiTConfig.sd3_medium())
    out["mmdit_sd3_medium"] = shapes_of(
        lambda: mm.init(
            rng,
            jnp.zeros((1, 16, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((1, 154, MMDiTConfig.sd3_medium().joint_attention_dim)),
            jnp.zeros((1, MMDiTConfig.sd3_medium().pooled_projection_dim)),
        )
    )

    fx_cfg = FluxConfig.schnell()
    fx = FluxTransformer2DModel(fx_cfg)
    out["flux_schnell"] = shapes_of(
        lambda: fx.init(
            rng,
            jnp.zeros((1, 16, fx_cfg.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 8, fx_cfg.joint_attention_dim)),
            jnp.zeros((1, fx_cfg.pooled_projection_dim)),
            jnp.zeros((8, 3)),
            jnp.zeros((16, 3)),
        )
    )

    cs_cfg = CascadeConfig.prior()
    cs = StableCascadeUNet(cs_cfg)
    out["cascade_prior"] = shapes_of(
        lambda: cs.init(
            rng,
            jnp.zeros((1, cs_cfg.in_channels, 12, 12)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, cs_cfg.clip_text_in_channels)),
            jnp.zeros((1, 1, cs_cfg.clip_text_pooled_in_channels)),
            jnp.zeros((1, 1, cs_cfg.clip_image_in_channels)),
        )
    )
    return out


GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "model_structures.json")

if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    data = family_shapes()
    with open(GOLDEN_PATH, "w") as f:
        json.dump(data, f, indent=0, sort_keys=True)
    counts = {k: len(v) for k, v in data.items()}
    print(json.dumps(counts, indent=2))
    sys.exit(0)
