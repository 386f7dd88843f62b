"""Weightless (random-init) factory paths must store params at weight_dtype.

Regression guard for the r2 HBM bug: Flax ``model.init`` returns fp32
params regardless of the module's computation dtype, so any weightless
branch that skips the fused init+cast ships a double-size tree (SD3-Medium:
8.1GB fp32 vs 4.06GB bf16 — enough to OOM the generate_images_sd3 sweep,
which holds base + merged trees simultaneously on a 16GB v5e).
"""

import jax.numpy as jnp

from sliders_conceptmod_tpu.models import factory


def _leaf_dtypes(tree):
    out = set()

    def walk(t):
        for v in t.values():
            if isinstance(v, dict):
                walk(v)
            else:
                out.add(jnp.dtype(v.dtype))

    walk(tree)
    return out


BF16 = {jnp.dtype(jnp.bfloat16)}


def test_sd3_weightless_params_at_weight_dtype():
    _, tes, transformer, _ = factory.load_models_sd3("tiny-sd3", weight_dtype=jnp.bfloat16)
    assert _leaf_dtypes(transformer.params) == BF16
    for te in tes:
        assert _leaf_dtypes(te.params) == BF16


def test_flux_weightless_params_at_weight_dtype():
    _, _, transformer, _ = factory.load_models_flux("tiny-flux", weight_dtype=jnp.bfloat16)
    assert _leaf_dtypes(transformer.params) == BF16


def test_vae_weightless_params_at_weight_dtype():
    vae = factory._load_or_init_vae("tiny-weightless", "sd3", jnp.bfloat16)
    assert _leaf_dtypes(vae.params) == BF16
