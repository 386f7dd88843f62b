"""Single-file checkpoint loading through models/factory.py.

The loaders' tiny-family escape (filename containing "tiny") keeps the
reference's ``from_single_file`` surface (model_util.py:37-109, :387-403)
drivable on CPU: export the deterministic weightless family to a single
file, reload it through the factory, and require identical params and
identical forward outputs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.io import ldm_export as le
from sliders_conceptmod_tpu.models import factory


def _trees_equal(a, b):
    from jax.tree_util import keystr, tree_flatten_with_path

    ea = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(a)[0]}
    eb = {keystr(p): np.asarray(v) for p, v in tree_flatten_with_path(b)[0]}
    assert set(ea) == set(eb), (sorted(set(ea) - set(eb))[:4], sorted(set(eb) - set(ea))[:4])
    for k in ea:
        np.testing.assert_array_equal(ea[k], eb[k], err_msg=k)


def test_sd_single_file_reload_matches_family(tmp_path):
    tok, te, unet, sched = factory.load_models("tiny")
    path = str(tmp_path / "tiny-sd2.safetensors")
    le.save_ldm_checkpoint(path, le.export_ldm_checkpoint(unet.params, te.params, v2=True))

    tok2, te2, unet2, sched2 = factory.load_models(path, v2=True)
    _trees_equal(unet.params, unet2.params)
    _trees_equal(te.params, te2.params)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32)) * 0.1
    out1 = unet.apply_fn()(unet.params, x, jnp.asarray([3.0]), ctx)
    out2 = unet2.apply_fn()(unet2.params, x, jnp.asarray([3.0]), ctx)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_xl_single_file_reload_matches_family(tmp_path):
    toks, tes, unet, sched = factory.load_models_xl("tiny-xl")
    path = str(tmp_path / "tiny-xl.safetensors")
    le.save_ldm_checkpoint(
        path, le.export_sdxl_checkpoint(unet.params, tes[0].params, tes[1].params)
    )

    toks2, tes2, unet2, sched2 = factory.load_models_xl(path)
    _trees_equal(unet.params, unet2.params)
    _trees_equal(tes[0].params, tes2[0].params)
    _trees_equal(tes[1].params, tes2[1].params)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32)) * 0.1
    added = {
        "text_embeds": jnp.zeros((1, 32), jnp.float32),
        "time_ids": jnp.zeros((1, 6), jnp.float32),
    }
    out1 = unet.apply_fn()(unet.params, x, jnp.asarray([3.0]), ctx, added_cond_kwargs=added)
    out2 = unet2.apply_fn()(unet2.params, x, jnp.asarray([3.0]), ctx, added_cond_kwargs=added)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_sd3_single_file_reload_matches_family(tmp_path):
    toks, tes, tr, sched = factory.load_models_sd3("tiny-sd3")
    path = str(tmp_path / "tiny-sd3.safetensors")
    le.save_ldm_checkpoint(
        path, le.export_sd3_checkpoint(tr.params, tes[0].params, tes[1].params)
    )
    toks2, tes2, tr2, sched2 = factory.load_models_sd3(path)
    _trees_equal(tr.params, tr2.params)
    _trees_equal(tes[0].params, tes2[0].params)
    _trees_equal(tes[1].params, tes2[1].params)


def test_flux_single_file_reload_matches_family(tmp_path):
    toks, enc, tr, sched = factory.load_models_flux("tiny-flux")
    path = str(tmp_path / "tiny-flux.safetensors")
    le.save_ldm_checkpoint(path, le.export_flux_bfl(tr.params))
    toks2, enc2, tr2, sched2 = factory.load_models_flux(path)
    _trees_equal(tr.params, tr2.params)
