"""Tensor parallelism over the `model` mesh axis.

Flux-schnell's 12B params (≈24GB bf16) exceed one v5e's HBM — the `model`
axis exists for exactly that (SURVEY §2.2 TP row). This validates the
mechanism end-to-end on the virtual CPU mesh: shard every matmul weight's
output dim over `model`, jit the forward, and require numerical agreement
with replicated execution (XLA inserts the collectives from the shardings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sliders_conceptmod_tpu.models import flux
from sliders_conceptmod_tpu.parallel import mesh as mesh_lib


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_flux_forward_matches_under_model_sharding():
    cfg = flux.FluxConfig.tiny()
    model = flux.FluxTransformer2DModel(cfg)
    gh = gw = 4
    txt = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (1, gh * gw, cfg.in_channels)) * 0.1
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, txt, 32)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 32)) * 0.1
    txt_ids = jnp.zeros((txt, 3))
    img_ids = jnp.asarray(flux.prepare_latent_image_ids(gh, gw))
    params = model.init(jax.random.PRNGKey(3), x, jnp.asarray([0.5]), ctx, pooled, txt_ids, img_ids)[
        "params"
    ]

    def apply(p):
        return model.apply({"params": p}, x, jnp.asarray([0.5]), ctx, pooled, txt_ids, img_ids)

    expected = np.asarray(apply(params))

    m = mesh_lib.make_mesh(data=1, model=8)

    def shard_rule(path_leaf):
        arr = path_leaf
        # matmul kernels shard their output (last) dim when divisible
        if arr.ndim == 2 and arr.shape[-1] % 8 == 0:
            return NamedSharding(m, P(None, "model"))
        if arr.ndim == 1 and arr.shape[0] % 8 == 0:
            return NamedSharding(m, P("model"))
        return NamedSharding(m, P())

    with m:
        sharded = jax.tree.map(lambda a: jax.device_put(a, shard_rule(a)), params)
        out = jax.jit(apply)(sharded)
        got = np.asarray(out)

    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)
