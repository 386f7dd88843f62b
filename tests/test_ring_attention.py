"""Ring attention (sequence parallelism) vs dense attention — exact-softmax
equivalence on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sliders_conceptmod_tpu.ops.attention import _xla_attention
from sliders_conceptmod_tpu.parallel import mesh as mesh_lib
from sliders_conceptmod_tpu.parallel.ring_attention import ring_attention


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_matches_dense():
    m = mesh_lib.make_mesh(data=8, model=1)
    B, S, H, D = 2, 8 * 16, 3, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, D)) * 0.3
    k = jax.random.normal(kk, (B, S, H, D)) * 0.3
    v = jax.random.normal(kv, (B, S, H, D))

    expected = np.asarray(_xla_attention(q, k, v, D**-0.5))

    spec = NamedSharding(m, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    with m:
        out = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh=m))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_uneven_heads_and_scale():
    m = mesh_lib.make_mesh(data=8, model=1)
    B, S, H, D = 1, 8 * 4, 5, 8
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (B, S, H, D))
    k = jax.random.normal(kk, (B, S, H, D))
    v = jax.random.normal(kv, (B, S, H, D))
    expected = np.asarray(_xla_attention(q * 0.5 * jnp.sqrt(D), k, v, D**-0.5))
    # explicit non-default scale
    spec = NamedSharding(m, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    with m:
        out = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh=m, scale=0.5))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_gradients_match_dense():
    m = mesh_lib.make_mesh(data=8, model=1)
    B, S, H, D = 1, 8 * 8, 2, 8
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(kq, (B, S, H, D)) * 0.3
    k = jax.random.normal(kk, (B, S, H, D)) * 0.3
    v = jax.random.normal(kv, (B, S, H, D))
    ct = jax.random.normal(kg, (B, S, H, D))

    def dense_loss(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, D**-0.5) * ct)

    expected = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)

    spec = NamedSharding(m, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    cts = jax.device_put(ct, spec)

    def ring_loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=m) * cts)

    with m:
        got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for e, g in zip(expected, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=3e-5, rtol=3e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sequence_parallel_context_routes_model_attention():
    """ops.attention.sequence_parallel reroutes the MMDiT joint self-attention
    (16 image + 16 context tokens = 32, divisible by 8) through ring attention
    and reproduces the dense forward exactly; cross-attention-shaped calls and
    indivisible sequences stay local (the fallback below still matches)."""
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
    from sliders_conceptmod_tpu.ops import attention as attn_lib

    cfg = MMDiTConfig.tiny()
    model = SD3Transformer2DModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.in_channels, 8, 8)) * 0.2
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.joint_attention_dim)) * 0.2
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.pooled_projection_dim)) * 0.2
    t = jnp.full((2,), 500.0)
    params = model.init(jax.random.PRNGKey(3), x, t, ctx, pooled)["params"]

    dense = np.asarray(model.apply({"params": params}, x, t, ctx, pooled))

    m = mesh_lib.make_mesh(data=8, model=1)
    with attn_lib.sequence_parallel(m, min_seq=8):
        ringed = jax.jit(lambda p, *a: model.apply({"params": p}, *a))(params, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(ringed), dense, atol=3e-5, rtol=3e-5)

    # context inactive after exit: plain dispatch again
    assert attn_lib._SP_CTX is None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sequence_parallel_from_config():
    from sliders_conceptmod_tpu.core.config import TPUConfig
    from sliders_conceptmod_tpu.ops import attention as attn_lib

    off = attn_lib.sequence_parallel_from_config(TPUConfig())
    with off:
        assert attn_lib._SP_CTX is None  # nullcontext — no routing

    on_cfg = TPUConfig(sequence_parallel=True, sp_min_seq=16, mesh_data=8, mesh_model=1)
    with attn_lib.sequence_parallel_from_config(on_cfg):
        mesh, axis, min_seq = attn_lib._SP_CTX
        assert axis == "data" and min_seq == 16 and mesh.shape["data"] == 8
    assert attn_lib._SP_CTX is None


def test_sequence_parallel_composes_with_quantized_base():
    """Ring attention (SP context) over an int8-quantized MMDiT matches the
    quantized dense forward — the interceptor dequant and the shard_map ring
    compose (tpu.sequence_parallel + tpu.quantize_base)."""
    from sliders_conceptmod_tpu.adapters import quant
    from sliders_conceptmod_tpu.models.mmdit import MMDiTConfig, SD3Transformer2DModel
    from sliders_conceptmod_tpu.ops import attention as attn_lib

    cfg = MMDiTConfig.tiny()
    model = SD3Transformer2DModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.in_channels, 8, 8)) * 0.2
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.joint_attention_dim)) * 0.2
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.pooled_projection_dim)) * 0.2
    t = jnp.full((2,), 500.0)
    params = model.init(jax.random.PRNGKey(3), x, t, ctx, pooled)["params"]
    qtree, scales = quant.quantize_params(params, min_elems=1)
    q_apply = quant.make_quant_apply(model, scales, compute_dtype=jnp.float32)

    dense_q = np.asarray(q_apply(qtree, x, t, ctx, pooled))

    m = mesh_lib.make_mesh(data=8, model=1)
    with attn_lib.sequence_parallel(m, min_seq=8):
        ringed_q = jax.jit(q_apply)(qtree, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(ringed_q), dense_q, atol=3e-5, rtol=3e-5)
