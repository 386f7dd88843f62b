"""Flash-attention kernel vs plain XLA attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.ops.flash_attention import flash_attention


def ref_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)).astype(q.dtype)


SHAPES = [
    # (B, Sq, Sk, H, D) — self-attn square, cross-attn with 77-token context
    (2, 256, 256, 2, 64),
    (1, 300, 77, 2, 64),  # exercises both q and k padding
    (1, 640, 640, 1, 64),  # multiple q/k blocks (block=512)
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape):
    b, sq, sk, h, d = shape
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, sk, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, sk, h, d), dtype=jnp.float32)
    scale = d**-0.5

    out = flash_attention(q, k, v, scale=scale, interpret=True)
    ref = ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_backward_matches_xla():
    b, sq, sk, h, d = 1, 256, 77, 2, 64
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, sk, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, sk, h, d), dtype=jnp.float32)
    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4)


def test_bf16_forward_close():
    b, sq, sk, h, d = 1, 512, 512, 2, 64
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=jnp.bfloat16)
    k = jax.random.normal(kk, (b, sk, h, d), dtype=jnp.bfloat16)
    v = jax.random.normal(kv, (b, sk, h, d), dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = ref_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), d**-0.5)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_kgrid_variant_matches_xla():
    """The alternate fully-blocked kernel stays correct (kept for
    unbounded-sequence work; see its module docstring)."""
    from sliders_conceptmod_tpu.ops.flash_attention_kgrid import flash_attention as kgrid

    b, sq, sk, h, d = 1, 300, 77, 2, 64
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, sk, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, sk, h, d), dtype=jnp.float32)
    out = kgrid(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_attention(q, k, v, d**-0.5)), atol=2e-5, rtol=2e-5
    )
    g = jax.grad(lambda a, b_, c: jnp.sum(kgrid(a, b_, c, interpret=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b_, c: jnp.sum(ref_attention(a, b_, c, d**-0.5) ** 2), argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(g, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4, rtol=5e-4)


def test_headdim_padding_equivalence():
    """Zero-padding head_dim (SD1.5's 40/80 dims) must not change results:
    padded q·k dims add 0 to scores; padded V columns slice off."""
    b, s, h, d = 1, 256, 2, 40
    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    scale = d**-0.5
    pad = ((0, 0), (0, 0), (0, 0), (0, 64 - d))
    out_pad = flash_attention(
        jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), scale=scale, interpret=True
    )[..., :d]
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(ref_attention(q, k, v, scale)), atol=2e-5, rtol=2e-5
    )
