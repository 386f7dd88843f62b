"""Ring attention: sequence parallelism over the mesh data axis.

The reference is single-GPU and caps attention sequence length at whatever
one device can hold (SURVEY §2.2 absence inventory). This is the TPU-native
answer for sequences past one chip's HBM/VMEM (Flux at high resolution,
video-length token streams): shard the SEQUENCE over the mesh, keep each query
block resident, and rotate K/V blocks around the ring with ``ppermute`` while
accumulating an online softmax — the standard ring-attention schedule
(Liu et al., arXiv 2310.01889) expressed as jax ``shard_map`` + XLA
collectives riding ICI.

Numerics: identical to full softmax attention (the online (m, l, acc)
accumulation is exact, not an approximation) — validated against the dense
reference on the CPU mesh in tests/test_ring_attention.py.

Layout: [batch, seq, heads, head_dim] (BSHD), matching ops/attention.py.
The inner per-(q-block, kv-block) product uses plain jnp so it lowers on any
backend; on TPU, XLA fuses it per shard, and the Pallas kernel can be slotted
into ``_block_attn`` for kv blocks long enough to be HBM-bound.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sliders_conceptmod_tpu.parallel.mesh import DATA_AXIS

_NEG_INF = -1e30


def _block_attn(q, k, v, scale):
    """Unnormalized block attention: returns (acc, m, l) for online softmax.

    q: [B, Sq, H, D]; k/v: [B, Sk, H, D] →
    acc: [B, Sq, H, D] (sum of exp(logits - m)·v), m/l: [B, H, Sq]
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k).astype(jnp.float32)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(jnp.float32)
    return acc, m, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    scale: Optional[float] = None,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Bidirectional (no-mask) attention with q/k/v sequence-sharded over
    ``axis_name``. Returns output with the same sharding as ``q``.

    Each device holds one query block permanently; K/V blocks travel the
    ring (``ppermute`` by +1 each step, n_devices steps total), so peak
    memory per device is O(S/n) and the collective traffic rides neighbor
    ICI links instead of all-to-all.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    n = mesh.shape[axis_name]
    spec = P(None, axis_name, None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def _ring(q_blk, k_blk, v_blk):
        B, Sq, H, D = q_blk.shape
        # pcast-to-varying: the init carries must be marked device-varying to match the
        # loop outputs under shard_map's varying-manual-axes tracking
        acc0 = jax.lax.pcast(jnp.zeros((B, Sq, H, D), jnp.float32), axis_name, to='varying')
        m0 = jax.lax.pcast(jnp.full((B, H, Sq), _NEG_INF, jnp.float32), axis_name, to='varying')
        l0 = jax.lax.pcast(jnp.zeros((B, H, Sq), jnp.float32), axis_name, to='varying')
        perm = [(i, (i + 1) % n) for i in range(n)]

        def body(_, carry):
            acc, m, l, kc, vc = carry
            a_new, m_new, l_new = _block_attn(q_blk, kc, vc, scale)
            m_next = jnp.maximum(m, m_new)
            corr_old = jnp.exp(m - m_next)
            corr_new = jnp.exp(m_new - m_next)
            # [B,H,Sq] gains broadcast over the value dim as [B,Sq,H,1]
            to_bqh1 = lambda x: jnp.transpose(x, (0, 2, 1))[..., None]
            acc = acc * to_bqh1(corr_old) + a_new * to_bqh1(corr_new)
            l = l * corr_old + l_new * corr_new
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            return acc, m_next, l, kc, vc

        acc, m, l, _, _ = jax.lax.fori_loop(0, n, body, (acc0, m0, l0, k_blk, v_blk))
        out = acc / jnp.transpose(l, (0, 2, 1))[..., None]
        return out.astype(q_blk.dtype)

    return _ring(q, k, v)
