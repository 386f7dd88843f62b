"""Fully-blocked flash-attention variant (grid (bh, q, k) + scratch carry).

STATUS: functional and validated on v5e up to 16384×512, but measured ~7%
slower END-TO-END than the staged-KV kernel in flash_attention.py within its
VMEM range (1.20 vs 1.29 steps/s at 1024px SDXL training), and slower than
XLA fused attention at 16k×512 — so the dispatch (ops/attention.py) uses the
staged kernel where it fits and XLA elsewhere. Kept as the starting point
for unbounded-sequence work (ring/context-parallel extensions) next round.


TPU-native replacement for the reference's xformers memory-efficient
attention (the only native-perf dependency of the reference hot path;
reference ``conceptmod/textsliders/train_lora_xl.py:83-84``,
``config_util.py:59-60``). UNet self/cross attention is unmasked, so no
causal machinery is needed; CLIP (77 tokens) stays on the XLA path.

Algorithm: FlashAttention-2 online softmax with a fully blocked grid —
``(batch·heads, q_blocks, k_blocks)`` with the K axis innermost. K/V arrive
one block at a time via BlockSpec pipelining (double-buffered DMA by the
Pallas runtime), and the running (max, sum, acc) state lives in VMEM scratch
that persists across the K iterations of one (bh, q) cell. Nothing O(S²)
touches HBM and VMEM usage is O(block²), so sequence length is unbounded
(16k+ tokens — 1024px VAE attention — included; the previous full-KV-staging
variant OOMed scoped VMEM there). Backward uses the standard two-kernel
split (dQ with K innermost; dK/dV with Q innermost) on recomputed
probabilities from the saved logsumexp.

Layout: public API is BSHD ``[batch, seq, heads, head_dim]``; internally
folded to ``[batch*heads, seq, head_dim]``. Sequences pad to block
multiples; padded keys are masked in-kernel, padded queries are masked in
the dK/dV kernel and sliced off outside. The row statistics (lse, delta)
are stored lane-replicated ``[BH, Sq, 128]`` — TPU tiling rejects (1, bq)
2D blocks and dynamic single-lane column stores; the redundancy is ~1% of
the QKV traffic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30  # large-but-finite: exp(NEG_INF - lse) is an exact 0, no NaNs


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fold(x):
    """[B, S, H, D] -> [B*H, S, D]"""
    b, s, h, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)


def _unfold(x3, b, h):
    bh, s, d = x3.shape
    return jnp.transpose(x3.reshape(b, h, s, d), (0, 2, 1, 3))


def _pad_seq(x, target):
    pad = target - x.shape[1]
    return x if pad == 0 else jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


# ---------------------------------------------------------------------------
# forward: grid (bh, q_blocks, k_blocks), K innermost
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, block_k, kv_len, scale):
    """Blocks: q (1,bq,d) / k,v (1,bk,d) / o (1,bq,d) / lse (1,bq,128).
    Scratch (m, l, acc) persists across the innermost K grid dimension."""
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale
    bq = q.shape[0]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + ki * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(jnp.max(s, axis=-1, keepdims=True), m_prev.shape))
    p = jnp.exp(s - m_new[:, :1])
    corr = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * corr + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
    )
    acc_scr[...] = acc_scr[...] * corr[:, :1] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _():
        l = l_scr[...][:, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(l_scr[...])


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, block_k, kv_len, scale):
    """grid (bh, q_blocks, k_blocks): accumulate dq in scratch over K."""
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    bq = q.shape[0]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + ki * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)  # padded keys -> exact 0
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scr[...] = dq_scr[...] + scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, block_q, q_len, scale
):
    """grid (bh, k_blocks, q_blocks): accumulate dk/dv in scratch over Q."""
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bk = k.shape[0]
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], bk), 0) + qi * block_q
    # padded query rows would contaminate dk/dv — mask them out
    p = jnp.where(row < q_len, jnp.exp(s - lse), 0.0)
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_scr[...] = dk_scr[...] + scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == num_q - 1)
    def _():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom-VJP plumbing
# ---------------------------------------------------------------------------


def _block_sizes(sq, sk):
    bq = min(DEFAULT_BLOCK_Q, _ceil_to(sq, 128))
    bk = min(DEFAULT_BLOCK_K, _ceil_to(sk, 128))
    return bq, bk, _ceil_to(sq, bq), _ceil_to(sk, bk)


def _flash_fwd_impl(q, k, v, scale, interpret):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq, bk, sqp, skp = _block_sizes(sq, sk)

    q3 = _pad_seq(_fold(q), sqp)
    k3 = _pad_seq(_fold(k), skp)
    v3 = _pad_seq(_fold(v), skp)
    bh = b * h

    out3, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=bk, kv_len=sk, scale=scale),
        grid=(bh, sqp // bq, skp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sqp, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sqp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-replicated)
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum
            pltpu.VMEM((bq, d), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sqp * skp * d,
            bytes_accessed=2 * q3.size * q3.dtype.itemsize
            + (k3.size + v3.size) * k3.dtype.itemsize,
            transcendentals=bh * sqp * skp,
        ),
        interpret=interpret,
    )(q3, k3, v3)

    out = _unfold(out3[:, :sq], b, h)
    return out, (q3, k3, v3, out3, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bshd(q, k, v, scale, interpret):
    out, _ = _flash_fwd_impl(q, k, v, scale, interpret)
    return out


def _vjp_fwd(q, k, v, scale, interpret):
    out, residuals = _flash_fwd_impl(q, k, v, scale, interpret)
    return out, (residuals, (q.shape, k.shape[1]))


def _vjp_bwd(scale, interpret, saved, g):
    (q3, k3, v3, out3, lse), ((b, sq, h, d), sk) = saved
    bh, sqp, _ = q3.shape
    skp = k3.shape[1]
    bq, bk, _, _ = _block_sizes(sq, sk)

    do3 = _pad_seq(_fold(g), sqp)
    # lane-replicated [BH, Sqp, 128] to match the lse layout
    delta = jnp.broadcast_to(
        jnp.sum(do3.astype(jnp.float32) * out3.astype(jnp.float32), axis=-1)[:, :, None],
        (bh, sqp, 128),
    )

    dq3 = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=bk, kv_len=sk, scale=scale),
        grid=(bh, sqp // bq, skp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sqp, d), q3.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)

    dk3, dv3 = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=bq, q_len=sq, scale=scale),
        grid=(bh, skp // bk, sqp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, j, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, j, i: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, j, i: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bb, j, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda bb, j, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda bb, j, i: (bb, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bb, j, i: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bb, j, i: (bb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skp, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, skp, d), v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)

    dq = _unfold(dq3[:, :sq], b, h)
    dk = _unfold(dk3[:, :sk], b, h)
    dv = _unfold(dv3[:, :sk], b, h)
    return dq, dk, dv


_flash_bshd.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bidirectional flash attention, BSHD layout [batch, seq, heads, head_dim].

    Differentiable (custom VJP with flash backward kernels).
    ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_bshd(q, k, v, float(scale), interpret)
