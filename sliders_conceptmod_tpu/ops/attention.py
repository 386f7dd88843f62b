"""Attention dispatch: Pallas flash-attention on TPU, fused XLA elsewhere.

Replaces the reference's xformers memory-efficient attention
(``unet.enable_xformers_memory_efficient_attention()``,
reference train_lora_xl.py:83-84) — the one native-code dependency of the
reference's hot path (SURVEY.md §2.1).

Layout: [batch, seq, heads, head_dim] (BSHD) throughout — TPU-friendly
(head_dim=64..160 on the lane axis) and transpose-free for the UNet's
flattened-spatial sequences.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

# Measured on v5e (SDXL ESD train step, BASELINE.md): at 512px-training
# sequence lengths (1024/256 tokens) XLA's fused attention beats the Pallas
# kernel — 5.35 vs 4.35 steps/s end-to-end — because the O(S²) logits still
# fit comfortably on-chip and the kernel adds launch/layout overhead. Flash
# pays off once the logits get HBM-bound (≥2048 tokens: 1024px SDXL latents,
# SD3/Flux joint sequences, VAE decode attention at 1024px).
_FLASH_MIN_SEQ = 2048
# benchmark/A-B switch: SLIDERS_DISABLE_FLASH=1 forces the XLA path
_FLASH_DISABLED = os.environ.get("SLIDERS_DISABLE_FLASH") == "1"

# --- sequence parallelism (ring attention over the mesh) --------------------
# Active (mesh, axis_name, min_seq) context, or None. Set at TRACE time by
# `sequence_parallel(...)` around the jit'd forward — model code stays
# unchanged; self-attention calls long enough to shard route to
# parallel/ring_attention.py (K/V rotating over ICI via ppermute).
_SP_CTX = None


@contextmanager
def sequence_parallel(mesh, axis_name: str = "data", min_seq: int = 4096):
    """Route self-attention through ring attention, sequence-sharded over
    ``mesh[axis_name]``.

    Must wrap the *trace* of the jitted forward (the dispatch decision is
    made while tracing). Only self-attention (q_seq == kv_seq) at
    ``min_seq``+ tokens with a sequence divisible by the axis size reroutes;
    cross-attention against short replicated contexts (77-token CLIP) stays
    local. The reference has no SP at all (SURVEY §2.2) — this is the
    TPU-native extension for Flux/MMDiT-scale token streams.

    Not composable with ``ESDConfig.shard_samples`` over the same axis: the
    ring is itself a shard_map over ``axis_name``, and nesting inside another
    shard_map on that axis is invalid — use one or the other per axis.
    """
    global _SP_CTX
    old = _SP_CTX
    _SP_CTX = (mesh, axis_name, int(min_seq))
    try:
        yield
    finally:
        _SP_CTX = old


def sequence_parallel_from_config(tpu_cfg):
    """`tpu.sequence_parallel: true` → the context above on the config's
    mesh; otherwise a no-op context (trainer loops wrap themselves in this)."""
    from contextlib import nullcontext

    if not getattr(tpu_cfg, "sequence_parallel", False):
        return nullcontext()
    from sliders_conceptmod_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(tpu_cfg.mesh_data, tpu_cfg.mesh_model)
    return sequence_parallel(mesh, min_seq=tpu_cfg.sp_min_seq)


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Bidirectional (no-mask) attention, BSHD layout.

    UNet self/cross attention is unmasked; CLIP's causal mask is handled in
    the CLIP module itself (77 tokens — not worth a kernel).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    q_seq = q.shape[1]
    kv_seq = k.shape[1]
    d = q.shape[-1]
    if _SP_CTX is not None:
        mesh, axis_name, min_seq = _SP_CTX
        n = int(mesh.shape[axis_name])
        if n > 1 and q_seq == kv_seq and q_seq >= min_seq and q_seq % n == 0:
            from sliders_conceptmod_tpu.parallel.ring_attention import ring_attention

            return ring_attention(q, k, v, mesh=mesh, scale=scale, axis_name=axis_name)
    # head dims that aren't lane-aligned (SD1.5: 40/80) zero-pad to the next
    # multiple of 64 for the kernel — scores are unchanged (padded q·k dims
    # contribute 0) and padded V columns slice off
    d_pad = ((d + 63) // 64) * 64
    on_tpu = jax.default_backend() == "tpu"
    # staged-KV kernel limit: beyond ~512K elements per head the
    # double-buffered K/V staging exceeds scoped VMEM. Measured e2e, the
    # k-grid variant (flash_attention_kgrid.py) and XLA are both slower than
    # the staged kernel inside this range, and XLA wins beyond it.
    fits_vmem = kv_seq * d_pad <= 512 * 1024
    if (
        use_flash
        and not _FLASH_DISABLED
        and on_tpu
        and q_seq >= _FLASH_MIN_SEQ
        and fits_vmem
    ):
        from sliders_conceptmod_tpu.ops.flash_attention import flash_attention

        if d_pad != d:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
            out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), scale=scale)
            return out[..., :d]
        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
