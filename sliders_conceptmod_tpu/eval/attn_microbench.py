"""Attention dispatch microbenchmark: Pallas flash vs XLA fused, per seq len.

Produces the crossover table behind ops/attention.py's ``_FLASH_MIN_SEQ``.
Run on the TPU:  python -m sliders_conceptmod_tpu.eval.attn_microbench
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.ops.flash_attention import flash_attention


def xla_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def bench_fn(fn, q, k, v, iters=20):
    out = fn(q, k, v)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(q, k, v)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    heads, d = 10, 64
    results = []
    # staged kernel range; 16384x64 would dispatch to XLA (VMEM guard)
    for seq in (256, 512, 1024, 2048, 4096, 8192):
        b = max(1, 4096 // seq)  # keep total tokens comparable
        q = jax.random.normal(jax.random.PRNGKey(0), (b, seq, heads, d), jnp.bfloat16)
        t_xla = bench_fn(jax.jit(xla_attention), q, q, q)
        t_flash = bench_fn(jax.jit(lambda a, b_, c: flash_attention(a, b_, c)), q, q, q)
        row = {
            "seq": seq,
            "batch": b,
            "xla_ms": round(t_xla * 1e3, 3),
            "flash_ms": round(t_flash * 1e3, 3),
            "flash_speedup": round(t_xla / t_flash, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
