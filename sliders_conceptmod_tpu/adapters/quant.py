"""Int8-quantized frozen base for adapter training (QLoRA-style, TPU-native).

The reference cannot train Flux at all on a 16 GB card and has no
quantized-base path (its Flux trainer assumes an 80 GB-class GPU,
``train_lora_flux.py:86-447``). This module is a deliberate TPU extension:
the *frozen* base weights are stored as symmetric per-output-channel int8
(11.9 GB for Flux-schnell's 11.89B params vs 23.8 GB bf16), which fits one
v5e chip (16 GB HBM), and are dequantized at the point of use inside each
matmul — XLA fuses the ``int8→bf16`` cast into the matmul producer so no
full-precision copy of the tree ever materializes.

Mechanism mirrors :func:`adapters.lora.lora_overlay`: a flax
``intercept_methods`` context replaces the ``__call__`` of every quantized
``nn.Dense`` with ``(x @ dequant(q)) * scale + bias``. Because the quant
interceptor *replaces* the base computation (it never calls ``next_fun``),
it must be registered INNERMOST; flax runs interceptors in registration
order (first registered = outermost), so compose as::

    with lora_overlay(sites, lp, row_scale), quant_overlay(scales):
        model.apply({"params": qparams}, ...)

which yields ``dequant_base(x) + row_scale·(α/r)·up(down(x))`` — the
reference's forward-hook formula (lora.py:134-138) over a quantized base.

Only frozen weights are quantized; LoRA factors, optimizer state and
activations stay in the training dtype, so the adapter math is identical to
the full-precision path up to the base-weight rounding error.

Scope: 2-D ``kernel`` leaves (Dense). Conv bases (SD-UNet) stay full
precision — the UNet families fit one chip without quantization.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# kernels below this element count stay full precision: the HBM win is
# negligible and small layers (e.g. pooled-text projections) are the most
# quantization-sensitive
QUANT_MIN_ELEMS = 65536

ScaleDict = Dict[Tuple[str, ...], jnp.ndarray]


def _walk(tree, prefix=()):
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def quantize_leaf(w: jnp.ndarray):
    """Symmetric per-output-column int8: ``w ≈ q · scale`` with
    ``scale[j] = max_i |w[i,j]| / 127`` (so the error per element is at most
    ``scale/2``)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_host_tree(np_tree, dtype=jnp.bfloat16, min_elems: int = QUANT_MIN_ELEMS):
    """Quantize a HOST (numpy) state tree straight to device int8 — the
    real-checkpoint load path. The full-precision tree never touches the
    device (full-depth Flux: 23.8 GB bf16 > 16 GB v5e HBM — a plain
    ``tree_to_jax`` would OOM before quantization could run); each leaf is
    quantized in numpy and only the int8 copy (plus fp32 per-column scales)
    is transferred. Non-quantized leaves transfer at ``dtype``."""
    import numpy as np

    scales: ScaleDict = {}

    def rebuild(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + (k,))
                continue
            arr = np.asarray(v)
            if k == "kernel" and arr.ndim == 2 and arr.size >= min_elems:
                w = arr.astype(np.float32)
                amax = np.max(np.abs(w), axis=0)
                scale = np.maximum(amax / 127.0, 1e-12)
                q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
                scales[prefix] = jnp.asarray(scale, jnp.float32)
                out[k] = jnp.asarray(q)
                out["kernel_scale"] = scales[prefix]
            else:
                # contiguous + final dtype in one numpy pass — transposed
                # views transfer ~10× slower (see torch_convert.tree_to_jax)
                out[k] = jnp.asarray(np.asarray(arr, dtype=np.dtype(dtype), order="C"))
        return out

    return rebuild(np_tree), scales


def quantize_params(params, min_elems: int = QUANT_MIN_ELEMS, cast_rest=None):
    """Quantize every large 2-D ``kernel`` leaf; return ``(qtree, scales)``.

    The per-column fp32 scale is stored IN-TREE as a ``kernel_scale`` leaf
    next to each quantized ``kernel`` (flax ignores extra param leaves), so
    scales flow through jitted-step ARGUMENTS with the rest of the frozen
    tree — never closure-captured into executables as constants (CLAUDE.md
    convention; a closure-captured scale tree would also fork the compile
    cache per checkpoint). ``scales`` additionally maps the owning MODULE
    path to the same vectors — the membership set :func:`quant_overlay`
    uses. Quantization runs eagerly per leaf, so the peak transient is one
    fp32 leaf (~150 MB for Flux's largest), never the full tree.
    ``cast_rest``: storage dtype for the NON-quantized leaves (None = leave
    untouched). Traceable — see :func:`quantize_init`.
    """
    scales: ScaleDict = {}

    def rebuild(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + (k,))
            elif k == "kernel" and v.ndim == 2 and v.size >= min_elems:
                q, scale = quantize_leaf(v)
                scales[prefix] = scale
                out[k] = q
                out["kernel_scale"] = scale
            elif cast_rest is not None:
                out[k] = v.astype(cast_rest)
            else:
                out[k] = v
        return out

    return rebuild(params), scales


def quantize_init(init_fn, min_elems: int = QUANT_MIN_ELEMS, dtype=jnp.bfloat16):
    """jit-fused ``init → quantize``: run a parameter initializer and
    quantize its output inside ONE executable, so the values match the
    plain (unquantized) init exactly up to int8 rounding — the weightless
    load path stays same-seed equivalent to the full-precision family —
    while XLA frees each fp32 leaf after its int8 copy is produced (the
    full fp32 tree is never live at once)."""

    def fused():
        return quantize_params(init_fn(), min_elems=min_elems, cast_rest=dtype)

    return jax.jit(fused)()


def dequantize_params(qtree, scales: ScaleDict, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_params` (up to rounding) — for tests and
    for exporting a merged full-precision tree. Drops the in-tree
    ``kernel_scale`` leaves."""

    def rebuild(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + (k,))
            elif k == "kernel_scale":
                continue
            elif k == "kernel" and prefix in scales:
                scale = tree.get("kernel_scale", scales[prefix])
                out[k] = (v.astype(jnp.float32) * scale).astype(dtype)
            else:
                out[k] = v
        return out

    return rebuild(qtree)


def quantize_activations(x):
    """Symmetric per-token (last-axis) dynamic int8: ``x ≈ xq · sx`` with
    ``sx = max_k |x[..., k]| / 127`` kept per row. The W8A8 activation side —
    per-token scaling bounds the error of each token by its own amplitude,
    which is what makes dynamic quantization usable on transformer
    activations (per-tensor scales would be destroyed by outlier tokens)."""
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int8_matmul(xq: jnp.ndarray, kernel_q: jnp.ndarray) -> jnp.ndarray:
    """``int8 × int8 → int32`` matmul over the last/first axes. On TPU v5e
    the MXU runs int8 at 2× the bf16 rate (394 TOPS vs 197 TFLOPS), so this
    is the FLOP-side half of the W8A8 win (the int8 weights are already the
    HBM-side half). ``preferred_element_type=int32`` keeps the systolic-array
    accumulation exact — the product of two int8 inputs never overflows i32
    at any contraction depth that fits HBM."""
    return jax.lax.dot_general(
        xq,
        kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def quant_overlay(scales: ScaleDict, compute_dtype=jnp.bfloat16, act_quant: bool = False):
    """flax ``intercept_methods`` context: inside it, every Dense whose
    module path appears in ``scales`` computes
    ``((x @ q) * scale + bias)`` with the int8 kernel dequantized in-graph
    (fused by XLA into the matmul — int8 is what HBM holds).

    ``act_quant=True`` (W8A8, inference only): the activation is ALSO
    quantized — per-token dynamic int8 — and the matmul runs int8×int8→int32
    on the MXU at 2× the bf16 rate, then rescales by the rank-1 outer
    product of the per-token and per-column scales:
    ``(xq @ q) · sx · scale``. Rounding has zero gradient in JAX, so this
    mode is for inference paths only; trainers must keep ``act_quant=False``
    (weight-only — adapter math identical to full precision up to base
    rounding).

    The scale VALUES come from the tree's own ``kernel_scale`` leaves when
    present (the quantizers always insert them) so they are jit ARGUMENTS,
    not baked constants; the ``scales`` dict supplies membership and the
    fallback for hand-built trees."""

    def interceptor(next_fun, args, kwargs, context):
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        scale = scales.get(tuple(context.module.path))
        if scale is None:
            return next_fun(*args, **kwargs)
        variables = context.module.variables["params"]
        kernel = variables["kernel"]
        scale = variables.get("kernel_scale", scale)
        x = args[0]
        if act_quant and kernel.dtype == jnp.int8:
            xq, sx = quantize_activations(x)
            y = int8_matmul(xq, kernel).astype(jnp.float32) * sx * scale
        else:
            y = jnp.einsum(
                "...i,io->...o", x.astype(compute_dtype), kernel.astype(compute_dtype)
            ).astype(jnp.float32) * scale
        bias = variables.get("bias")
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(compute_dtype)

    return nn.intercept_methods(interceptor)


def make_quant_apply(model, scales: ScaleDict, compute_dtype=jnp.bfloat16, act_quant: bool = False):
    """``apply_fn(qparams, *args, **kwargs)`` running ``model.apply`` under
    the dequant overlay — a drop-in for the trainers' ``transformer_apply``."""

    def apply_fn(qparams, *args, **kwargs):
        with quant_overlay(scales, compute_dtype, act_quant=act_quant):
            return model.apply({"params": qparams}, *args, **kwargs)

    return apply_fn


def wrap_apply(apply_fn, scales: ScaleDict, compute_dtype=jnp.bfloat16, act_quant: bool = False):
    """Wrap an arbitrary ``apply_fn(params, *args, **kwargs)`` (e.g. a
    ``TransformerBundle.apply_fn``) so it runs under the dequant overlay —
    the loader-facing sibling of :func:`make_quant_apply`."""

    def apply(params, *args, **kwargs):
        with quant_overlay(scales, compute_dtype, act_quant=act_quant):
            return apply_fn(params, *args, **kwargs)

    return apply


def weightless_quantized(shapes, min_elems: int = QUANT_MIN_ELEMS, dtype=jnp.bfloat16, seed=0):
    """Build a random int8-quantized tree straight from ``jax.eval_shape``
    output — the weightless bench path. Avoids ever materializing the
    full-precision tree (full-depth Flux: 47.6 GB fp32 / 23.8 GB bf16,
    both beyond one v5e)."""
    scales: ScaleDict = {}

    def rebuild(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + (k,))
            elif k == "kernel" and len(v.shape) == 2 and v.size >= min_elems:
                # zlib.crc32, not hash(): python string hashes are salted
                # per process — same-seed weightless runs must be identical
                import zlib

                digest = zlib.crc32("/".join(prefix + (k,)).encode())
                key = jax.random.fold_in(jax.random.PRNGKey(seed), digest % (2**31))
                out[k] = jax.random.randint(key, v.shape, -127, 128, jnp.int8)
                scales[prefix] = jnp.full(v.shape[-1:], 0.02 / 127.0, jnp.float32)
                out["kernel_scale"] = scales[prefix]
            else:
                out[k] = jnp.full(v.shape, 0.02, dtype)
        return out

    return rebuild(shapes), scales
