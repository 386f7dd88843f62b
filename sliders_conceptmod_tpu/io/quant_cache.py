"""On-disk cache for int8-quantized frozen bases (adapters/quant.py).

The reference has no quantized-base story at all (its Flux trainer assumes
an 80 GB-class GPU, ``train_lora_flux.py:86-447``); this is part of the TPU
build's deployment loop: quantizing a full-depth checkpoint host-side costs
minutes of single-core CPU per process start, so ``cli/quantize_checkpoint``
does it ONCE and serving/training loads the int8 artifact directly
(mmap-friendly safetensors, ~half the bytes of the bf16 checkpoint).

Layout (format tag in the safetensors metadata):
  ``<module/path>/kernel``      int8   quantized 2-D Dense kernels
  ``<module/path>/...``         bf16/fp32  everything else, stored verbatim
  ``__scale__/<module/path>``   fp32   per-output-column scales

Numpy cannot hold jax bf16 natively for safetensors round trips — non-int8
leaves are stored at the dtype they arrive in (``ml_dtypes`` views handled
by safetensors.numpy).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

FORMAT_KEY = "sliders_conceptmod_tpu.quant_format"
FORMAT_V1 = "int8-percol-v1"
SCALE_PREFIX = "__scale__/"


def _flatten(tree, prefix=""):
    for k in sorted(tree.keys()):
        v = tree[k]
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, v


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_quantized(path: str, qtree, scales: Dict[Tuple[str, ...], jnp.ndarray], metadata=None):
    """Write an int8-quantized tree + per-column scales as one safetensors
    file. ``qtree``/``scales`` are the (device or host) outputs of
    ``quant.quantize_host_tree`` / ``quantize_params`` / ``quantize_init``."""
    from safetensors.numpy import save_file

    out = {}
    for key, v in _flatten(qtree):
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            # safetensors.numpy handles ml_dtypes bf16 arrays natively
            a = np.ascontiguousarray(a)
        out[key] = np.ascontiguousarray(a)
    for mod_path, s in scales.items():
        out[SCALE_PREFIX + "/".join(mod_path)] = np.ascontiguousarray(
            np.asarray(s, np.float32)
        )
    meta = {FORMAT_KEY: FORMAT_V1}
    if metadata:
        meta.update(metadata)
    save_file(out, str(path), meta)


def load_quantized(path: str, dtype=jnp.bfloat16):
    """Inverse of :func:`save_quantized`: returns ``(qtree, scales)`` with
    int8 kernels kept int8, scales fp32, and every other leaf cast to
    ``dtype``. Raises on files without the v1 format tag (so a plain
    checkpoint is never silently misread as a quantized one)."""
    import safetensors

    # the metadata/format check stays on the python reader (the native one
    # is tensor-oriented); the BULK reads go through the C++ mmap reader
    # (native/safetensors_reader.cpp) when it builds. copy=True is load-
    # bearing: with copy=False jnp.asarray may zero-copy ALIAS an aligned
    # mapped view (CPU) or still be transferring it (TPU) when the mapping
    # is closed — freed-page reads. One host copy per leaf is the price.
    with safetensors.safe_open(str(path), framework="np") as f:
        meta = f.metadata() or {}
    if meta.get(FORMAT_KEY) != FORMAT_V1:
        raise ValueError(
            f"{path} is not a {FORMAT_V1} artifact "
            f"(metadata {FORMAT_KEY!r} = {meta.get(FORMAT_KEY)!r}); "
            "produce one with cli/quantize_checkpoint"
        )
    from sliders_conceptmod_tpu.io.native import load_safetensors_native

    tensors = load_safetensors_native(str(path), copy=True)
    flat: Dict[str, np.ndarray] = {}
    scales: Dict[Tuple[str, ...], jnp.ndarray] = {}
    for key, a in tensors.items():
        if key.startswith(SCALE_PREFIX):
            scales[tuple(key[len(SCALE_PREFIX):].split("/"))] = jnp.asarray(a, jnp.float32)
        elif a.dtype == np.int8:
            flat[key] = jnp.asarray(a)
        elif key.endswith("/kernel_scale") or key == "kernel_scale":
            # in-tree scales stay fp32 — they ride the params signature
            flat[key] = jnp.asarray(a, jnp.float32)
        else:
            flat[key] = jnp.asarray(a, dtype)
    return _unflatten(flat), scales


def is_quantized_artifact(path: str) -> bool:
    """Cheap header sniff — lets loaders branch without a failed load."""
    try:
        import safetensors

        with safetensors.safe_open(str(path), framework="np") as f:
            return (f.metadata() or {}).get(FORMAT_KEY) == FORMAT_V1
    except Exception:
        return False
