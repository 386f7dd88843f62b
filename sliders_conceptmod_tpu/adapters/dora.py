"""DoRA (weight-decomposed LoRA) slider adapters — functional overlay.

Semantic-parity target: reference ``conceptmod/textsliders/dora.py``.
This fork's DoRA variant (dora.py:97-107,124-134,142-162):

* ``dora_scale`` is a learnable per-INPUT-channel magnitude initialized to
  the base weight's column norm ‖W[:, j]‖₂ (flattened over out×kh×kw)
  — note the fork norms per *input* column, not per output row,
* forward: ``W' = W + B·A`` (no α/r inside), then
  ``decomposed = W' · (dora_scale / ‖W'‖_col)`` with the norm detached,
  and ``y = base(x) + ops(x, decomposed − W) · (α/r) · multiplier``.

Functional form here: the merged kernel is
``W + mult·(α/r)·(decompose(W + B·A) − W)`` — identical math, merged into
the param tree like adapters/lora.py so teacher/student share one compiled
UNet. Site selection, filters, and checkpoint layout reuse the LoRA
machinery; the state dict adds ``.dora_scale`` per site (dora.py:99-107).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.adapters.lora import (  # re-exported for callers
    DEFAULT_TARGET_REPLACE,
    LoRASite,
    UNET_TARGET_REPLACE_MODULE_CONV,
    UNET_TARGET_REPLACE_MODULE_TRANSFORMER,
    create_sites,
)


def _col_norm(kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-input-channel L2 norm, broadcastable against the flax kernel.

    dense kernel [in, out] → [in, 1]; conv kernel [kh, kw, in, out] →
    [1, 1, in, 1] (norm over kh, kw, out) — the flax-layout image of the
    reference's transpose/reshape dance (dora.py:100-107,124-131).
    """
    if kernel.ndim == 2:
        return jnp.linalg.norm(kernel, axis=1, keepdims=True)
    n = jnp.sqrt(jnp.sum(kernel.astype(jnp.float32) ** 2, axis=(0, 1, 3), keepdims=True))
    return n.astype(kernel.dtype)


def init_lora_params(
    key: jax.Array, sites: Sequence[LoRASite], base_params=None, dtype=jnp.float32
) -> Dict:
    """LoRA factors (kaiming/zero, dora.py:117-119) + dora_scale = ‖W col‖."""
    if base_params is None:
        raise ValueError("DoRA init requires base_params (dora_scale = ||W col||)")
    params = lora_lib.init_lora_params(key, sites, dtype=dtype)
    for site in sites:
        kernel = _get(base_params, site.module_path + ("kernel",))
        params[site.lora_name]["dora_scale"] = _col_norm(kernel).astype(dtype)
    return params


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _dora_delta(site: LoRASite, leaf: Dict, base_kernel: jnp.ndarray) -> jnp.ndarray:
    """decompose(W + B·A) − W in flax layout; norm is gradient-stopped
    (reference detaches weight_norm, dora.py:132)."""
    down, up = leaf["down"], leaf["up"]
    if site.kind == "dense":
        ba = down @ up
    else:
        ba = jnp.einsum("hwir,ro->hwio", down, up[0, 0])
    w_prime = base_kernel + ba
    norm = jax.lax.stop_gradient(_col_norm(w_prime))
    decomposed = w_prime * (leaf["dora_scale"] / norm)
    return (decomposed - base_kernel) * site.scale


def merge_lora_params(base_params, sites: Sequence[LoRASite], dora_params: Dict, multiplier):
    """Param tree with ``W + mult·(α/r)·(decompose(W+BA) − W)`` at each site."""
    merged = base_params
    for site in sites:
        leaf = dora_params[site.lora_name]
        path = site.module_path + ("kernel",)
        base_kernel = _get(base_params, path)
        if jnp.issubdtype(jnp.asarray(base_kernel).dtype, jnp.integer):
            # same trace-time guard as lora.merge_lora_params: the astype
            # below would silently truncate into a quantized int8 kernel
            raise ValueError(
                f"cannot merge DoRA into integer (quantized) kernel at "
                f"{'/'.join(site.module_path)}"
            )
        delta = _dora_delta(site, leaf, base_kernel)

        def apply_at(tree, path, delta):
            seg, rest = path[0], path[1:]
            new = dict(tree)
            if rest:
                new[seg] = apply_at(tree[seg], rest, delta)
            else:
                new[seg] = tree[seg] + (multiplier * delta).astype(tree[seg].dtype)
            return new

        merged = apply_at(merged, path, delta)
    return merged


# --- checkpoint I/O: LoRA schema + .dora_scale ------------------------------


def state_dict_numpy(sites: Sequence[LoRASite], dora_params: Dict, dtype=np.float32) -> Dict[str, np.ndarray]:
    out = lora_lib.state_dict_numpy(sites, dora_params, dtype=dtype)
    for site in sites:
        ds = np.asarray(jax.device_get(dora_params[site.lora_name]["dora_scale"]), dtype=dtype)
        if site.kind == "dense":
            torch_ds = ds.T  # [in,1] -> [1,in]
        else:
            torch_ds = ds.transpose(3, 2, 0, 1)  # [1,1,in,1] -> [1,in,1,1]
        out[f"{site.lora_name}.dora_scale"] = np.ascontiguousarray(torch_ds)
    return out


def save_weights(path: str, sites: Sequence[LoRASite], dora_params: Dict, dtype=np.float32, metadata=None):
    sd = state_dict_numpy(sites, dora_params, dtype=dtype)
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(sd, str(path), metadata)
    else:
        import torch

        torch.save({k: lora_lib._numpy_to_torch(v) for k, v in sd.items()}, str(path))


def load_weights(path: str, sites: Sequence[LoRASite], dtype=jnp.float32) -> Dict:
    from safetensors.numpy import load_file

    sd = load_file(str(path)) if str(path).endswith(".safetensors") else None
    if sd is None:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(str(path), weights_only=True).items()}
    return load_weights_from_tensors(sd, sites, dtype=dtype)


def load_weights_from_tensors(sd: Dict[str, np.ndarray], sites: Sequence[LoRASite], dtype=jnp.float32) -> Dict:
    params = lora_lib.load_weights_from_tensors(sd, sites, dtype=dtype)
    for site in sites:
        ds = np.asarray(sd[f"{site.lora_name}.dora_scale"])
        if site.kind == "dense":
            flax_ds = ds.T
        else:
            flax_ds = ds.transpose(2, 3, 1, 0)
        params[site.lora_name]["dora_scale"] = jnp.asarray(flax_ds, dtype)
    return params
