"""LPIPS (AlexNet backbone) in JAX — backs eval/lpip_score.py.

Parity target: the ``lpips.LPIPS(net='alex')`` scorer the reference uses at
64px (``eval-scripts/lpip_score.py:22-25,44,64-75``).

Pipeline (Zhang et al. 2018, as implemented by the ``lpips`` package):
input in [-1,1] → ScalingLayer (fixed shift/scale) → AlexNet conv features
at the 5 ReLU taps → channel-unit-normalize → squared difference → 1×1
"lin" heads (learned, non-negative) → spatial mean → sum over taps.

Weights: zero-egress environment — load from local files via
``load_lpips_params(alexnet_path, lpips_path)``:
* ``alexnet_path``: torchvision AlexNet state dict (.pth/.safetensors),
* ``lpips_path``: lpips package lin-head state dict
  (lpips/weights/v0.1/alex.pth).
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stages: (out_ch, kernel, stride, pad), with maxpool flags
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool follows relu1 and relu2
ALEX_CHANNELS = [64, 192, 384, 256, 256]


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: [B, 3, H, W] → list of 5 ReLU tap outputs (NHWC)."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        taps = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            h = nn.Conv(
                ch, (k, k), strides=(s, s), padding=((p, p), (p, p)), name=f"conv{i}"
            )(h)
            h = jax.nn.relu(h)
            taps.append(h)
            if i in _POOL_AFTER:
                h = nn.max_pool(h, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0/img1: [B, 3, H, W] in [-1, 1] → LPIPS distance [B]."""
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        x0 = (img0 - shift) / scale
        x1 = (img1 - shift) / scale

        net = AlexNetFeatures(name="alex")
        taps0 = net(x0)
        taps1 = net(x1)

        total = jnp.zeros((img0.shape[0],), jnp.float32)
        for i, (t0, t1) in enumerate(zip(taps0, taps1)):
            # lpips normalize_tensor puts eps OUTSIDE the sqrt:
            # in_feat / (sqrt(sum(in_feat**2)) + 1e-10)
            n0 = t0 / (jnp.sqrt(jnp.sum(t0**2, axis=-1, keepdims=True)) + 1e-10)
            n1 = t1 / (jnp.sqrt(jnp.sum(t1**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (n0 - n1) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + jnp.mean(lin[..., 0], axis=(1, 2))
        return total


def _load_any(path: str) -> Dict[str, np.ndarray]:
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def load_lpips_params(alexnet_path: str, lpips_path: str) -> Dict:
    """torchvision AlexNet + lpips lin heads → LPIPS param tree."""
    alex_sd = _load_any(alexnet_path)
    lin_sd = _load_any(lpips_path)

    # torchvision alexnet features conv indices: 0, 3, 6, 8, 10
    conv_idx = [0, 3, 6, 8, 10]
    alex = {}
    for i, ci in enumerate(conv_idx):
        w = alex_sd[f"features.{ci}.weight"]  # [out, in, kh, kw]
        b = alex_sd[f"features.{ci}.bias"]
        alex[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}

    params = {"alex": alex}
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
        params[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return params


def init_lpips_params(key) -> Dict:
    """Random-init params (architecture tests only — NOT a perceptual metric)."""
    model = LPIPS()
    img = jnp.zeros((1, 3, 64, 64))
    return model.init(key, img, img)["params"]
