"""Optimizer + LR-schedule factories (optax).

Parity target: reference ``conceptmod/textsliders/train_util.py:1014-1082``.
torch scheduler semantics are reproduced in closed form:
* cosine           — CosineAnnealingLR: η_min + (lr−η_min)(1+cos(πt/T_max))/2
                     (keeps oscillating past T_max, as torch's closed form does;
                     the flagship XL trainer uses T_max=50 over 500 iterations,
                     reference train_lora_xl.py:105)
* cosine_with_restarts — CosineAnnealingWarmRestarts(T_0=max//10, T_mult=2)
* step             — StepLR(step_size=max//100, gamma=0.999)
* constant         — ConstantLR(factor=1)
* linear           — LinearLR(start 0.5→1 over max//100 steps)

bitsandbytes 8-bit optimizers (reference train_util.py:1027-1035) have no TPU
meaning — 'adam8bit'/'lion8bit' map to their full-precision optax versions.
DAdapt/Prodigy are not shipped in this environment; requesting them raises.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def parse_optimizer_args(optimizer_args: str) -> dict:
    """'weight_decay=0.01 betas=(0.9,0.999)' → kwargs dict (reference passes
    ``--optimizer_args`` through to the torch ctor, train_util.py config)."""
    out = {}
    if not optimizer_args:
        return out
    for tok in optimizer_args.replace(",", " ").split():
        if "=" not in tok:
            continue
        k, v = tok.split("=", 1)
        try:
            out[k] = float(v)
        except ValueError:
            out[k] = v
    return out


def get_lr_schedule(
    name: Optional[str],
    lr: float,
    max_iterations: int,
    lr_min: float = 0.0,
):
    name = (name or "constant").lower()

    if name == "cosine":
        t_max = max(max_iterations, 1)

        def sched(step):
            return lr_min + 0.5 * (lr - lr_min) * (1 + jnp.cos(jnp.pi * step / t_max))

        return sched
    if name == "cosine_with_restarts":
        t_0 = max(max_iterations // 10, 1)

        def sched(step):
            # restart boundaries at T_0·(2^k − 1); closed-form per segment
            step = jnp.asarray(step, jnp.float32)
            k = jnp.floor(jnp.log2(step / t_0 + 1.0))
            seg_start = t_0 * (2.0**k - 1.0)
            seg_len = t_0 * 2.0**k
            t_cur = step - seg_start
            return lr_min + 0.5 * (lr - lr_min) * (1 + jnp.cos(jnp.pi * t_cur / seg_len))

        return sched
    if name == "step":
        step_size = max(max_iterations // 100, 1)

        def sched(step):
            return lr * 0.999 ** jnp.floor(step / step_size)

        return sched
    if name == "constant":
        return lambda step: jnp.asarray(lr, jnp.float32)
    if name == "linear":
        total = max(max_iterations // 100, 1)

        def sched(step):
            frac = jnp.clip(step / total, 0.0, 1.0)
            return lr * (0.5 + 0.5 * frac)

        return sched
    if name == "constant_with_warmup":
        # used by notrigger (transformers get_constant_schedule_with_warmup,
        # reference train_notrigger.py:216-229); warmup steps fixed at 100
        warmup = 100

        def sched(step):
            return lr * jnp.clip(step / warmup, 0.0, 1.0)

        return sched
    raise ValueError("Scheduler must be cosine, cosine_with_restarts, step, linear or constant")


def get_optimizer(
    name: str,
    lr_schedule,
    optimizer_args: str = "",
    *,
    weight_decay: Optional[float] = None,
    grad_clip_norm: Optional[float] = None,
    grad_clip_value: Optional[float] = None,
) -> optax.GradientTransformation:
    name = name.lower()
    kwargs = parse_optimizer_args(optimizer_args)
    if weight_decay is not None:
        kwargs.setdefault("weight_decay", weight_decay)

    if name in ("adam", "adam8bit"):
        tx = optax.adam(lr_schedule, eps=float(kwargs.get("eps", 1e-8)))
    elif name in ("adamw", "adamw8bit"):
        tx = optax.adamw(
            lr_schedule,
            weight_decay=float(kwargs.get("weight_decay", 1e-2)),
            eps=float(kwargs.get("eps", 1e-8)),
        )
    elif name in ("lion", "lion8bit"):
        tx = optax.lion(lr_schedule, weight_decay=float(kwargs.get("weight_decay", 0.0)))
    elif name == "sgd":
        tx = optax.sgd(lr_schedule, momentum=float(kwargs.get("momentum", 0.0)))
    elif name.startswith("dadapt") or name == "prodigy":
        raise ValueError(
            f"{name} is not available in the TPU build (no dadaptation/prodigyopt); "
            "use adamw/lion/sgd"
        )
    else:
        raise ValueError("Optimizer must be adam, adamw, lion or sgd")

    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if grad_clip_value is not None:
        chain.append(optax.clip(grad_clip_value))
    chain.append(tx)
    return optax.chain(*chain)
