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
Prodigy (reference train_util.py:1037-1046 via the prodigyopt package) is
reimplemented natively on optax below (:func:`prodigy`) — the step-size
adaptation runs entirely on-device inside the jitted train step. The
DAdaptation pair the reference offers via the ``dadaptation`` package
(train_util.py:1017-1026: DAdaptAdam / DAdaptLion, arXiv 2301.07733) is
likewise reimplemented natively (:func:`dadapt_adam`, :func:`dadapt_lion`);
with no dadaptation package installable here (zero egress) the tests pin the
algorithms' defining properties rather than bitwise package parity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    step: chex.Array  # int32 scalar
    d: chex.Array  # current distance estimate
    d_max: chex.Array
    d_numerator: chex.Array  # r_k in the paper
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    s: optax.Updates  # β3-EMA of d-weighted grads; ‖s‖₁ is the D denominator
    p0: optax.Updates  # initial params x₀


def prodigy(
    lr_schedule,
    betas=(0.9, 0.999),
    beta3: Optional[float] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    growth_rate: float = float("inf"),
    safeguard_warmup: bool = False,
    use_bias_correction: bool = False,
) -> optax.GradientTransformation:
    """Prodigy (Mishchenko & Defazio 2023, arXiv 2306.06101), Adam variant.

    Matches the reference's prodigyopt semantics (train_util.py:1037-1046):
    per step k with pre-update distance estimate d and dlr = d·lr(k)·bias,
      r   ← β3·r + (d/d0)·dlr·⟨g, x₀ − x⟩
      s   ← β3·s + (d/d0)·dlr·g          (weight d instead of dlr when
                                          safeguard_warmup)
      d̂  = d_coef · r / ‖s‖₁
      d' = min(max(d_max, d̂), d·growth_rate)   (applied NEXT step)
      m  ← β1·m + d·(1−β1)·g ;  v ← β2·v + d²·(1−β2)·g²
      Δx = −dlr·m/(√v + d·eps) − wd·dlr·x      (decoupled weight decay)
    All state lives on device — the whole adaptation jits into the train step.
    """
    b1, b2 = betas
    b3 = beta3 if beta3 is not None else b2**0.5

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.zeros([], jnp.float32),
            exp_avg=zeros(),
            exp_avg_sq=zeros(),
            s=zeros(),
            p0=jax.tree.map(jnp.copy, params),
        )

    def _tree_sum(tree):
        return jax.tree.reduce(lambda a, x: a + x, tree, jnp.zeros([], jnp.float32))

    def update(grads, state, params):
        if params is None:
            raise ValueError("prodigy requires params to be passed to update()")
        k = state.step
        d = state.d
        lr = jnp.asarray(lr_schedule(k), jnp.float32)
        if use_bias_correction:
            kf = k.astype(jnp.float32) + 1.0
            bias = jnp.sqrt(1.0 - b2**kf) / (1.0 - b1**kf)
        else:
            bias = 1.0
        dlr = d * lr * bias

        dot = _tree_sum(
            jax.tree.map(
                lambda g, p, p_0: jnp.vdot(
                    g.astype(jnp.float32), (p_0 - p).astype(jnp.float32)
                ),
                grads,
                params,
                state.p0,
            )
        )
        numerator = b3 * state.d_numerator + (d / d0) * dlr * dot
        s_alpha = (d / d0) * (d if safeguard_warmup else dlr)
        s = jax.tree.map(lambda s_, g: b3 * s_ + s_alpha * g.astype(s_.dtype), state.s, grads)
        denom_sum = _tree_sum(jax.tree.map(lambda s_: jnp.sum(jnp.abs(s_)), s))

        d_hat = jnp.where(denom_sum > 0, d_coef * numerator / denom_sum, d)
        d_max = jnp.maximum(state.d_max, d_hat)
        d_next = jnp.where(denom_sum > 0, jnp.minimum(d_max, d * growth_rate), d)

        exp_avg = jax.tree.map(
            lambda m, g: b1 * m + d * (1 - b1) * g.astype(m.dtype), state.exp_avg, grads
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + d * d * (1 - b2) * jnp.square(g.astype(v.dtype)),
            state.exp_avg_sq,
            grads,
        )
        updates = jax.tree.map(
            lambda m, v, p: (-dlr * m / (jnp.sqrt(v) + d * eps) - weight_decay * dlr * p).astype(
                p.dtype
            ),
            exp_avg,
            exp_avg_sq,
            params,
        )
        new_state = ProdigyState(
            step=k + 1,
            d=d_next,
            d_max=d_max,
            d_numerator=numerator,
            exp_avg=exp_avg,
            exp_avg_sq=exp_avg_sq,
            s=s,
            p0=state.p0,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


class DAdaptAdamState(NamedTuple):
    step: chex.Array  # int32 scalar
    d: chex.Array
    numerator_weighted: chex.Array  # √β2-EMA of dlr·⟨g, s/(√v+d·eps)⟩
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    s: optax.Updates  # √β2-EMA of dlr-weighted grads; ‖s‖₁ is the D denominator


def dadapt_adam(
    lr_schedule,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    d0: float = 1e-6,
    growth_rate: float = float("inf"),
    use_bias_correction: bool = False,
    decouple: bool = False,
) -> optax.GradientTransformation:
    """D-Adaptation Adam (Defazio & Mishchenko 2023, arXiv 2301.07733).

    Reference exposes this as ``optimizer: dadaptadam`` through the
    ``dadaptation`` package (train_util.py:1017-1021). Semantics follow the
    package's DAdaptAdam: per step k with pre-update estimate d and
    dlr = d·lr(k)·bias,
      r  ← √β2·r + (1−√β2)·dlr·⟨g, s/(√v + d·eps)⟩    (old v, s, d)
      m  ← β1·m + (1−β1)·dlr·g                         (dlr folded into m)
      v  ← β2·v + (1−β2)·g²
      s  ← √β2·s + (1−√β2)·dlr·g
      d̂ = r / ((1−√β2)·‖s‖₁)
      d' = max(d, min(d̂, d·growth_rate))               (used in THIS step's eps)
      Δx = −m/(√v + d'·eps) − [decouple] wd·dlr·x
    Coupled weight decay (the package default) adds wd·x to the gradient
    before the EMAs. All state lives on device; jits into the train step.
    """
    b1, b2 = betas
    sqrt_b2 = b2**0.5

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return DAdaptAdamState(
            step=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            numerator_weighted=jnp.zeros([], jnp.float32),
            exp_avg=zeros(),
            exp_avg_sq=zeros(),
            s=zeros(),
        )

    def _tree_sum(tree):
        return jax.tree.reduce(lambda a, x: a + x, tree, jnp.zeros([], jnp.float32))

    def update(grads, state, params):
        if params is None:
            raise ValueError("dadapt_adam requires params to be passed to update()")
        k = state.step
        d = state.d
        lr = jnp.asarray(lr_schedule(k), jnp.float32)
        if use_bias_correction:
            kf = k.astype(jnp.float32) + 1.0
            bias = jnp.sqrt(1.0 - b2**kf) / (1.0 - b1**kf)
        else:
            bias = 1.0
        dlr = d * lr * bias

        if weight_decay and not decouple:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p.astype(g.dtype), grads, params)

        dot = _tree_sum(
            jax.tree.map(
                lambda g, s_, v: jnp.vdot(
                    g.astype(jnp.float32),
                    s_.astype(jnp.float32) / (jnp.sqrt(v.astype(jnp.float32)) + d * eps),
                ),
                grads,
                state.s,
                state.exp_avg_sq,
            )
        )
        numerator = sqrt_b2 * state.numerator_weighted + (1 - sqrt_b2) * dlr * dot

        exp_avg = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * dlr * g.astype(m.dtype), state.exp_avg, grads
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(v.dtype)),
            state.exp_avg_sq,
            grads,
        )
        s = jax.tree.map(
            lambda s_, g: sqrt_b2 * s_ + (1 - sqrt_b2) * dlr * g.astype(s_.dtype), state.s, grads
        )
        sk_l1 = _tree_sum(jax.tree.map(lambda s_: jnp.sum(jnp.abs(s_)), s))

        d_hat = jnp.where(sk_l1 > 0, numerator / ((1 - sqrt_b2) * sk_l1), d)
        d_next = jnp.where(sk_l1 > 0, jnp.maximum(d, jnp.minimum(d_hat, d * growth_rate)), d)

        wd_term = weight_decay * dlr if decouple else 0.0
        updates = jax.tree.map(
            lambda m, v, p: (-m / (jnp.sqrt(v) + d_next * eps) - wd_term * p).astype(p.dtype),
            exp_avg,
            exp_avg_sq,
            params,
        )
        new_state = DAdaptAdamState(
            step=k + 1,
            d=d_next,
            numerator_weighted=numerator,
            exp_avg=exp_avg,
            exp_avg_sq=exp_avg_sq,
            s=s,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


class DAdaptLionState(NamedTuple):
    step: chex.Array
    d: chex.Array
    numerator_weighted: chex.Array
    exp_avg: optax.Updates
    s: optax.Updates


def dadapt_lion(
    lr_schedule,
    betas=(0.9, 0.99),
    weight_decay: float = 0.0,
    d0: float = 1e-6,
    growth_rate: float = float("inf"),
) -> optax.GradientTransformation:
    """D-Adaptation Lion (``optimizer: dadaptlion``, reference
    train_util.py:1022-1023). Sign-descent D-Adaptation:
      u  = sign(β1·m + (1−β1)·g)
      Δx = −dlr·u − wd·dlr·x                       (decoupled decay)
      m  ← β2·m + (1−β2)·dlr·g
      r  ← β2·r + (1−β2)·dlr·⟨u, s⟩                (old s)
      s  ← β2·s + (1−β2)·dlr·u
      d̂ = r / ((1−β2)·‖s‖₁);  d' = max(d, min(d̂, d·growth_rate))
    """
    b1, b2 = betas

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return DAdaptLionState(
            step=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            numerator_weighted=jnp.zeros([], jnp.float32),
            exp_avg=zeros(),
            s=zeros(),
        )

    def _tree_sum(tree):
        return jax.tree.reduce(lambda a, x: a + x, tree, jnp.zeros([], jnp.float32))

    def update(grads, state, params):
        if params is None:
            raise ValueError("dadapt_lion requires params to be passed to update()")
        d = state.d
        lr = jnp.asarray(lr_schedule(state.step), jnp.float32)
        dlr = d * lr

        u = jax.tree.map(
            lambda m, g: jnp.sign(b1 * m + (1 - b1) * g.astype(m.dtype)), state.exp_avg, grads
        )
        dot = _tree_sum(
            jax.tree.map(
                lambda u_, s_: jnp.vdot(u_.astype(jnp.float32), s_.astype(jnp.float32)),
                u,
                state.s,
            )
        )
        numerator = b2 * state.numerator_weighted + (1 - b2) * dlr * dot
        exp_avg = jax.tree.map(
            lambda m, g: b2 * m + (1 - b2) * dlr * g.astype(m.dtype), state.exp_avg, grads
        )
        s = jax.tree.map(lambda s_, u_: b2 * s_ + (1 - b2) * dlr * u_, state.s, u)
        sk_l1 = _tree_sum(jax.tree.map(lambda s_: jnp.sum(jnp.abs(s_)), s))

        d_hat = jnp.where(sk_l1 > 0, numerator / ((1 - b2) * sk_l1), d)
        d_next = jnp.where(sk_l1 > 0, jnp.maximum(d, jnp.minimum(d_hat, d * growth_rate)), d)

        updates = jax.tree.map(
            lambda u_, p: (-dlr * u_ - weight_decay * dlr * p).astype(p.dtype), u, params
        )
        new_state = DAdaptLionState(
            step=state.step + 1,
            d=d_next,
            numerator_weighted=numerator,
            exp_avg=exp_avg,
            s=s,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def parse_optimizer_args(optimizer_args: str) -> dict:
    """'weight_decay=0.01 betas=(0.9,0.999)' → kwargs dict (reference passes
    ``--optimizer_args`` through to the torch ctor, train_util.py config).

    Tuple values parse into float tuples (the naive comma→space split would
    shred 'betas=(0.9,0.999)' into junk tokens)."""
    import re

    out = {}
    if not optimizer_args:
        return out
    for k, v in re.findall(r"(\w+)\s*=\s*(\([^)]*\)|[^\s,]+)", optimizer_args):
        if v.startswith("("):
            out[k] = tuple(float(x) for x in v.strip("()").replace(",", " ").split())
        elif v.lower() in ("true", "false"):  # bool flags (e.g. safeguard_warmup)
            out[k] = v.lower() == "true"
        else:
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

    betas = kwargs.get("betas")  # 'betas=(b1,b2)' torch-ctor syntax
    if not isinstance(betas, (tuple, list)):
        betas = None  # malformed scalar/str betas: ignore, as the torch path would reject it
    b1 = float(kwargs.get("beta1", betas[0] if betas else 0.9))
    b2 = float(kwargs.get("beta2", betas[1] if betas and len(betas) > 1 else 0.999))

    if name in ("adam", "adam8bit"):
        tx = optax.adam(lr_schedule, b1=b1, b2=b2, eps=float(kwargs.get("eps", 1e-8)))
    elif name in ("adamw", "adamw8bit"):
        tx = optax.adamw(
            lr_schedule,
            b1=b1,
            b2=b2,
            weight_decay=float(kwargs.get("weight_decay", 1e-2)),
            eps=float(kwargs.get("eps", 1e-8)),
        )
    elif name in ("lion", "lion8bit"):
        tx = optax.lion(
            lr_schedule,
            b1=float(kwargs.get("beta1", betas[0] if betas else 0.9)),
            b2=float(kwargs.get("beta2", betas[1] if betas and len(betas) > 1 else 0.99)),
            weight_decay=float(kwargs.get("weight_decay", 0.0)),
        )
    elif name == "sgd":
        tx = optax.sgd(lr_schedule, momentum=float(kwargs.get("momentum", 0.0)))
    elif name == "prodigy":
        tx = prodigy(
            lr_schedule,
            betas=(b1, b2),
            beta3=float(kwargs["beta3"]) if "beta3" in kwargs else None,
            eps=float(kwargs.get("eps", 1e-8)),
            weight_decay=float(kwargs.get("weight_decay", 0.0)),
            d0=float(kwargs.get("d0", 1e-6)),
            d_coef=float(kwargs.get("d_coef", 1.0)),
            growth_rate=float(kwargs.get("growth_rate", float("inf"))),
            safeguard_warmup=bool(kwargs.get("safeguard_warmup", False)),
            use_bias_correction=bool(kwargs.get("use_bias_correction", False)),
        )
    elif name == "dadaptadam":
        tx = dadapt_adam(
            lr_schedule,
            betas=(b1, b2),
            eps=float(kwargs.get("eps", 1e-8)),
            weight_decay=float(kwargs.get("weight_decay", 0.0)),
            d0=float(kwargs.get("d0", 1e-6)),
            growth_rate=float(kwargs.get("growth_rate", float("inf"))),
            use_bias_correction=bool(kwargs.get("use_bias_correction", False)),
            decouple=bool(kwargs.get("decouple", False)),
        )
    elif name == "dadaptlion":
        tx = dadapt_lion(
            lr_schedule,
            betas=(
                float(kwargs.get("beta1", betas[0] if betas else 0.9)),
                float(kwargs.get("beta2", betas[1] if betas and len(betas) > 1 else 0.99)),
            ),
            weight_decay=float(kwargs.get("weight_decay", 0.0)),
            d0=float(kwargs.get("d0", 1e-6)),
            growth_rate=float(kwargs.get("growth_rate", float("inf"))),
        )
    elif name.startswith("dadapt"):
        raise ValueError("DAdapt optimizer must be dadaptadam or dadaptlion")
    else:
        raise ValueError("Optimizer must be adam, adamw, lion, sgd, prodigy or dadapt*")

    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if grad_clip_value is not None:
        chain.append(optax.clip(grad_clip_value))
    chain.append(tx)
    return optax.chain(*chain)
