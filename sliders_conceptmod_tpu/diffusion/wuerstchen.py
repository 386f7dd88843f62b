"""Würstchen / Stable Cascade diffusion math — cosine ratio-space DDPM.

Two pieces, both pure functions over immutable schedules (house scheduler
style, see diffusion/schedulers.py):

* :class:`WuerstchenScheduler` — the ``DDPMWuerstchenScheduler`` the
  reference *intends* to use but never imports (its import is commented out,
  reference ``conceptmod/textsliders/train_util.py:9``; every
  ``isinstance(scheduler, DDPMWuerstchenScheduler)`` check therefore raises
  NameError — SURVEY §2.4). Timesteps are RATIOS in [0, 1]; the noising
  schedule is ᾱ(t) = cos²((t+s)/(1+s)·π/2)/cos²(s/(1+s)·π/2) with s=0.008,
  clipped to [1e-4, 0.9999].
* :func:`get_t_conditioning` — the reference's fallback mapping from a
  beta-scheduler ᾱ[t] to a Stage-C cosine ratio
  (``train_util.py:710-718``; note it uses s=0.003 here, NOT the
  scheduler's 0.008 — replicated).

The build supports both trainer paths: ``noise_scheduler: wuerstchen``
(proper ratio-space stepping) and the reference's shipped config default
(a beta scheduler stepped at integer timesteps with the ratio used only as
model conditioning, ``train_util.py:927-972``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def _alpha_cumprod(t, s: float = 0.008):
    """ᾱ at ratio t ∈ [0,1] (t=0 clean, t=1 pure noise)."""
    t = jnp.asarray(t, jnp.float32)
    init = np.cos(s / (1 + s) * np.pi / 2) ** 2
    a = jnp.cos((t + s) / (1 + s) * (np.pi / 2)) ** 2 / init
    return jnp.clip(a, 1e-4, 0.9999)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WuerstchenSchedule:
    """``timesteps``: fp32[n+1] ratios, linspace 1→0 (index i steps i→i+1)."""

    num_inference_steps: int = field(metadata=dict(static=True))
    timesteps: jnp.ndarray
    init_noise_sigma: float = field(metadata=dict(static=True))


class WuerstchenScheduler:
    """Functional DDPMWuerstchenScheduler (scaler=1, s=0.008)."""

    kind = "wuerstchen"
    prediction_type = "epsilon"

    def __init__(self, s: float = 0.008):
        self.s = s

    def set_timesteps(self, num_inference_steps: int) -> WuerstchenSchedule:
        return WuerstchenSchedule(
            num_inference_steps=num_inference_steps,
            timesteps=jnp.linspace(1.0, 0.0, num_inference_steps + 1, dtype=jnp.float32),
            init_noise_sigma=1.0,
        )

    @staticmethod
    def scale_model_input(schedule, sample, step_index):
        return sample  # identity (ratio-space DDPM)

    def alpha_cumprod(self, t):
        return _alpha_cumprod(t, self.s)

    def step(
        self,
        schedule: WuerstchenSchedule,
        model_output: jnp.ndarray,
        step_index,
        sample: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        """x_{t} → x_{t_prev}; ancestral noise is skipped on the final step
        (prev ratio 0), matching diffusers' ``(prev_t != 0)`` mask."""
        in_dtype = sample.dtype
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        t = schedule.timesteps[step_index]
        t_prev = schedule.timesteps[step_index + 1]
        a = self.alpha_cumprod(t)
        a_prev = self.alpha_cumprod(t_prev)
        alpha = a / a_prev
        mu = jax.lax.rsqrt(alpha) * (x - (1 - alpha) * eps * jax.lax.rsqrt(1 - a))
        noise = jax.random.normal(key, x.shape, jnp.float32)
        std = jnp.sqrt((1 - alpha) * (1 - a_prev) / (1 - a)) * noise
        return (mu + jnp.where(t_prev != 0, std, 0.0)).astype(in_dtype)

    def add_noise(self, schedule, original, noise, ratio):
        a = self.alpha_cumprod(ratio)
        shape = (-1,) + (1,) * (original.ndim - 1)
        a = jnp.reshape(a, shape) if jnp.ndim(ratio) > 0 else a
        return jnp.sqrt(a) * original + jnp.sqrt(1 - a) * noise


def get_t_conditioning(t, alphas_cumprod) -> jnp.ndarray:
    """Beta-scheduler timestep → Stage-C cosine ratio (reference
    ``train_util.py:710-718``: s=0.003, var clamped to [0,1], ratio =
    acos(√(ᾱ·min_var))/(π/2)·(1+s) − s)."""
    s = 0.003
    min_var = np.cos(s / (1 + s) * np.pi / 2) ** 2
    # float (linspace) timesteps truncate like the reference's t.long()
    t = jnp.asarray(t).astype(jnp.int32)
    var = jnp.clip(jnp.asarray(alphas_cumprod)[t], 0.0, 1.0)
    return (jnp.arccos(jnp.sqrt(var * min_var)) / (np.pi / 2)) * (1 + s) - s
