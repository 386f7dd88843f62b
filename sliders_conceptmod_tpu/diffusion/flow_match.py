"""Flow-matching Euler scheduler — pure functional (SD3 / Flux).

Numerical-parity target: diffusers ``FlowMatchEulerDiscreteScheduler`` as
used by the reference SD3/Flux trainers. The reference fights this
scheduler's mutable ``_step_index`` with ``copy.deepcopy`` per branch
(``train_lora_sd3.py:241-314``) and save/restore juggling
(``train_lora_flux.py:279-347``); here the step index is an explicit
argument, which dissolves that entire problem (SURVEY §7.4).

Math (num_train_timesteps T=1000):
* base sigmas σ_i from timesteps t ∈ linspace(T, 1) / T,
* static shift (SD3, shift=3): σ' = s·σ / (1 + (s−1)·σ),
* dynamic time-shift (Flux): σ' = e^μ / (e^μ + (1/σ − 1)), with μ from
  ``calculate_shift`` over the image sequence length
  (reference train_util.py:640-657 via diffusers pipeline helpers),
* step: x_{i+1} = x_i + (σ_{i+1} − σ_i) · v   (model predicts velocity),
* add_noise / scale_noise: x_t = (1 − σ)·x₀ + σ·ε;  init_noise_sigma = 1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,  # diffusers flux default (reference uses pipeline values)
) -> float:
    """μ for dynamic time-shifting (Flux) — linear in sequence length."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FlowSchedule:
    num_inference_steps: int = field(metadata=dict(static=True))
    timesteps: jnp.ndarray  # fp32[n] descending (σ·1000)
    sigmas: jnp.ndarray  # fp32[n+1], last entry 0
    init_noise_sigma: float = field(metadata=dict(static=True))


class FlowMatchScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        shift: float = 3.0,
        use_dynamic_shifting: bool = False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.use_dynamic_shifting = use_dynamic_shifting

    def set_timesteps(
        self, num_inference_steps: int, mu: Optional[float] = None
    ) -> FlowSchedule:
        n = num_inference_steps
        T = self.num_train_timesteps
        timesteps = np.linspace(T, 1, n, dtype=np.float64)
        sigmas = timesteps / T
        if self.use_dynamic_shifting:
            if mu is None:
                raise ValueError("dynamic shifting requires mu (calculate_shift)")
            sigmas = math.exp(mu) / (math.exp(mu) + (1 / sigmas - 1))
        else:
            sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        timesteps = sigmas * T
        sigmas = np.concatenate([sigmas, [0.0]])
        return FlowSchedule(
            num_inference_steps=n,
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            init_noise_sigma=1.0,
        )

    @staticmethod
    def step(schedule: FlowSchedule, model_output: jnp.ndarray, step_index, sample: jnp.ndarray) -> jnp.ndarray:
        """x ← x + (σ_next − σ)·v — stateless; step_index may be traced."""
        sigma = schedule.sigmas[step_index]
        sigma_next = schedule.sigmas[step_index + 1]
        out = sample.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(jnp.float32)
        return out.astype(sample.dtype)

    @staticmethod
    def add_noise(schedule: FlowSchedule, original: jnp.ndarray, noise: jnp.ndarray, step_index) -> jnp.ndarray:
        """scale_noise: x = (1 − σ)·x₀ + σ·ε at the given schedule index."""
        sigma = schedule.sigmas[step_index]
        return ((1.0 - sigma) * original.astype(jnp.float32) + sigma * noise.astype(jnp.float32)).astype(
            original.dtype
        )
