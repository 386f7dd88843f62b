"""Pure-functional noise schedulers: DDIM / DDPM / LMS / Euler-Ancestral.

Numerical-parity target: the diffusers schedulers instantiated by the
reference factory (``conceptmod/textsliders/model_util.py:388-436``) —
β 0.00085→0.012 "scaled_linear", 1000 train timesteps, clip_sample=False,
ε- or v-prediction, default "leading" timestep spacing, steps_offset 0.

TPU-first design: a scheduler here is (config, train-time tables) and
``set_timesteps`` produces an immutable :class:`Schedule` of *precomputed
per-step coefficient tables* (numpy, becoming XLA constants under jit).
``step`` is a pure function indexed by a (possibly traced) step index, so a
full sampler compiles to a single ``lax.scan`` with no host round-trips and
no data-dependent shapes. Mutable diffusers-style scheduler state (LMS
derivative history, Euler-A randomness) is carried explicitly: history in a
fixed-shape pytree, randomness via an explicit PRNG key.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PredictionType = Literal["epsilon", "v_prediction"]
SCHEDULER_KINDS = ("ddim", "ddpm", "lms", "euler_a")

LMS_ORDER = 4  # diffusers LMSDiscreteScheduler default


def is_batched_key(key) -> bool:
    """True when ``key`` is a stacked [B]-batch of PRNG keys (one per sample
    row) rather than a single key. Supports both raw uint32 ``(2,)`` keys
    (stacked → ``(B, 2)``) and typed ``jax.random.key`` arrays (stacked →
    ndim ≥ 1)."""
    key = jnp.asarray(key)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2


def _draw_step_noise(key, shape):
    """Per-step stochastic-scheduler noise. A single key draws the whole
    ``shape`` at once (legacy behavior, byte-stable). A stacked [B]-batch of
    keys draws each row from ITS OWN key — a row's noise then depends only on
    its key, not on its position in the batch or on the other rows, which is
    what makes micro-batched serving reproduce the solo-request trajectory
    for a given request seed (serve.py)."""
    if is_batched_key(key):
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype=jnp.float32))(
            jnp.asarray(key)
        )
    return jax.random.normal(key, shape, dtype=jnp.float32)


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    schedule: str = "scaled_linear",
) -> np.ndarray:
    if schedule == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    raise ValueError(f"Unknown beta schedule: {schedule}")


def _leading_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Default "leading" spacing (diffusers), steps_offset=0, descending."""
    step_ratio = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int64)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Schedule:
    """Immutable per-``set_timesteps`` tables. All arrays are length
    ``num_inference_steps`` (+1 where noted) and indexed by *step index*
    (0 = highest noise), not by train timestep."""

    kind: str = field(metadata=dict(static=True))
    prediction_type: str = field(metadata=dict(static=True))
    num_inference_steps: int = field(metadata=dict(static=True))
    timesteps: jnp.ndarray  # descending train timesteps: int32[n] ("leading",
    # ddim/ddpm) or float32[n] (linspace, lms/euler_a — diffusers spacing)
    init_noise_sigma: float = field(metadata=dict(static=True))

    # common diffusion tables (always present; identity values where unused)
    alphas_cumprod: jnp.ndarray  # fp32[T] full train table (for add_noise)
    train_sigmas: jnp.ndarray  # fp32[T] full σ table (scale_model_input at raw train t)
    # DDIM/DDPM per-step:
    alpha_prod: jnp.ndarray  # fp32[n]   alphas_cumprod[t_i]
    alpha_prod_prev: jnp.ndarray  # fp32[n]   alphas_cumprod[t_{i+1}] (or final)
    # sigma-space (LMS / Euler-A) per-step:
    sigmas: jnp.ndarray  # fp32[n+1] (last entry 0)
    sigma_up: jnp.ndarray  # fp32[n] Euler-A ancestral noise scale
    sigma_down: jnp.ndarray  # fp32[n]
    lms_coeffs: jnp.ndarray  # fp32[n, LMS_ORDER] (zeros where order < LMS_ORDER)


@jax.tree_util.register_dataclass
@dataclass
class StepState:
    """Explicit mutable sampler state (replaces diffusers' in-object state).

    ``derivatives``: [LMS_ORDER, *latent_shape], newest at index 0; only LMS
    reads it. ``step_index`` is NOT stored — callers pass the index, which is
    what makes the reference's scheduler-deep-copy dance
    (train_lora_sd3.py:241-314, train_lora_flux.py:279-347) unnecessary here.
    """

    derivatives: jnp.ndarray


class NoiseScheduler:
    """Factory + pure step functions for one scheduler kind."""

    def __init__(
        self,
        kind: str,
        prediction_type: PredictionType = "epsilon",
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
    ):
        kind = kind.lower().replace(" ", "_")
        if kind not in SCHEDULER_KINDS:
            raise ValueError(f"Unknown scheduler name: {kind}")
        self.kind = kind
        self.prediction_type = prediction_type
        self.num_train_timesteps = num_train_timesteps
        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        alphas = 1.0 - betas
        self._alphas_cumprod = np.cumprod(alphas, axis=0)  # float64 host table
        # sigma-space table for LMS/Euler-A and their add_noise
        self._train_sigmas = ((1 - self._alphas_cumprod) / self._alphas_cumprod) ** 0.5

    # -- schedule construction ------------------------------------------------

    def set_timesteps(self, num_inference_steps: int) -> Schedule:
        n = num_inference_steps
        acp = self._alphas_cumprod
        if self.kind in ("lms", "euler_a"):
            # diffusers σ-space schedulers default timestep_spacing="linspace":
            # FLOAT timesteps over [0, T-1], σ interpolated at them (vs the
            # integer "leading" grid of DDIM/DDPM)
            timesteps = np.linspace(0, self.num_train_timesteps - 1, n, dtype=np.float64)[
                ::-1
            ].copy()
            int_t = timesteps.astype(np.int64)  # for the (unused-here) ᾱ tables
        else:
            timesteps = _leading_timesteps(self.num_train_timesteps, n)
            int_t = timesteps

        alpha_prod = acp[int_t]
        # previous (less-noisy) timestep per step; beyond the end -> final
        prev_t = int_t - self.num_train_timesteps // n
        final_alpha = 1.0  # DDIM set_alpha_to_one=True default; DDPM `one`
        alpha_prod_prev = np.where(prev_t >= 0, acp[np.clip(prev_t, 0, None)], final_alpha)

        sigmas_full = self._train_sigmas
        sigmas = np.interp(timesteps[::-1], np.arange(self.num_train_timesteps), sigmas_full)[::-1]
        sigmas = np.concatenate([sigmas, [0.0]])

        # Euler-A ancestral split: σ_up² = σ_to²(σ_from²-σ_to²)/σ_from²
        s_from, s_to = sigmas[:-1], sigmas[1:]
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_up = np.where(
                s_from > 0, (s_to**2 * (s_from**2 - s_to**2) / np.maximum(s_from**2, 1e-20)) ** 0.5, 0.0
            )
        sigma_down = (np.maximum(s_to**2 - sigma_up**2, 0.0)) ** 0.5

        lms_coeffs = np.zeros((n, LMS_ORDER))
        if self.kind == "lms":
            lms_coeffs = _lms_coefficient_table(sigmas[:-1], n)

        if self.kind in ("lms", "euler_a"):
            # "linspace"/"trailing" spacing -> σ_max (diffusers; "leading"
            # would be sqrt(σ_max²+1))
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = 1.0

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return Schedule(
            kind=self.kind,
            prediction_type=self.prediction_type,
            num_inference_steps=n,
            timesteps=jnp.asarray(
                timesteps, dtype=jnp.float32 if self.kind in ("lms", "euler_a") else jnp.int32
            ),
            init_noise_sigma=init_noise_sigma,
            alphas_cumprod=f32(acp),
            train_sigmas=f32(self._train_sigmas),
            alpha_prod=f32(alpha_prod),
            alpha_prod_prev=f32(alpha_prod_prev),
            sigmas=f32(sigmas),
            sigma_up=f32(sigma_up),
            sigma_down=f32(sigma_down),
            lms_coeffs=f32(lms_coeffs),
        )

    # -- pure step functions --------------------------------------------------

    def init_step_state(self, latents_shape: Tuple[int, ...], dtype=jnp.float32) -> StepState:
        return StepState(derivatives=jnp.zeros((LMS_ORDER,) + tuple(latents_shape), dtype=dtype))

    @staticmethod
    def scale_model_input(schedule: Schedule, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        """σ-space schedulers divide by sqrt(σ²+1); α-space ones are identity."""
        if schedule.kind in ("lms", "euler_a"):
            sigma = schedule.sigmas[step_index]
            return sample / jnp.sqrt(sigma**2 + 1).astype(sample.dtype)
        return sample

    @staticmethod
    def scale_model_input_train_t(schedule: Schedule, sample: jnp.ndarray, train_t) -> jnp.ndarray:
        """As above but indexed by raw train timestep — used by the teacher
        branches, where the reference re-sets the scheduler to 1000 steps and
        predicts at a raw timestep (reference train_lora_xl.py:233-238 with
        train_util.py:463 scale_model_input)."""
        if schedule.kind in ("lms", "euler_a"):
            sigma = jnp.asarray(schedule.train_sigmas)[train_t]
            if jnp.ndim(sigma) > 0:  # per-row timesteps (fused-sample batches)
                sigma = sigma.reshape((-1,) + (1,) * (sample.ndim - 1))
            return sample / jnp.sqrt(sigma**2 + 1).astype(sample.dtype)
        return sample

    def _predict_x0_alpha(self, schedule, model_output, sample, step_index):
        a_t = schedule.alpha_prod[step_index]
        sqrt_a, sqrt_1ma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        if schedule.prediction_type == "epsilon":
            x0 = (sample - sqrt_1ma * model_output) / sqrt_a
            eps = model_output
        elif schedule.prediction_type == "v_prediction":
            x0 = sqrt_a * sample - sqrt_1ma * model_output
            eps = sqrt_a * model_output + sqrt_1ma * sample
        else:
            raise ValueError(schedule.prediction_type)
        return x0, eps

    def _predict_x0_sigma(self, schedule, model_output, sample, step_index):
        sigma = schedule.sigmas[step_index]
        if schedule.prediction_type == "epsilon":
            return sample - sigma * model_output
        elif schedule.prediction_type == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (sigma**2 + 1)
        raise ValueError(schedule.prediction_type)

    def step(
        self,
        schedule: Schedule,
        model_output: jnp.ndarray,
        step_index,
        sample: jnp.ndarray,
        state: Optional[StepState] = None,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, StepState]:
        """One reverse-diffusion step. ``step_index`` may be traced.

        Stochastic kinds (ddpm, euler_a) require ``key``; deterministic kinds
        ignore it. Computation runs in fp32 and is cast back to sample dtype.
        """
        in_dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        if state is None:
            state = self.init_step_state(sample.shape)

        if self.kind == "ddim":
            x0, eps = self._predict_x0_alpha(schedule, model_output, sample, step_index)
            a_prev = schedule.alpha_prod_prev[step_index]
            prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        elif self.kind == "ddpm":
            a_t = schedule.alpha_prod[step_index]
            a_prev = schedule.alpha_prod_prev[step_index]
            beta_prod_t = 1.0 - a_t
            beta_prod_prev = 1.0 - a_prev
            current_alpha = a_t / a_prev
            current_beta = 1.0 - current_alpha
            x0, _ = self._predict_x0_alpha(schedule, model_output, sample, step_index)
            coef_x0 = jnp.sqrt(a_prev) * current_beta / beta_prod_t
            coef_xt = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
            prev = coef_x0 * x0 + coef_xt * sample
            variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20, None)
            # diffusers adds variance noise only while t > 0
            no_noise = schedule.timesteps[step_index] == 0
            if key is None:
                raise ValueError("ddpm step requires a PRNG key")
            noise = _draw_step_noise(key, sample.shape)
            prev = prev + jnp.where(no_noise, 0.0, jnp.sqrt(variance)) * noise
        elif self.kind == "euler_a":
            sigma = schedule.sigmas[step_index]
            x0 = self._predict_x0_sigma(schedule, model_output, sample, step_index)
            derivative = (sample - x0) / sigma
            dt = schedule.sigma_down[step_index] - sigma
            prev = sample + derivative * dt
            if key is None:
                raise ValueError("euler_a step requires a PRNG key")
            noise = _draw_step_noise(key, sample.shape)
            prev = prev + noise * schedule.sigma_up[step_index]
        elif self.kind == "lms":
            sigma = schedule.sigmas[step_index]
            x0 = self._predict_x0_sigma(schedule, model_output, sample, step_index)
            derivative = (sample - x0) / sigma
            # roll history: newest first
            derivs = jnp.concatenate(
                [derivative[None].astype(state.derivatives.dtype), state.derivatives[:-1]], axis=0
            )
            state = StepState(derivatives=derivs)
            coeffs = schedule.lms_coeffs[step_index]  # [LMS_ORDER]
            prev = sample + jnp.tensordot(coeffs, derivs.astype(jnp.float32), axes=(0, 0))
        else:
            raise ValueError(self.kind)

        return prev.astype(in_dtype), state

    # -- forward process ------------------------------------------------------

    def add_noise(
        self, schedule: Schedule, original: jnp.ndarray, noise: jnp.ndarray, timestep
    ) -> jnp.ndarray:
        """q(x_t | x_0). σ-space kinds add σ·noise (matching diffusers LMS /
        Euler-A ``add_noise``); α-space kinds use √ᾱ x₀ + √(1-ᾱ) ε."""
        t = jnp.asarray(timestep)
        if self.kind in ("lms", "euler_a"):
            # σ at ANY train timestep via interpolation over the full table —
            # schedule entries resolve exactly (they were interpolated from
            # the same table) and raw integer t no longer silently matches
            # index 0 / σ_max as the old exact-match lookup did
            sigma = jnp.interp(
                t.astype(jnp.float32),
                jnp.arange(schedule.train_sigmas.shape[0], dtype=jnp.float32),
                schedule.train_sigmas,
            )
            return (original.astype(jnp.float32) + sigma * noise.astype(jnp.float32)).astype(original.dtype)
        acp = schedule.alphas_cumprod[t]
        return (
            jnp.sqrt(acp) * original.astype(jnp.float32) + jnp.sqrt(1.0 - acp) * noise.astype(jnp.float32)
        ).astype(original.dtype)

    def get_velocity(self, schedule: Schedule, original: jnp.ndarray, noise: jnp.ndarray, timestep):
        acp = schedule.alphas_cumprod[jnp.asarray(timestep)]
        return (jnp.sqrt(acp) * noise.astype(jnp.float32) - jnp.sqrt(1.0 - acp) * original.astype(jnp.float32)).astype(
            original.dtype
        )


def _lms_coefficient_table(sigmas: np.ndarray, n: int) -> np.ndarray:
    """Integrated Lagrange-basis coefficients for 4th-order LMS.

    Matches diffusers' ``get_lms_coefficient`` (scipy quad over the Lagrange
    polynomial of the derivative history); computed host-side once per
    schedule so the sampler itself is table lookups.
    """
    from scipy import integrate

    table = np.zeros((n, LMS_ORDER))
    for t in range(n):
        order = min(t + 1, LMS_ORDER)
        for curr_order in range(order):
            def lms_derivative(tau, t=t, curr_order=curr_order, order=order):
                prod = 1.0
                for k in range(order):
                    if curr_order == k:
                        continue
                    prod *= (tau - sigmas[t - k]) / (sigmas[t - curr_order] - sigmas[t - k])
                return prod

            hi = sigmas[t + 1] if t + 1 < len(sigmas) else 0.0
            table[t, curr_order] = integrate.quad(lms_derivative, sigmas[t], hi, epsrel=1e-4)[0]
    return table


def create_noise_scheduler(
    scheduler_name: str = "ddpm",
    prediction_type: PredictionType = "epsilon",
) -> NoiseScheduler:
    """Mirror of reference model_util.py:388-436 (same kinds, same β schedule)."""
    return NoiseScheduler(scheduler_name, prediction_type=prediction_type)
