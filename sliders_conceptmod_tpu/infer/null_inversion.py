"""Null-text inversion — real-image slider editing.

Parity target: the reference's ``NullInversion`` class and edit loop
(``demo_image_editing.ipynb`` cells 6 and 13; SURVEY §3.5):

1. ``ddim_inversion``: VAE-encode the real image (posterior *mean* ·
   scaling factor), then run the DDIM loop *backwards* (``next_step``) for
   all schedule steps at CFG 1 (conditional prediction only), recording the
   trajectory,
2. ``null_optimization``: walking forward from x_T, optimize the
   *unconditional embedding* at each timestep (Adam, lr 1e-2 decaying by
   step, ≤10 inner iterations, early stop at ``epsilon + i·2e-5``) so the
   CFG-7.5 ``prev_step`` reconstruction matches the recorded trajectory,
3. edit: denoise from the inverted x_T with the per-step optimized uncond
   embeddings; the slider network stays at scale 0 until
   ``t <= start_noise`` (≈500 in the notebook) and then flips on.

TPU-first: inversion is a ``lax.scan`` over steps; the per-step null
optimization is a fixed-length inner ``fori_loop`` with an early-stop mask
(one compiled graph); the edit loop reuses the two-phase sampler pattern
from infer/generate.py with per-step uncond embeddings.

Callers MUST wrap each phase in ``jax.jit`` with params as ARGUMENTS (see
demos/demo_image_editing.py): a bare ``lax.scan`` re-traces per call, and
closure-captured params would bake GBs of constants into the executable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from sliders_conceptmod_tpu.diffusion.schedulers import Schedule

NUM_DDIM_STEPS = 50
GUIDANCE_SCALE = 7.5


def _alpha(schedule: Schedule, t):
    return schedule.alphas_cumprod[t]


def ddim_next_step(schedule: Schedule, eps, t, t_next, sample):
    """Inversion step x_t -> x_{t+1} (notebook ``next_step``). Negative t
    means the clean image: ᾱ = final_alpha = 1 (set_alpha_to_one)."""
    a_t = jnp.where(t >= 0, _alpha(schedule, jnp.maximum(t, 0)), 1.0)
    a_next = _alpha(schedule, t_next)
    x0 = (sample - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps


def ddim_prev_step(schedule: Schedule, eps, t, t_prev, sample):
    """Denoising step x_t -> x_{t-1} (notebook ``prev_step``)."""
    a_t = _alpha(schedule, t)
    a_prev = jnp.where(t_prev >= 0, _alpha(schedule, jnp.maximum(t_prev, 0)), 1.0)
    x0 = (sample - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


def ddim_invert(
    unet_apply: Callable,
    params,
    schedule: Schedule,
    latent0: jnp.ndarray,  # [1, 4, h, w] from VAE mean · scaling factor
    cond_emb: jnp.ndarray,  # [1, S, D]
) -> jnp.ndarray:
    """Forward inversion trajectory [T+1, 1, 4, h, w] (x_0 … x_T), CFG=1."""
    ts = schedule.timesteps[::-1]  # ascending
    step_ratio = 1000 // schedule.num_inference_steps
    # latent math stays fp32 even under a bf16 model: ddim steps mix fp32
    # ᾱ tables in, and the scan carry dtype must be stable
    latent0 = latent0.astype(jnp.float32)

    def body(carry, t):
        lat = carry
        eps = unet_apply(params, lat, t, cond_emb)
        nxt = ddim_next_step(schedule, eps, t - step_ratio, t, lat)
        return nxt, nxt

    _, traj = jax.lax.scan(body, latent0, ts)
    return jnp.concatenate([latent0[None], traj], axis=0)


@dataclass(frozen=True)
class NullOptConfig:
    num_inner_steps: int = 10
    epsilon: float = 1e-5
    lr: float = 1e-2


def null_optimization(
    unet_apply: Callable,
    params,
    schedule: Schedule,
    trajectory: jnp.ndarray,  # [T+1, 1, 4, h, w] from ddim_invert
    cond_emb: jnp.ndarray,
    uncond_emb0: jnp.ndarray,  # [1, S, D] embedding of ""
    cfg: NullOptConfig = NullOptConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-timestep optimized uncond embeddings [T, 1, S, D] + final latents.

    Mirrors the notebook: at step i (descending t), minimize
    ‖prev_step(CFG_7.5(eps)) − x_{T-1-i}‖² over the uncond embedding; lr
    decays 1e-2·(1 − i/100); early stop at loss < ε + i·2e-5.
    """
    T = schedule.num_inference_steps
    ts = schedule.timesteps  # descending
    step_ratio = 1000 // T
    # the optimized variable is fp32 regardless of model precision — Adam on
    # a bf16 leaf rounds away the small late-step updates (lr decays to ~0)
    uncond_emb0 = uncond_emb0.astype(jnp.float32)
    trajectory = trajectory.astype(jnp.float32)

    def outer(carry, i):
        lat, uncond = carry
        t = ts[i]
        target = trajectory[T - 1 - i]
        eps_cond = unet_apply(params, lat, t, cond_emb)
        lr = cfg.lr * (1.0 - i.astype(jnp.float32) / 100.0)
        opt = optax.adam(lr)

        def inner(j, state):
            uncond, opt_state, done = state

            def loss_fn(u):
                eps_u = unet_apply(params, lat, t, u)
                eps = eps_u + GUIDANCE_SCALE * (eps_cond - eps_u)
                prev = ddim_prev_step(schedule, eps, t, t - step_ratio, lat)
                return jnp.mean((prev - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(uncond)
            updates, new_opt_state = opt.update(grads, opt_state, uncond)
            new_uncond = optax.apply_updates(uncond, updates)
            threshold = cfg.epsilon + i.astype(jnp.float32) * 2e-5
            # reference ordering (ptp NullInversion.null_optimization):
            # optimizer.step() runs, THEN the loss check breaks — so the
            # stop-triggering iteration's update is applied; only iterations
            # after a previous stop are frozen
            stop = loss < threshold
            uncond = jnp.where(done, uncond, new_uncond)
            opt_state = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), opt_state, new_opt_state
            )
            return (uncond, opt_state, jnp.logical_or(done, stop))

        opt_state = opt.init(uncond)
        uncond, _, _ = jax.lax.fori_loop(0, cfg.num_inner_steps, inner, (uncond, opt_state, jnp.asarray(False)))

        # take the step with the optimized uncond
        eps_u = unet_apply(params, lat, t, uncond)
        eps = eps_u + GUIDANCE_SCALE * (eps_cond - eps_u)
        lat = ddim_prev_step(schedule, eps, t, t - step_ratio, lat)
        return (lat, uncond), uncond

    (final_lat, _), uncond_per_step = jax.lax.scan(
        outer, (trajectory[-1], uncond_emb0), jnp.arange(T)
    )
    return uncond_per_step, final_lat


def edit_with_slider(
    unet_apply: Callable,
    params_structure,
    params_slider,
    flip_step: int,
    schedule: Schedule,
    x_t: jnp.ndarray,
    cond_emb: jnp.ndarray,
    uncond_per_step: jnp.ndarray,  # [T, 1, S, D]
) -> jnp.ndarray:
    """Notebook cell 13: denoise from the inverted x_T with per-step uncond
    embeddings; slider off until ``flip_step`` then on."""
    T = schedule.num_inference_steps
    ts = schedule.timesteps
    step_ratio = 1000 // T
    x_t = x_t.astype(jnp.float32)  # stable loop-carry dtype under bf16 models

    def make_body(params):
        def body(i, lat):
            t = ts[i]
            uncond = uncond_per_step[i]
            eps_u = unet_apply(params, lat, t, uncond)
            eps_c = unet_apply(params, lat, t, cond_emb)
            eps = eps_u + GUIDANCE_SCALE * (eps_c - eps_u)
            return ddim_prev_step(schedule, eps, t, t - step_ratio, lat)

        return body

    lat = x_t
    if flip_step > 0:
        lat = jax.lax.fori_loop(0, flip_step, make_body(params_structure), lat)
    if flip_step < T:
        lat = jax.lax.fori_loop(flip_step, T, make_body(params_slider), lat)
    return lat
