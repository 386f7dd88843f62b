"""Scheduler math: invariants + known Stable-Diffusion schedule constants.

Golden values (σ_max ≈ 14.6146, ᾱ₀ = 1-0.00085; ddim/ddpm leading grid, lms/euler_a linspace)
are the well-known SD β-schedule constants matching the diffusers schedulers
the reference constructs (model_util.py:388-436).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.diffusion.schedulers import (
    NoiseScheduler,
    create_noise_scheduler,
    make_betas,
)


def test_beta_schedule_constants():
    betas = make_betas()
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(0.00085)
    assert betas[-1] == pytest.approx(0.012)
    acp = np.cumprod(1 - betas)
    sigma_max = ((1 - acp[-1]) / acp[-1]) ** 0.5
    # canonical SD constant
    assert sigma_max == pytest.approx(14.6146, abs=1e-3)


def test_timestep_spacing_per_kind():
    """DDIM/DDPM: integer "leading" grid; LMS/Euler-A: float "linspace" over
    [0, 999] with σ interpolated — the diffusers per-scheduler defaults."""
    sch = create_noise_scheduler("ddim").set_timesteps(50)
    expected = (np.arange(50) * 20)[::-1]
    np.testing.assert_array_equal(np.asarray(sch.timesteps), expected)
    assert sch.init_noise_sigma == 1.0

    sch_e = create_noise_scheduler("euler_a").set_timesteps(50)
    ts = np.asarray(sch_e.timesteps)
    assert ts.dtype == np.float32
    np.testing.assert_allclose(ts, np.linspace(0, 999, 50)[::-1], rtol=1e-6)
    # linspace tops out at t=999 exactly: σ_max = σ(999), init σ = σ_max
    sigma_max = float(np.asarray(sch_e.sigmas).max())
    betas = make_betas()
    acp = np.cumprod(1 - betas)
    expected_sigma_999 = ((1 - acp[999]) / acp[999]) ** 0.5
    assert sigma_max == pytest.approx(expected_sigma_999, rel=1e-6)
    assert sch_e.init_noise_sigma == pytest.approx(sigma_max, rel=1e-6)
    # interior entries interpolate the σ table at the float timesteps
    sigmas_full = ((1 - acp) / acp) ** 0.5
    np.testing.assert_allclose(
        np.asarray(sch_e.sigmas)[:-1],
        np.interp(ts, np.arange(1000), sigmas_full),
        rtol=1e-5,
    )


def test_sigma_add_noise_accepts_raw_train_timesteps():
    """add_noise for σ-space kinds interpolates σ at ANY train timestep —
    the old exact-match lookup silently noised at σ_max for off-schedule t."""
    ns = NoiseScheduler("euler_a")
    sch = ns.set_timesteps(50)
    x0 = jnp.ones((1, 4, 2, 2))
    eps = jnp.ones((1, 4, 2, 2))
    betas = make_betas()
    acp = np.cumprod(1 - betas)
    sigma_500 = ((1 - acp[500]) / acp[500]) ** 0.5
    got = np.asarray(ns.add_noise(sch, x0, eps, 500))
    np.testing.assert_allclose(got, 1.0 + sigma_500, rtol=1e-5)
    # schedule entries still resolve to their own σ
    got0 = np.asarray(ns.add_noise(sch, x0, eps, sch.timesteps[0]))
    np.testing.assert_allclose(got0, 1.0 + np.asarray(sch.sigmas)[0], rtol=1e-5)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_ddim_ideal_denoiser_recovers_x0(rng, pred):
    """With a predictor that returns the exact ε (or v) for the current
    sample, the full DDIM chain must reconstruct x0 to numerical precision."""
    ns = NoiseScheduler("ddim", prediction_type=pred)
    n = 10
    sch = ns.set_timesteps(n)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)

    x = ns.add_noise(sch, x0, eps, sch.timesteps[0])
    state = ns.init_step_state(x.shape)
    for i in range(n):
        a_t = sch.alpha_prod[i]
        if pred == "epsilon":
            model_out = eps
        else:
            # v for the *current* (x, x0) pair: v = sqrt(a) eps - sqrt(1-a) x0
            model_out = jnp.sqrt(a_t) * eps - jnp.sqrt(1 - a_t) * x0
        x, state = ns.step(sch, model_out, i, x, state)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddpm_step_mean_and_noise_gate(rng):
    ns = NoiseScheduler("ddpm")
    sch = ns.set_timesteps(10)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    x = ns.add_noise(sch, x0, eps, sch.timesteps[0])
    key = jax.random.PRNGKey(0)

    # two different keys must give different outputs at a noisy step
    a, _ = ns.step(sch, eps, 0, x, key=jax.random.PRNGKey(1))
    b, _ = ns.step(sch, eps, 0, x, key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))

    # the final step (t=0) must be deterministic (no variance noise)
    xl = ns.add_noise(sch, x0, eps, sch.timesteps[-1])
    c, _ = ns.step(sch, eps, 9, xl, key=jax.random.PRNGKey(1))
    d, _ = ns.step(sch, eps, 9, xl, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))


def test_euler_a_sigma_split_and_ideal_step(rng):
    ns = NoiseScheduler("euler_a")
    n = 12
    sch = ns.set_timesteps(n)
    s = np.asarray(sch.sigmas)
    up = np.asarray(sch.sigma_up)
    down = np.asarray(sch.sigma_down)
    # ancestral split: σ_down² + σ_up² == σ_to²
    np.testing.assert_allclose(down**2 + up**2, s[1:] ** 2, rtol=1e-5, atol=1e-6)

    # ideal ε-predictor: x = x0 + σ·ε  →  step lands at x0 + σ_down·ε + σ_up·z
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    i = 3
    x = x0 + sch.sigmas[i] * eps
    key = jax.random.PRNGKey(0)
    out, _ = ns.step(sch, eps, i, x, key=key)
    z = jax.random.normal(key, x.shape, dtype=jnp.float32)
    expected = x0 + sch.sigma_down[i] * eps + sch.sigma_up[i] * z
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)

    # scale_model_input divides by sqrt(σ²+1)
    scaled = ns.scale_model_input(sch, x, i)
    np.testing.assert_allclose(
        np.asarray(scaled), np.asarray(x) / float(np.sqrt(s[i] ** 2 + 1)), atol=1e-6
    )


def test_lms_first_step_is_euler(rng):
    """Order-1 LMS coefficient is ∫1 dτ = σ₁-σ₀, so step 0 is an Euler step."""
    ns = NoiseScheduler("lms")
    sch = ns.set_timesteps(8)
    c0 = np.asarray(sch.lms_coeffs)[0]
    s = np.asarray(sch.sigmas)
    assert c0[0] == pytest.approx(s[1] - s[0], rel=1e-4)
    assert np.all(c0[1:] == 0)

    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    x = x0 + sch.sigmas[0] * eps
    state = ns.init_step_state(x.shape)
    out, state = ns.step(sch, eps, 0, x, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0 + sch.sigmas[1] * eps), atol=1e-4)


def test_step_runs_under_scan():
    """The whole sampler must compile to one lax.scan (traced step index)."""
    ns = NoiseScheduler("euler_a")
    n = 6
    sch = ns.set_timesteps(n)
    x = jnp.ones((1, 4, 8, 8), dtype=jnp.float32) * sch.init_noise_sigma

    @jax.jit
    def sample(x, key):
        state = ns.init_step_state(x.shape)

        def body(carry, i):
            x, state, key = carry
            key, sub = jax.random.split(key)
            eps = x * 0.01  # dummy model
            x, state = ns.step(sch, eps, i, x, state, key=sub)
            return (x, state, key), None

        (x, _, _), _ = jax.lax.scan(body, (x, state, key), jnp.arange(n))
        return x

    out = sample(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_add_noise_alpha_space(rng):
    ns = NoiseScheduler("ddim")
    sch = ns.set_timesteps(50)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 8, 8)), dtype=jnp.float32)
    t = 980
    out = ns.add_noise(sch, x0, eps, t)
    acp = float(np.asarray(sch.alphas_cumprod)[t])
    expected = np.sqrt(acp) * np.asarray(x0) + np.sqrt(1 - acp) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)
