"""Pin scheduler step math to independently-computed numpy trajectories.

Goldens come from tests/golden/generate_scheduler_golden.py — float64 plain
numpy written from the PUBLISHED formulas (DDIM eq.12, DDPM eq.6-7, σ-space
Euler-ancestral, Lagrange-integrated LMS, flow-matching shift), sharing no
step math with diffusion/schedulers.py. Each step is verified FROM THE
GOLDEN STATE (no error accumulation): a wrong table entry, σ interpolation,
or LMS coefficient fails immediately at fp32 rounding tolerance."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler
from sliders_conceptmod_tpu.diffusion.schedulers import create_noise_scheduler

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "scheduler_trajectories.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


CONFIGS = [
    ("ddim50_eps", "ddim", 50, "epsilon", False),
    ("ddim50_v", "ddim", 50, "v_prediction", False),
    ("ddpm50_eps", "ddpm", 50, "epsilon", True),
    ("lms50_eps", "lms", 50, "epsilon", False),
    ("euler_a50_eps", "euler_a", 50, "epsilon", True),
    ("euler_a12_eps", "euler_a", 12, "epsilon", True),
]


@pytest.mark.parametrize("name,kind,n,pred,stochastic", CONFIGS)
def test_scheduler_step_matches_golden(golden, name, kind, n, pred, stochastic):
    scheduler = create_noise_scheduler(kind, prediction_type=pred)
    schedule = scheduler.set_timesteps(n)

    np.testing.assert_allclose(
        np.asarray(schedule.timesteps, np.float64), golden[f"{name}_timesteps"],
        rtol=0, atol=1e-3, err_msg=f"{name}: timestep spacing drifted",
    )

    traj = golden[f"{name}_traj"]  # [n+1, ...] float32
    eps_seq = golden[f"{name}_eps_seq"]
    # golden scale for σ-space kinds: x0·σ_max == traj[0]
    np.testing.assert_allclose(
        float(schedule.init_noise_sigma) * golden["x0"], traj[0], rtol=1e-6, atol=1e-6
    )

    state = scheduler.init_step_state(traj.shape[1:])
    base_key = jax.random.PRNGKey(7)
    for i in range(n):
        x = jnp.asarray(traj[i])
        key = jax.random.fold_in(base_key, i) if stochastic else None
        out, state = scheduler.step(
            schedule, jnp.asarray(eps_seq[i]), i, x, state, key=key
        )
        np.testing.assert_allclose(
            np.asarray(out), traj[i + 1], rtol=1e-5, atol=1e-5,
            err_msg=f"{name} step {i} (t={np.asarray(schedule.timesteps)[i]})",
        )


def test_lms_coefficient_table_matches_polyint(golden):
    """scipy-quad coefficients (implementation) == exact polynomial integrals
    (golden, np.polyint) — two independent algorithms."""
    scheduler = create_noise_scheduler("lms")
    schedule = scheduler.set_timesteps(50)
    np.testing.assert_allclose(
        np.asarray(schedule.lms_coeffs, np.float64), golden["lms50_eps_coeffs"],
        rtol=2e-4, atol=1e-7,
    )


@pytest.mark.parametrize(
    "name,n,shift,mu", [("flow28_s3", 28, 3.0, None), ("flow8_dyn", 8, None, 0.9)]
)
def test_flow_match_matches_golden(golden, name, n, shift, mu):
    sched = FlowMatchScheduler(shift=shift or 3.0, use_dynamic_shifting=mu is not None)
    schedule = sched.set_timesteps(n, mu=mu)
    np.testing.assert_allclose(
        np.asarray(schedule.timesteps, np.float64), golden[f"{name}_timesteps"],
        rtol=1e-5, atol=1e-3,
    )
    traj = golden[f"{name}_traj"]
    v_seq = golden[f"{name}_v_seq"]
    for i in range(n):
        out = FlowMatchScheduler.step(schedule, jnp.asarray(v_seq[i]), i, jnp.asarray(traj[i]))
        np.testing.assert_allclose(
            np.asarray(out), traj[i + 1], rtol=1e-5, atol=1e-5, err_msg=f"{name} step {i}"
        )
